"""Convert torch checkpoints into posfeat_tpu msgpack checkpoints.

Usage:
  # reference PoSFeat run dir (backbone.pth + localheader.pth):
  python tools/import_torch_weights.py posfeat <ckpt_dir> <out_dir>

  # torchvision ImageNet resnet (e.g. resnet50-0676ba61.pth) -> encoder
  # seed checkpoint used by `pretrained: True` recipes:
  python tools/import_torch_weights.py resnet <resnet.pth> <out_dir>
"""

import sys

sys.path.insert(0, ".")


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    mode, src, out = sys.argv[1:4]
    if mode == "posfeat":
        from posfeat_tpu.core.torch_import import import_posfeat_checkpoint

        import_posfeat_checkpoint(src, out)
    elif mode == "resnet":
        import os

        import torch

        from posfeat_tpu.core.checkpoint import save_module_variables
        from posfeat_tpu.core.torch_import import import_torchvision_resnet

        sd = torch.load(src, map_location="cpu")
        os.makedirs(out, exist_ok=True)
        save_module_variables(
            import_torchvision_resnet(sd), os.path.join(out, "encoder")
        )
        print(f"converted -> {out}/encoder.msgpack")
    else:
        print(__doc__)
        sys.exit(1)


if __name__ == "__main__":
    main()
