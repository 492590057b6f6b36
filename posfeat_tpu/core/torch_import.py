"""Convert torch checkpoints (reference backbone.pth / localheader.pth, or
torchvision ResNet ImageNet weights) into this framework's flax variable
trees.

Name mapping (reference networks/DescNet.py, DeteNet.py -> models/resunet.py,
keypoint_det.py):

  torch                          flax path
  ---------------------------    ----------------------------------------
  firstconv.weight               params/encoder/firstconv/kernel
  firstbn.{weight,bias}          params/encoder/firstbn/{scale,bias}
  firstbn.running_{mean,var}     batch_stats/encoder/firstbn/{mean,var}
  layerX.Y.convZ.weight          params/encoder/layerX_{Y}/convZ/kernel
  layerX.Y.bnZ.*                 .../layerX_{Y}/bnZ/*
  layerX.Y.downsample.0.weight   .../layerX_{Y}/ds_conv/kernel
  layerX.Y.downsample.1.*        .../layerX_{Y}/ds_bn/*
  conv_coarse.conv.*             params/conv_coarse/conv/*
  conv_coarse.bn.*               params+batch_stats/conv_coarse/bn/*
  upconvN.conv.conv/bn.*         upconvN/conv/conv, upconvN/conv/bn
  iconvN.conv/bn.*               iconvN/conv, iconvN/bn
  conv_fine.conv/bn.*            conv_fine/conv, conv_fine/bn
  (head) convK.weight/bias       params/convK/kernel,bias
  (head) relu.weight             params/prelu

Conv kernels transpose [out,in,kh,kw] -> [kh,kw,in,out].
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _bn_entries(out, prefix_params, prefix_stats, torch_prefix, sd):
    _set(out, ("params",) + prefix_params + ("scale",), sd[torch_prefix + ".weight"])
    _set(out, ("params",) + prefix_params + ("bias",), sd[torch_prefix + ".bias"])
    _set(
        out,
        ("batch_stats",) + prefix_stats + ("mean",),
        sd[torch_prefix + ".running_mean"],
    )
    _set(
        out,
        ("batch_stats",) + prefix_stats + ("var",),
        sd[torch_prefix + ".running_var"],
    )


def _convbnelu(out, flax_prefix, torch_prefix, sd):
    """Reference `conv` block: .conv (with bias) + .bn."""
    _set(out, ("params",) + flax_prefix + ("conv", "kernel"),
         _conv_w(sd[torch_prefix + ".conv.weight"]))
    _set(out, ("params",) + flax_prefix + ("conv", "bias"),
         sd[torch_prefix + ".conv.bias"])
    _bn_entries(out, flax_prefix + ("bn",), flax_prefix + ("bn",),
                torch_prefix + ".bn", sd)


def import_resunet(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch ResUNet/ResUNetHR state_dict -> flax variables
    {'params','batch_stats'}.

    The HR variant (detected by its extra decoder level, upconv1) is
    laid out differently on the flax side: the stem and residual layers
    live at the TOP level as ``stem_conv``/``stem_bn``/``layerN_i``
    (ResUNetHR keeps the un-pooled stem for its H/2 skip, so it doesn't
    reuse the ResNetEncoder submodule)."""
    sd = {k: v for k, v in sd.items()}
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    hr = "upconv1.conv.conv.weight" in sd  # ResUNetHR
    enc = () if hr else ("encoder",)
    stem_conv, stem_bn = ("stem_conv", "stem_bn") if hr else ("firstconv", "firstbn")

    _set(out, ("params",) + enc + (stem_conv, "kernel"), _conv_w(sd["firstconv.weight"]))
    _bn_entries(out, enc + (stem_bn,), enc + (stem_bn,), "firstbn", sd)

    # encoder residual layers
    blocks = sorted(
        {
            (k.split(".")[0], int(k.split(".")[1]))
            for k in sd
            if k.startswith("layer")
        }
    )
    for lname, bi in blocks:
        tp = f"{lname}.{bi}"
        fp = enc + (f"{lname}_{bi}",)
        for ci in (1, 2, 3):
            if f"{tp}.conv{ci}.weight" not in sd:
                continue
            _set(out, ("params",) + fp + (f"conv{ci}", "kernel"),
                 _conv_w(sd[f"{tp}.conv{ci}.weight"]))
            _bn_entries(out, fp + (f"bn{ci}",), fp + (f"bn{ci}",), f"{tp}.bn{ci}", sd)
        if f"{tp}.downsample.0.weight" in sd:
            _set(out, ("params",) + fp + ("ds_conv", "kernel"),
                 _conv_w(sd[f"{tp}.downsample.0.weight"]))
            _bn_entries(out, fp + ("ds_bn",), fp + ("ds_bn",), f"{tp}.downsample.1", sd)

    # decoder
    _convbnelu(out, ("conv_coarse",), "conv_coarse", sd)
    _convbnelu(out, ("conv_fine",), "conv_fine", sd)
    for name in ("upconv3", "upconv2"):
        _convbnelu(out, (name, "conv"), f"{name}.conv", sd)
    for name in ("iconv3", "iconv2"):
        _convbnelu(out, (name,), name, sd)
    if hr:
        _convbnelu(out, ("upconv1", "conv"), "upconv1.conv", sd)
        _convbnelu(out, ("iconv1",), "iconv1", sd)
    return out


def import_torchvision_resnet(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision resnet state_dict -> flax ResNetEncoder variables.

    Used to seed `pretrained: True` runs from an ImageNet .pth file.
    """
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    _set(out, ("params", "firstconv", "kernel"), _conv_w(sd["conv1.weight"]))
    _bn_entries(out, ("firstbn",), ("firstbn",), "bn1", sd)
    blocks = sorted(
        {
            (k.split(".")[0], int(k.split(".")[1]))
            for k in sd
            if k.startswith("layer") and not k.startswith("layer4")
        }
    )
    for lname, bi in blocks:
        tp = f"{lname}.{bi}"
        fp = (f"{lname}_{bi}",)
        for ci in (1, 2, 3):
            if f"{tp}.conv{ci}.weight" not in sd:
                continue
            _set(out, ("params",) + fp + (f"conv{ci}", "kernel"),
                 _conv_w(sd[f"{tp}.conv{ci}.weight"]))
            _bn_entries(out, fp + (f"bn{ci}",), fp + (f"bn{ci}",), f"{tp}.bn{ci}", sd)
        if f"{tp}.downsample.0.weight" in sd:
            _set(out, ("params",) + fp + ("ds_conv", "kernel"),
                 _conv_w(sd[f"{tp}.downsample.0.weight"]))
            _bn_entries(out, fp + ("ds_bn",), fp + ("ds_bn",), f"{tp}.downsample.1", sd)
    return out


def import_keypoint_det(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch KeypointDet state_dict -> flax variables {'params'}."""
    out: Dict[str, Any] = {"params": {}}
    for name in ("conv1", "conv2", "conv3", "convimg"):
        _set(out, ("params", name, "kernel"), _conv_w(sd[f"{name}.weight"]))
        _set(out, ("params", name, "bias"), sd[f"{name}.bias"])
    _set(out, ("params", "prelu"), sd["relu.weight"])
    return out


def import_posfeat_checkpoint(ckpt_dir: str, out_dir: str) -> None:
    """Convert a reference checkpoint dir (backbone.pth + localheader.pth)
    into this framework's msgpack layout."""
    import os

    import torch

    from .checkpoint import save_module_variables

    os.makedirs(out_dir, exist_ok=True)
    bp = os.path.join(ckpt_dir, "backbone.pth")
    hp = os.path.join(ckpt_dir, "localheader.pth")
    if os.path.exists(bp):
        sd = torch.load(bp, map_location="cpu")
        save_module_variables(import_resunet(sd), os.path.join(out_dir, "backbone"))
        print(f"converted backbone -> {out_dir}/backbone.msgpack")
    if os.path.exists(hp):
        sd = torch.load(hp, map_location="cpu")
        save_module_variables(
            import_keypoint_det(sd), os.path.join(out_dir, "localheader")
        )
        print(f"converted localheader -> {out_dir}/localheader.msgpack")
