"""Training CLI (reference train.py).

Usage: python train.py --config configs/train_desc.yaml
"""

import argparse

from posfeat_tpu.train import Trainer

parser = argparse.ArgumentParser(description="PoSFeat-TPU training")
parser.add_argument("--config", type=str, required=True, help="yaml config file")
parser.add_argument("--local_rank", type=int, default=0, help="kept for CLI parity")
parser.add_argument("--overwrite", action="store_true", help="allow existing run dir")
args = parser.parse_args()

if __name__ == "__main__":
    trainer = Trainer(args.config, overwrite=args.overwrite)
    trainer.train()
