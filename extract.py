"""Feature-extraction CLI (reference extract.py).

Usage: python extract.py --config configs/extract_hpatches.yaml
"""

import argparse

from posfeat_tpu.extract import Extractor

parser = argparse.ArgumentParser(description="PoSFeat-TPU feature extraction")
parser.add_argument("--config", type=str, required=True, help="yaml config file")
parser.add_argument("--local_rank", type=int, default=0, help="kept for CLI parity")
args = parser.parse_args()

if __name__ == "__main__":
    extractor = Extractor(args.config)
    extractor.extract()
