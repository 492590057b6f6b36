"""Host-side data pipeline (numpy + OpenCV, no torch).

Datasets yield plain numpy dicts; device placement/sharding happens in the
trainer/extractor. SIFT and pose→F-matrix math run in host worker threads,
exactly where the reference keeps them (DataLoader workers).
"""

from .extraction import HPatch_SIFT, Aachen_Day_Night, ETH_LFB
from .megadepth import MegaDepth_SIFT
from .synthetic import SyntheticPairs

DATASETS = {
    "HPatch_SIFT": HPatch_SIFT,
    "Aachen_Day_Night": Aachen_Day_Night,
    "ETH_LFB": ETH_LFB,
    "MegaDepth_SIFT": MegaDepth_SIFT,
    "SyntheticPairs": SyntheticPairs,
}
