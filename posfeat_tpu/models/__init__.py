"""Model zoo: descriptor backbones and keypoint heads (flax.linen, NHWC)."""

from .resunet import ResUNet, ResUNetHR
from .keypoint_det import KeypointDet
from .posfeat import PoSFeat

BACKBONES = {"ResUNet": ResUNet, "ResUNetHR": ResUNetHR}
HEADS = {"KeypointDet": KeypointDet}
MODELS = {"PoSFeat": PoSFeat}
