"""Training losses and the correspondence preprocess engine."""

from .preprocess import Preprocess_Line2Window, Preprocess_Skip
from .epipolar_loss import EpipolarLoss_full
from .disk_loss import DiskLoss

PREPROCESSES = {
    "Preprocess_Line2Window": Preprocess_Line2Window,
    "Preprocess_Skip": Preprocess_Skip,
}
LOSSES = {
    "EpipolarLoss_full": EpipolarLoss_full,
    "DiskLoss": DiskLoss,
}
