"""Model zoo: UNet variants (stage 1) and GoogLeNet (stage 2)."""

from unet_goolenet_tpu.models.unet import (
    UNetBasic,
    UNetTask,
    UNetTaskAlig,
    UNetTaskAligWeight,
)
from unet_goolenet_tpu.models.googlenet import GoogLeNet, GoogLeNetClassifier

__all__ = [
    "UNetBasic",
    "UNetTask",
    "UNetTaskAlig",
    "UNetTaskAligWeight",
    "GoogLeNet",
    "GoogLeNetClassifier",
]
