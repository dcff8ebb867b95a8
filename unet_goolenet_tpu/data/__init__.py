"""Host-side data layer: datasets, augmentation, loaders.

The device-resident parts of the reference's data path (wavelet enhance, ROI
extraction, normalisation) live in `ops`/`pipeline`; this package covers disk I/O,
PIL-semantics augmentation, and batching.
"""

from unet_goolenet_tpu.data.augment import AugmentConfig, Augmenter
from unet_goolenet_tpu.data.datasets import SegDataset, ClsDataset, ImageFolderDataset
from unet_goolenet_tpu.data.loader import DataLoader

__all__ = [
    "AugmentConfig",
    "Augmenter",
    "SegDataset",
    "ClsDataset",
    "ImageFolderDataset",
    "DataLoader",
]
