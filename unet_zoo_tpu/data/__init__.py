"""Data layer: host-side HDF5-backed batch providers + on-device augmentation.

Host does IO and index sampling (unet_zoo_tpu.data.batch_provider); all
per-pixel work (normalization, rotation/scale/elastic/flip augmentation)
runs on device inside the jitted step (unet_zoo_tpu.data.augment) — the
reverse of the reference's host-side cv2 loop (reference
data/batch_provider.py:140-272).
"""

from unet_zoo_tpu.data.batch_provider import BatchProvider, resize_batch
from unet_zoo_tpu.data.augment import (
    AugmentOptions,
    Augment3DOptions,
    augment_batch_2d,
    augment_batch_3d,
)
from unet_zoo_tpu.data.lidc import LIDCData
from unet_zoo_tpu.data.uzh import UZHProstateData, UZHMatData
from unet_zoo_tpu.data.brats import BratsData, to_evaluation_onehot
from unet_zoo_tpu.data.registry import DATASETS, data_switch
from unet_zoo_tpu.data import synthetic

__all__ = [
    "BatchProvider",
    "resize_batch",
    "AugmentOptions",
    "Augment3DOptions",
    "augment_batch_2d",
    "augment_batch_3d",
    "LIDCData",
    "UZHProstateData",
    "UZHMatData",
    "BratsData",
    "to_evaluation_onehot",
    "DATASETS",
    "data_switch",
    "synthetic",
]
