"""On-device evaluation metrics.

The reference computes GED / NCC / Dice on CPU with per-pair python loops
over medpy calls (reference utils.py:148-247, train_model.py:198-224) —
the dominant eval cost. Here every metric is a batched XLA program:
pairwise IoU becomes one MXU matmul over flattened binary masks, NCC a
fused reduction, so a 100-sample GED is a single device call.
"""

from unet_zoo_tpu.metrics.ged import generalised_energy_distance, pairwise_iou_distance
from unet_zoo_tpu.metrics.ncc import (
    variance_ncc_dist,
    variance_ncc_dist_class_first,
    ncc,
)
from unet_zoo_tpu.metrics.dice import dice_per_label, dice_binary
from unet_zoo_tpu.metrics.brats import (
    soft_dice,
    brats_dice_loss,
    sensitivity,
    specificity,
    hd95,
)

__all__ = [
    "generalised_energy_distance",
    "pairwise_iou_distance",
    "variance_ncc_dist",
    "variance_ncc_dist_class_first",
    "ncc",
    "dice_per_label",
    "dice_binary",
    "soft_dice",
    "brats_dice_loss",
    "sensitivity",
    "specificity",
    "hd95",
]
