"""BraTS-style metrics (reference data/bratsUtils.py:6-93).

soft/squared Dice, 3-region (WT/TC/ET) dice loss, sensitivity, specificity
are on-device jnp; hd95 (95th-percentile symmetric surface distance) runs
host-side on numpy via scipy's exact Euclidean distance transform —
it is an eval-only, per-volume scalar (the reference likewise computed it
on CPU via medpy).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def soft_dice(pred, target, smoothing: float = 1.0, non_squared: bool = False):
    """Mean-over-batch soft Dice. pred/target: (B, *spatial) floats.

    NOTE: reproduces the reference's nonSquared branch summing over the
    WHOLE batch (bratsUtils.py:9) rather than per-sample — used only by its
    binarized ``dice`` helper.
    """
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * target, axis=axes)
    if non_squared:
        union = jnp.sum(pred) + jnp.sum(target)
    else:
        union = jnp.sum(pred * pred, axis=axes) + jnp.sum(target * target, axis=axes)
    dice = (2 * inter + smoothing) / (union + smoothing)
    dice = jnp.nan_to_num(dice, nan=1.0)
    return jnp.mean(dice)


def brats_dice_loss(outputs, labels, non_squared: bool = False):
    """3-region dice loss, channel-last (B, *S, 3) for WT/TC/ET; the /5
    normalization is the reference's (bratsUtils.py:46)."""
    total = 0.0
    for c in range(3):
        total = total + (1.0 - soft_dice(outputs[..., c], labels[..., c],
                                         non_squared=non_squared))
    return total / 5.0


def sensitivity(pred, target):
    pred_bin = (pred > 0.5).astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred_bin * target)
    pos = jnp.sum(target)
    return jnp.where(pos == 0, 1.0, inter / jnp.maximum(pos, 1.0))


def specificity(pred, target):
    pred_neg = (pred <= 0.5).astype(jnp.float32)
    target_neg = (target == 0).astype(jnp.float32)
    inter = jnp.sum(pred_neg * target_neg)
    neg = jnp.sum(target_neg)
    return inter / jnp.maximum(neg, 1.0)


def _surface_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distances from surface voxels of ``a`` to the surface of ``b``
    (medpy __surface_distances semantics, isotropic unit spacing)."""
    from scipy import ndimage

    a = a.astype(bool)
    b = b.astype(bool)
    conn = ndimage.generate_binary_structure(a.ndim, 1)
    a_border = a ^ ndimage.binary_erosion(a, structure=conn, iterations=1)
    b_border = b ^ ndimage.binary_erosion(b, structure=conn, iterations=1)
    dt = ndimage.distance_transform_edt(~b_border)
    return dt[a_border]


def hd95(pred: np.ndarray, target: np.ndarray) -> float:
    """95th-percentile symmetric Hausdorff distance; -1 when either mask is
    empty (reference getHd95 edge case)."""
    pred = np.asarray(pred) > 0.5
    target = np.asarray(target) > 0.5
    if pred.sum() == 0 or target.sum() == 0:
        return -1.0
    d1 = _surface_distances(pred, target)
    d2 = _surface_distances(target, pred)
    return float(np.percentile(np.hstack([d1, d2]), 95))
