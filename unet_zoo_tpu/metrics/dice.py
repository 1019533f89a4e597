"""Dice coefficients with the reference's empty-mask conventions
(train_model.py:211-224): both empty → 1.0, exactly one empty → 0.0,
otherwise 2|A∩B| / (|A|+|B|).
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_binary(pred, gt):
    """Dice of two binary masks (any shape) with empty conventions."""
    pred = pred.astype(jnp.float32).reshape(-1)
    gt = gt.astype(jnp.float32).reshape(-1)
    sp, sg = jnp.sum(pred), jnp.sum(gt)
    inter = jnp.sum(pred * gt)
    both_empty = (sp == 0) & (sg == 0)
    one_empty = ((sp == 0) | (sg == 0)) & ~both_empty
    dice = 2.0 * inter / jnp.maximum(sp + sg, 1.0)
    return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, dice))


def dice_per_label(pred_labels, gt_labels, num_classes: int):
    """Per-class Dice between integer label maps. Returns (num_classes,)."""
    out = []
    for lbl in range(num_classes):
        out.append(dice_binary(pred_labels == lbl, gt_labels == lbl))
    return jnp.stack(out)
