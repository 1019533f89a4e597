"""Variance-NCC between sample-disagreement and sample-GT-disagreement maps.

Reference semantics (utils.py:130-145, 202-247):
* E_ss(x)  = mean_i CE(sample_i(x), mean_seg(x))   — pixelwise xent maps
* E_sy_j(x)= mean_i CE(sample_i(x), gt_j(x))
* score    = mean_j zero-normalized cross-correlation(E_ss, E_sy_j)

Everything is a fused stack of elementwise ops + reductions — one XLA
program instead of the reference's numpy double loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def ncc(a, v, zero_norm: bool = True, eps: float = 0.0):
    """Normalized cross-correlation of two equal-size maps (reference ncc)."""
    a = a.reshape(-1).astype(jnp.float32)
    v = v.reshape(-1).astype(jnp.float32)
    if zero_norm:
        a = (a - jnp.mean(a)) / (jnp.std(a) * a.shape[0] + eps)
        v = (v - jnp.mean(v)) / (jnp.std(v) + eps)
    else:
        a = a / (jnp.std(a) * a.shape[0] + eps)
        v = v / (jnp.std(v) + eps)
    return jnp.sum(a * v)


def _pixel_wise_xent(samp, gt, eps: float = 1e-8):
    # samp: (..., C, *S) probabilities with class axis FIRST after sample axes,
    # matching reference CHW convention? We use channel-LAST throughout:
    # samp: (..., *S, C); gt one-hot same shape.
    return -jnp.sum(gt * jnp.log(samp + eps), axis=-1)


def variance_ncc_dist(sample_arr, gt_arr):
    """sample_arr: (N, *S, C) softmax probabilities; gt_arr: (M, *S, C) one-hot.

    Returns the mean-over-GTs NCC scalar (reference variance_ncc_dist).
    """
    sample_arr = sample_arr.astype(jnp.float32)
    gt_arr = gt_arr.astype(jnp.float32)
    mean_seg = jnp.mean(sample_arr, axis=0)  # (*S, C)

    e_ss = jnp.mean(_pixel_wise_xent(sample_arr, mean_seg[None]), axis=0)  # (*S,)
    # (M, N, *S): CE of each sample against each GT
    e_sy = _pixel_wise_xent(sample_arr[None], gt_arr[:, None])
    e_sy = jnp.mean(e_sy, axis=1)  # (M, *S)

    M = gt_arr.shape[0]
    scores = jnp.stack([ncc(e_ss, e_sy[j]) for j in range(M)])
    return jnp.mean(scores)


def variance_ncc_dist_class_first(sample_cf, gt_cf):
    """Same metric as :func:`variance_ncc_dist`, with the class axis FIRST:
    sample_cf (C, N, *S) softmax probabilities, gt_cf (C, M, *S) one-hot.

    TPU layout variant: a (N, *S, C) probability tensor with tiny C on the
    minor (lane) dimension is tile-padded C->128 (64x memory inflation at
    C=2 — the round-2 lane-padding lesson); class-FIRST keeps the lane
    dimension on *S. Numerics are identical (same sums, reordered axes);
    pinned against variance_ncc_dist by test."""
    sample_cf = sample_cf.astype(jnp.float32)
    gt_cf = gt_cf.astype(jnp.float32)
    log_s = jnp.log(sample_cf + 1e-8)  # eps matches _pixel_wise_xent
    mean_seg = jnp.mean(sample_cf, axis=1)  # (C, *S)

    # e_ss = mean_i [-sum_c mean_seg_c * log p_i_c]   -> (*S,)
    e_ss = -jnp.mean(
        jnp.sum(mean_seg[:, None] * log_s, axis=0), axis=0
    )
    # e_sy[j] = mean_i [-sum_c gt_jc * log p_i_c]     -> (M, *S)
    e_sy = -jnp.mean(
        jnp.sum(gt_cf[:, :, None] * log_s[:, None], axis=0), axis=1
    )
    M = gt_cf.shape[1]
    scores = jnp.stack([ncc(e_ss, e_sy[j]) for j in range(M)])
    return jnp.mean(scores)
