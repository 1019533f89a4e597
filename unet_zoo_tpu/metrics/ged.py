"""Generalised Energy Distance, vectorized for TPU.

Reference semantics (utils.py:148-200): distance between two label maps is
1 - mean_{l in label_range} IoU_l with empty-mask conventions
(both empty → IoU 1; exactly one empty → IoU 0); NOTE the mean divides by
``nlabels`` even when label_range is shorter — reproduced faithfully
(the harness calls it with nlabels = n_classes - 1 and
label_range = 1..n_classes-1, train_model.py:198-200, so they coincide).

GED² = 2/(NM) Σ d(s_i, y_j) − 1/N² Σ d(s_i, s_j) − 1/M² Σ d(y_i, y_j).

TPU design: all three pairwise blocks come from ONE cross-IoU computation
over the stacked (N+M) masks. Per label, masks flatten to a (N+M, P)
binary matrix A; intersections = A Aᵀ is an MXU matmul; unions follow from
row sums. No host transfer, no O((N+M)²) python loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def pairwise_iou_distance(masks, nlabels: int, label_range: Sequence[int]):
    """All-pairs distance matrix d(m_i, m_j) for integer label maps.

    masks: (K, *spatial) integer labels. Returns (K, K) float32.
    """
    K = masks.shape[0]
    flat = masks.reshape(K, -1)
    total = jnp.zeros((K, K), jnp.float32)
    for lbl in label_range:
        binm = (flat == lbl).astype(jnp.float32)
        sizes = jnp.sum(binm, axis=1)  # (K,)
        inter = binm @ binm.T  # MXU matmul: |m_i ∩ m_j|
        union = sizes[:, None] + sizes[None, :] - inter
        both_empty = (sizes[:, None] == 0) & (sizes[None, :] == 0)
        one_empty = ((sizes[:, None] == 0) | (sizes[None, :] == 0)) & ~both_empty
        iou = jnp.where(
            both_empty, 1.0, jnp.where(one_empty, 0.0, inter / jnp.maximum(union, 1.0))
        )
        total = total + iou
    return 1.0 - total / nlabels


def generalised_energy_distance(
    sample_arr,
    gt_arr,
    nlabels: int = 1,
    label_range: Optional[Sequence[int]] = None,
):
    """sample_arr: (N, *spatial) int labels; gt_arr: (M, *spatial).

    Returns scalar GED² (can be negative on tiny inputs, like the reference).
    """
    if label_range is None:
        label_range = list(range(nlabels))
    N, M = sample_arr.shape[0], gt_arr.shape[0]
    stacked = jnp.concatenate(
        [sample_arr.reshape(N, -1), gt_arr.reshape(M, -1)], axis=0
    )
    d = pairwise_iou_distance(stacked, nlabels, label_range)
    d_sy = jnp.sum(d[:N, N:])
    d_ss = jnp.sum(d[:N, :N])
    d_yy = jnp.sum(d[N:, N:])
    return (2.0 / (N * M)) * d_sy - (1.0 / N**2) * d_ss - (1.0 / M**2) * d_yy
