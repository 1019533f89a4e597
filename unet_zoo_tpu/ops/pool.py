"""Pooling with torch ``AvgPool(kernel=2, stride=2, ceil_mode=True)`` semantics.

The reference downsamples exclusively with this op (reference
models/unet.py:22, models/phiseg.py:23, models/phiseg3D.py:101). torch
ceil-mode divides each window by the number of *valid* (in-bounds)
elements — verified empirically: AvgPool2d(2,2,ceil)(3x3 iota) gives 8.0 at
the bottom-right 1-element window.

Implemented as separable static (out, in) averaging matrices contracted on
the resize-einsum machinery: forward AND backward are single MXU matmuls
per axis. The previous reduce_window(sum)+count formulation left a
~0.86 ms/step "output fusion" in the bs64 UNet train-step backward
(reduce_window's transpose is a pad+window op); the matrix form is part of
the A/B-measured combo that took that step 1630 -> 1779 img/s with
fwd/grad max-abs-err 0.0 vs reduce_window (tools/bench_step_variants.py
`poolMM`). Matrix entries are 1/count with count in {1, 2, 4, 8} — exact
in every dtype — and the einsum accumulates f32 (HIGHEST) even on bf16
inputs.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _counts_1d(in_len: int, window: int, stride: int) -> np.ndarray:
    out_len = -(-max(in_len - window, 0) // stride) + 1  # ceil mode
    counts = np.empty((out_len,), np.float32)
    for o in range(out_len):
        start = o * stride
        counts[o] = min(start + window, in_len) - start
    return counts


@functools.lru_cache(maxsize=None)
def _pool_matrix(in_len: int, window: int, stride: int) -> np.ndarray:
    """(out_len, in_len) averaging matrix: row o holds 1/count over the
    valid (in-bounds) window elements — torch ceil-mode semantics."""
    counts = _counts_1d(in_len, window, stride)
    out_len = counts.shape[0]
    w = np.zeros((out_len, in_len), np.float32)
    for o in range(out_len):
        start = o * stride
        stop = min(start + window, in_len)
        w[o, start:stop] = 1.0 / counts[o]
    return w


def avg_pool_ceil(x, window: int = 2, stride: int = 2):
    """Ceil-mode average pool over all spatial axes of NHWC / NDHWC input."""
    from unet_zoo_tpu.ops import resize

    for axis in range(1, x.ndim - 1):
        w = _pool_matrix(x.shape[axis], window, stride)
        x = resize._apply_axis_matrix(x, w, axis)
    from unet_zoo_tpu.parallel.space import constrain

    return constrain(x)
