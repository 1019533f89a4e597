"""Pooling with torch ``AvgPool(kernel=2, stride=2, ceil_mode=True)`` semantics.

The reference downsamples exclusively with this op (reference
models/unet.py:22, models/phiseg.py:23, models/phiseg3D.py:101). torch
ceil-mode divides each window by the number of *valid* (in-bounds)
elements — verified empirically: AvgPool2d(2,2,ceil)(3x3 iota) gives 8.0 at
the bottom-right 1-element window.

Implemented as reduce_window(sum) with high-side padding + a static count
normalization (precomputed in numpy, broadcast multiply — fuses into the
surrounding elementwise graph on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.lax as lax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _counts_1d(in_len: int, window: int, stride: int) -> np.ndarray:
    out_len = -(-max(in_len - window, 0) // stride) + 1  # ceil mode
    counts = np.empty((out_len,), np.float32)
    for o in range(out_len):
        start = o * stride
        counts[o] = min(start + window, in_len) - start
    return counts


def avg_pool_ceil(x, window: int = 2, stride: int = 2):
    """Ceil-mode average pool over all spatial axes of NHWC / NDHWC input."""
    ndim_spatial = x.ndim - 2
    window_dims = (1,) + (window,) * ndim_spatial + (1,)
    strides = (1,) + (stride,) * ndim_spatial + (1,)

    pads = [(0, 0)]
    counts_per_axis = []
    for axis in range(1, x.ndim - 1):
        in_len = x.shape[axis]
        counts = _counts_1d(in_len, window, stride)
        out_len = counts.shape[0]
        needed = (out_len - 1) * stride + window
        pads.append((0, needed - in_len))
        counts_per_axis.append(counts)
    pads.append((0, 0))

    summed = lax.reduce_window(
        x, np.zeros((), x.dtype), lax.add, window_dims, strides, tuple(pads)
    )

    # static 1/count normalization, separable across axes
    inv = np.float32(1.0)
    for axis, counts in enumerate(counts_per_axis, start=1):
        shape = [1] * x.ndim
        shape[axis] = counts.shape[0]
        inv = inv * (1.0 / counts).reshape(shape)
    from unet_zoo_tpu.parallel.space import constrain

    return constrain(summed * jnp.asarray(inv, dtype=x.dtype))
