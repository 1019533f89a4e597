"""Pooling with torch ``AvgPool(kernel=2, stride=2, ceil_mode=True)`` semantics.

The reference downsamples exclusively with this op (reference
models/unet.py:22, models/phiseg.py:23, models/phiseg3D.py:101). torch
ceil-mode divides each window by the number of *valid* (in-bounds)
elements — verified empirically: AvgPool2d(2,2,ceil)(3x3 iota) gives 8.0 at
the bottom-right 1-element window.

Hybrid custom_vjp (round 5):

* FORWARD is ``reduce_window(sum)`` with high-side padding + a static
  1/count normalization (precomputed in numpy, broadcast multiply — fuses
  into the surrounding elementwise graph on TPU). This is the round-3
  formulation: the round-4 all-matmul form (HIGHEST-precision f32 einsum
  per axis, ``poolMM``) regressed the fwd-only north-star bench 10770 ->
  9743 img/s / fwd MFU 0.384 -> 0.355 (BENCH_r04.json) because it pays
  real MXU FLOPs where reduce_window fuses for free.
* BACKWARD contracts the cotangent against PRE-TRANSPOSED (in, out)
  averaging matrices, one MXU matmul per axis — the measured train-step
  win of ``poolMM`` (reduce_window's automatic transpose is a pad+window
  op that left a ~0.86 ms/step "output fusion" in the bs64 UNet
  train-step backward; part of the A/B combo that took that step
  1630 -> 1779 img/s, tools/bench_step_variants.py).

Gradient exactness: matrix entries are 1/count with count in {1, 2, 4, 8}
— exact in every dtype — and the bwd einsum accumulates f32 (HIGHEST)
even on bf16 inputs; pool grad max-abs-err 0.0 vs the reduce_window
transpose at bench shapes (even sizes; <=1 ulp f32 at odd sizes where
partial ceil-mode windows change the accumulation order).

Note: custom_vjp makes this op reverse-mode only (no jvp/jacfwd), same as
the resize path it mirrors (ops/resize.py:_axis_contraction).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
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


@functools.lru_cache(maxsize=None)
def _pool_fn(spatial_shape: tuple, ndim: int, window: int, stride: int):
    """custom_vjp pool for one static input signature: reduce_window fwd,
    pre-transposed per-axis matmul bwd (see module docstring)."""
    window_dims = (1,) + (window,) * (ndim - 2) + (1,)
    strides = (1,) + (stride,) * (ndim - 2) + (1,)

    pads = [(0, 0)]
    inv = np.float32(1.0)
    mts = []
    for axis, in_len in enumerate(spatial_shape, start=1):
        counts = _counts_1d(in_len, window, stride)
        out_len = counts.shape[0]
        needed = (out_len - 1) * stride + window
        pads.append((0, needed - in_len))
        shape = [1] * ndim
        shape[axis] = out_len
        inv = inv * (1.0 / counts).reshape(shape)
        mts.append(np.ascontiguousarray(_pool_matrix(in_len, window, stride).T))
    pads.append((0, 0))
    pads = tuple(pads)

    letters = "bdhwc"[:ndim]

    @jax.custom_vjp
    def pool(x):
        summed = lax.reduce_window(
            x, np.zeros((), x.dtype), lax.add, window_dims, strides, pads
        )
        return summed * jnp.asarray(inv, dtype=x.dtype)

    def fwd(x):
        return pool(x), None

    def bwd(_, g):
        # per-axis expansion out->in; reversed order mirrors the fwd
        # H-then-W contraction order of the matmul form it replaces
        for axis in reversed(range(1, ndim - 1)):
            out_sub = letters[:axis] + "o" + letters[axis + 1 :]
            eq = f"{out_sub},{letters[axis]}o->{letters}"
            mt = jnp.asarray(mts[axis - 1], dtype=g.dtype)
            g = jnp.einsum(eq, g, mt, precision=jax.lax.Precision.HIGHEST)
        return (g,)

    pool.defvjp(fwd, bwd)
    return pool


def avg_pool_ceil(x, window: int = 2, stride: int = 2):
    """Ceil-mode average pool over all spatial axes of NHWC / NDHWC input."""
    out = _pool_fn(tuple(x.shape[1:-1]), x.ndim, window, stride)(x)
    from unet_zoo_tpu.parallel.space import constrain

    return constrain(out)
