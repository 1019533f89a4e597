"""Resize ops with exact torch ``F.interpolate`` semantics, TPU-first.

The reference mixes interpolation conventions that change numerics:

* U-Net up path: bilinear, ``align_corners=False``  (reference models/unet.py:67)
* PHiSeg up paths: bilinear/trilinear, ``align_corners=True``
  (reference models/phiseg.py:66,216,305-309)
* PHiSeg output heads: ``nearest`` to full resolution (models/phiseg.py:321)

Implementation: separable 1-D interpolation expressed as small static
matrices contracted with einsum — on TPU each becomes an MXU matmul fused
with neighbors, instead of gather chains. Matrices are built in numpy at
trace time (shapes are static under jit).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_len: int, out_len: int, align_corners: bool) -> np.ndarray:
    """(out_len, in_len) row-stochastic linear interpolation matrix."""
    w = np.zeros((out_len, in_len), np.float32)
    if in_len == 1:
        w[:, 0] = 1.0
        return w
    i = np.arange(out_len, dtype=np.float64)
    if align_corners:
        if out_len == 1:
            src = np.zeros(1)
        else:
            src = i * (in_len - 1) / (out_len - 1)
    else:
        src = (i + 0.5) * in_len / out_len - 0.5
        src = np.clip(src, 0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_len - 2)
    frac = src - lo
    w[np.arange(out_len), lo] = 1.0 - frac
    w[np.arange(out_len), lo + 1] += frac
    return w


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_len: int, out_len: int) -> np.ndarray:
    """torch 'nearest': src = floor(i * in / out)."""
    w = np.zeros((out_len, in_len), np.float32)
    src = np.floor(np.arange(out_len) * in_len / out_len).astype(np.int64)
    src = np.minimum(src, in_len - 1)
    w[np.arange(out_len), src] = 1.0
    return w


@functools.lru_cache(maxsize=None)
def _axis_contraction(ndim: int, axis: int):
    """custom_vjp axis contraction: forward is the in-place nd einsum;
    backward contracts the cotangent against a PRE-TRANSPOSED (in, out)
    matrix instead of XLA's automatic transpose of the forward einsum.

    The automatic transpose left an ~0.8 ms/step "data formatting" layout
    copy in the bs64 UNet train-step backward (trace attribution,
    tools/profile_train.py); the pre-transposed bwd einsum is part of the
    A/B-measured combo that took that step 1630 -> 1779 img/s with grad
    max-abs-err 0.0 vs the plain einsum (tools/bench_step_variants.py
    `resizeVJP`). The same idea was NEUTRAL at PHiSeg-bs12 shapes in
    round 3 — kept because it is exact everywhere and wins at bs64.

    NOTE: custom_vjp makes everything built on this (resize_linear,
    downsample, avg_pool_ceil) REVERSE-mode only — jvp/jacfwd/linearize
    will raise. Nothing in the repo uses forward-mode AD; if that ever
    changes, add a defjvp or gate the custom_vjp behind a flag."""
    letters = "bdhwc"[:ndim]
    in_sub = letters
    out_sub = letters[:axis] + "o" + letters[axis + 1 :]
    fwd_eq = f"{in_sub},o{letters[axis]}->{out_sub}"
    bwd_eq = f"{out_sub},{letters[axis]}o->{in_sub}"

    @jax.custom_vjp
    def apply(x, m, mt):
        return jnp.einsum(fwd_eq, x, m, precision=jax.lax.Precision.HIGHEST)

    def fwd(x, m, mt):
        return apply(x, m, mt), (m, mt)

    def bwd(res, g):
        m, mt = res
        dx = jnp.einsum(bwd_eq, g, mt, precision=jax.lax.Precision.HIGHEST)
        return dx, None, None

    apply.defvjp(fwd, bwd)
    return apply


def _apply_axis_matrix(x, mat: np.ndarray, axis: int):
    """Contract interpolation matrix over one axis: out[..., o, ...] = Σ_i M[o,i] x[..., i, ...].

    Contracts in place (no moveaxis): explicit transposes around the einsum
    materialized whole-tensor layout copies on TPU (profiled ~5 ms per
    resize at bench shapes).

    HIGHEST precision: interpolation weights must not be bf16-rounded on
    TPU. Formulations measured and rejected at bench shapes (north-star
    fwd, bs512 bf16): rank-3 merged-trailing-dims einsum 8.9k img/s,
    shift+interleave scale-2 fast path 5.3k, DEFAULT precision no
    change — this in-place nd einsum with the W-before-H axis order
    (see resize_linear) is the best at 10.5k."""
    assert x.ndim <= 5, x.shape
    m = jnp.asarray(mat, dtype=x.dtype)
    mt = jnp.asarray(np.ascontiguousarray(mat.T), dtype=x.dtype)
    return _axis_contraction(x.ndim, axis)(x, m, mt)


def resize_linear(x, out_size, align_corners: bool):
    """Bi/tri-linear resize of NHWC / NDHWC input to spatial ``out_size``.

    Stays on the einsum-matrix path for ALL scales: a hand-written
    shift+interleave fast path for scale-2 half-pixel upsampling measured
    2x SLOWER end-to-end (north-star fwd 10.1k -> 5.3k img/s) — the
    interleave's stack+reshape lowers to worse layout churn than the
    dot_general it replaced. Measured round 2; don't retry."""
    spatial_axes = tuple(range(1, x.ndim - 1))
    assert len(out_size) == len(spatial_axes), (out_size, x.shape)
    # W-then-H: the LAST contraction's dot_general output feeds the next
    # conv, and contracting H last leaves a layout needing a whole-tensor
    # copy (profiled 7 ms/iter at bench shapes); W-last lands conv-ready
    for axis, out_len in reversed(list(zip(spatial_axes, out_size))):
        in_len = x.shape[axis]
        if in_len != out_len:
            x = _apply_axis_matrix(x, _linear_matrix(in_len, out_len, align_corners), axis)
    # re-pin the "space" sharding: GSPMD otherwise replicates after the H
    # contraction and everything downstream stays replicated
    from unet_zoo_tpu.parallel.space import constrain

    return constrain(x)


def upsample_linear(x, scale: int = 2, align_corners: bool = True):
    out = tuple(s * scale for s in x.shape[1:-1])
    return resize_linear(x, out, align_corners)


def upsample_nearest(x, out_size):
    """Nearest-neighbor resize (torch 'nearest' index convention).

    For integer upscale factors this lowers to a broadcast+reshape
    (jnp.repeat), free of gathers; otherwise a one-hot matmul.
    """
    spatial_axes = tuple(range(1, x.ndim - 1))
    assert len(out_size) == len(spatial_axes)
    for axis, out_len in zip(spatial_axes, out_size):
        in_len = x.shape[axis]
        if out_len == in_len:
            continue
        if out_len % in_len == 0:
            x = jnp.repeat(x, out_len // in_len, axis=axis)
        else:
            x = _apply_axis_matrix(x, _nearest_matrix(in_len, out_len), axis)
    from unet_zoo_tpu.parallel.space import constrain

    return constrain(x)
