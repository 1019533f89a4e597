"""Reversible conv sequences with O(1) activation memory.

The reference's memory headline (RevPHiSeg, arXiv:2008.06999, "up to 30%
memory savings") comes from revtorch additive-coupling blocks: split the
C channels into two streams, y1 = x1 + f(x2), y2 = x2 + g(y1); the backward
pass *reconstructs* x1,x2 from y1,y2 instead of storing them
(reference torchlayers.py:55-82 via external revtorch).

TPU-native equivalents, selectable per model via ``reversible_mode``:

* ``"reversible"`` — a jax.custom_vjp chain that stores only the final
  output per sequence; the bwd rule inverts each coupling block
  (x2 = y2 - g(y1); x1 = y1 - f(x2)) and re-runs f/g under jax.vjp for
  exact gradients. True O(depth)->O(1) activation scaling.
* ``"remat"``    — jax.checkpoint around the sequence: idiomatic JAX
  rematerialization (stores block inputs, recomputes insides).

f and g are conv(3x3) + BatchNorm(batch stats in train) + ReLU on C/2
channels, exactly the reference's coupling functions. BN makes the blocks
state-carrying: in train mode stats come from the live batch (so the
inverse is exact); EMA running stats are emitted as auxiliary outputs and
folded into the ``batch_stats`` collection by the wrapping linen module.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import numpy as np
import jax
import jax.lax as lax
import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu.ops import init as init_lib
from unet_zoo_tpu.ops.conv import ConvBNAct, _dim_numbers

BN_EPS = 1e-3


def _fg_apply(p, x, *, train: bool, ema: Optional[Any] = None):
    """conv3x3 + BN + ReLU coupling function. Returns (out, (mean, unbiased_var))."""
    ndim = x.ndim - 2
    # no preferred_element_type: f32 output would make the backward
    # cotangent dtype mismatch bf16 operands (see ops/conv.py note)
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1,) * ndim,
        padding=[(1, 1)] * ndim,
        dimension_numbers=_dim_numbers(ndim),
    ).astype(x.dtype)
    # stop_gradient: the bias grad is ~0 through the train-mode BN below
    # (its backward projects out per-channel cotangent means); skipping it
    # deletes a whole-cotangent convert+reduce per conv (ops/conv.py note).
    y = y + lax.stop_gradient(p["bias"])
    yf = y.astype(jnp.float32)
    if train:
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(yf, axis=axes)
        var = jnp.maximum(jnp.mean(jnp.square(yf), axis=axes) - jnp.square(mean), 0.0)
        n = y.size // y.shape[-1]
        stats = (mean, var * (n / max(n - 1, 1)))
    else:
        mean, var = ema
        stats = (mean, var)
    out = (yf - mean) * lax.rsqrt(var + BN_EPS) * p["scale"] + p["shift"]
    return jax.nn.relu(out).astype(x.dtype), stats


def _chain_fwd_collect(params, x, train, ema_list, per_block_remat=False):
    """Plain forward through the coupling chain, collecting BN stats.

    ``per_block_remat``: jax.checkpoint each coupling block, so the backward
    stores only the block-boundary activations and recomputes f/g internals
    (the idiomatic-JAX memory lever; a single checkpoint around the whole
    chain would NOT reduce the backward peak — the recompute materializes
    every activation again simultaneously)."""
    stats_out = []
    h = x

    def one_block(blk, h, ema_f, ema_g):
        c = h.shape[-1] // 2
        h1, h2 = h[..., :c], h[..., c:]
        f_out, f_stats = _fg_apply(blk["f"], h2, train=train, ema=ema_f)
        y1 = h1 + f_out
        g_out, g_stats = _fg_apply(blk["g"], y1, train=train, ema=ema_g)
        y2 = h2 + g_out
        return jnp.concatenate([y1, y2], axis=-1), (f_stats, g_stats)

    if per_block_remat:
        one_block = jax.checkpoint(one_block)

    for i, blk in enumerate(params):
        ema_f = ema_list[i]["f"] if ema_list is not None else None
        ema_g = ema_list[i]["g"] if ema_list is not None else None
        h, (f_stats, g_stats) = one_block(blk, h, ema_f, ema_g)
        stats_out.append({"f": f_stats, "g": g_stats})
    return h, stats_out


def _fg_primal(p, h):
    out, _ = _fg_apply(p, h, train=True)
    return out


def _pack(h):
    """(B, S1, *rest) flat packing: padding-free, mesh-shardable."""
    return h.reshape(h.shape[0], h.shape[1], -1)


def _chain_scan_fwd(stacked, x1, x2, shape):
    """Coupling chain as lax.scan over depth-stacked per-block params.

    Two memory mechanisms, both load-bearing (measured on TPU v5e):

    * the scan forces XLA to schedule one block at a time (carry buffers
      reused), so neither fwd nor bwd can hoist several blocks'
      recompute/vjp intermediates into one live set — the unrolled
      python-loop version measured reversible peak ABOVE plain;
    * ``x1``/``x2`` and all long-lived values (carries, residuals) are
      PACKED to rank-3 (B, S1, rest). The C/2-channel half-tensors would
      otherwise be materialized in conv layouts with the channel dim
      padded to 128 lanes — an 8x inflation at C/2=16 (a depth-1 block
      measured 640 MiB of temps vs 128 MiB for its plain twin). Packed
      buffers are padding-free (the minor dim is large), and keeping the
      batch + leading-spatial dims intact lets the ("data", "space") mesh
      shardings propagate through the chain. The NHWC view exists only
      transiently inside the scan body where the convs run.
    """

    def body(carry, p):
        h1, h2 = carry
        f_out, f_stats = _fg_apply(p["f"], h2.reshape(shape), train=True)
        y1 = h1 + _pack(f_out)
        g_out, g_stats = _fg_apply(p["g"], y1.reshape(shape), train=True)
        y2 = h2 + _pack(g_out)
        return (y1, y2), (f_stats, g_stats)

    (y1, y2), stats = lax.scan(body, (x1, x2), stacked)
    return y1, y2, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rev_chain_train(stacked, x1, x2, shape):
    return _chain_scan_fwd(stacked, x1, x2, shape)


def _rev_chain_train_fwd(stacked, x1, x2, shape):
    y1, y2, stats = _chain_scan_fwd(stacked, x1, x2, shape)
    # Residuals: ONLY the (flat) outputs and params — no per-block
    # activations.
    return (y1, y2, stats), (stacked, y1, y2)


def _rev_chain_train_bwd(shape, res, cts):
    stacked, y1, y2 = res
    gy1, gy2, _ = cts  # stats cotangent is zero (non-differentiable path)

    def fg_flat(p, h_flat):
        return _pack(_fg_primal(p, h_flat.reshape(shape)))

    def body(carry, p):
        y1, y2, gy1, gy2 = carry
        # invert: x2 = y2 - g(y1); x1 = y1 - f(x2)
        g_out, g_vjp = jax.vjp(fg_flat, p["g"], y1)
        x2 = y2 - g_out
        f_out, f_vjp = jax.vjp(fg_flat, p["f"], x2)
        x1 = y1 - f_out

        dgp, dy1_from_g = g_vjp(gy2)
        gy1_eff = gy1 + dy1_from_g
        dfp, dx2_from_f = f_vjp(gy1_eff)
        gx2 = gy2 + dx2_from_f
        return (x1, x2, gy1_eff, gx2), {"f": dfp, "g": dgp}

    # reverse scan: last block first; dparams ys keep original block order
    (_, _, gx1, gx2), dparams = lax.scan(
        body, (y1, y2, gy1, gy2), stacked, reverse=True
    )
    return dparams, gx1, gx2


_rev_chain_train.defvjp(_rev_chain_train_fwd, _rev_chain_train_bwd)


class ReversibleSequence(nn.Module):
    """Reference ``ReversibleSequence`` (torchlayers.py:55-82), TPU-native.

    Optional 1x1 ConvBNAct to reach ``features`` channels, then ``depth``
    additive-coupling blocks over a C/2 + C/2 channel split.

    ``mode``: "reversible" (custom_vjp inverse reconstruction),
    "remat" (jax.checkpoint), or "plain" (store everything).
    """

    features: int
    depth: int = 3
    mode: str = "reversible"
    init_scheme: str = "torch_default"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(x, axis=-1)
        if x.shape[-1] != self.features:
            # remat the channel-matching 1x1: otherwise its pre-BN
            # activations are stored for backward and erase the memory the
            # coupling blocks save (measured: depth<=2 reversible blocks
            # cost MORE than plain without this)
            InitConv = nn.remat(ConvBNAct, static_argnums=(2,))
            x = InitConv(
                self.features,
                kernel_size=1,
                init_scheme=self.init_scheme,
                dtype=self.dtype,
                name="initial_conv",
            )(x, train)
        assert self.features % 2 == 0, "reversible split needs even channels"
        c = self.features // 2
        ndim = x.ndim - 2

        kernel_init, bias_init = init_lib.SCHEMES[self.init_scheme]
        if bias_init is None:
            bias_init = init_lib.torch_default_conv_bias(3**ndim * c)
        kshape = (3,) * ndim + (c, c)

        params = []
        ema_vars = []
        for i in range(self.depth):
            blk_p, blk_v = {}, {}
            for fg in ("f", "g"):
                prefix = f"block{i}_{fg}"
                blk_p[fg] = {
                    "kernel": self.param(f"{prefix}_kernel", kernel_init, kshape, jnp.float32),
                    "bias": self.param(f"{prefix}_bias", bias_init, (c,), jnp.float32),
                    "scale": self.param(f"{prefix}_scale", nn.initializers.ones, (c,), jnp.float32),
                    "shift": self.param(f"{prefix}_shift", nn.initializers.zeros, (c,), jnp.float32),
                }
                blk_v[fg] = (
                    self.variable("batch_stats", f"{prefix}_mean", lambda: jnp.zeros((c,), jnp.float32)),
                    self.variable("batch_stats", f"{prefix}_var", lambda: jnp.ones((c,), jnp.float32)),
                )
            params.append(blk_p)
            ema_vars.append(blk_v)

        if train:
            if self.mode == "reversible" and not self.is_initializing():
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
                half_shape = x.shape[:-1] + (c,)
                y1, y2, st = _rev_chain_train(
                    stacked,
                    _pack(x[..., :c]),
                    _pack(x[..., c:]),
                    half_shape,
                )
                from unet_zoo_tpu.parallel.space import constrain

                y = constrain(jnp.concatenate(
                    [y1.reshape(half_shape), y2.reshape(half_shape)], axis=-1
                ))
                # unstack (depth, C/2) scan stats back to per-block tuples
                stats = [
                    {
                        fg: (st[0 if fg == "f" else 1][0][i],
                             st[0 if fg == "f" else 1][1][i])
                        for fg in ("f", "g")
                    }
                    for i in range(self.depth)
                ]
            elif self.mode == "remat" and not self.is_initializing():
                y, stats = _chain_fwd_collect(
                    params, x, True, None, per_block_remat=True
                )
            else:
                y, stats = _chain_fwd_collect(params, x, True, None)
            if not self.is_initializing():
                m = 0.01  # torch momentum, matching BatchNorm default
                for i in range(self.depth):
                    for fg in ("f", "g"):
                        mean_v, var_v = ema_vars[i][fg]
                        bmean, bvar = stats[i][fg]
                        mean_v.value = (1 - m) * mean_v.value + m * bmean
                        var_v.value = (1 - m) * var_v.value + m * bvar
        else:
            ema = [
                {fg: (ema_vars[i][fg][0].value, ema_vars[i][fg][1].value) for fg in ("f", "g")}
                for i in range(self.depth)
            ]
            y, _ = _chain_fwd_collect(params, x, False, ema)
        return y
