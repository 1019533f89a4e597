"""Weight initializers reproducing the reference's initialization schemes.

The reference mixes three schemes (see /root/reference/utils.py:69-90 and
models/probabilistic_unet.py:95-100):

* ``init_weights``: Kaiming-normal (fan_in, relu gain) kernel + truncated
  normal (std 1e-3, clipped at 2 std) bias — applied to the U-Net and the
  Prob-U-Net encoders.
* ``init_weights_orthogonal_normal``: orthogonal kernel + the same bias —
  applied to Fcomb.
* torch's *default* ``nn.Conv2d`` init (kaiming-uniform with a=sqrt(5) →
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) — PHiSeg
  never calls ``apply(init_weights)`` (reference models/phiseg.py:36), so
  it trains from torch defaults.

All initializers take/return HWIO (..., in, out) conv kernels, the
flax-native layout. fan_in = prod(kernel spatial) * in_channels, identical
to torch's NCHW fan_in.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in(shape) -> int:
    # HWIO: all leading dims except the last (out features) multiply into fan_in.
    return int(np.prod(shape[:-1]))


def kaiming_normal_fan_in(key, shape, dtype=jnp.float32):
    """He-normal, fan_in mode, relu gain: std = sqrt(2 / fan_in)."""
    std = float(np.sqrt(2.0 / _fan_in(shape)))
    return std * jax.random.normal(key, shape, dtype)


def truncated_normal_std(std: float = 1e-3):
    """Truncated normal within ±2 std, matching reference utils.truncated_normal_."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def torch_default_conv_kernel(key, shape, dtype=jnp.float32):
    """torch nn.ConvNd default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    bound = float(1.0 / np.sqrt(_fan_in(shape)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_conv_bias(fan_in: int):
    """torch nn.ConvNd default bias: U(±1/sqrt(fan_in)) with the *kernel's* fan_in."""
    bound = float(1.0 / np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal_kernel(key, shape, dtype=jnp.float32):
    """Orthogonal init over the (fan_in, out) matricization (torch semantics).

    torch's nn.init.orthogonal_ flattens to (out, fan_in) rows; an HWIO
    kernel reshaped to (fan_in, out) and orthogonalized column-wise is the
    transpose — same distribution.
    """
    flat = (int(np.prod(shape[:-1])), shape[-1])
    q = jax.nn.initializers.orthogonal(column_axis=-1)(key, flat, dtype)
    return q.reshape(shape)


# Named schemes consumed by layer modules.
SCHEMES = {
    # reference utils.init_weights
    "he_normal": (kaiming_normal_fan_in, truncated_normal_std(1e-3)),
    # reference utils.init_weights_orthogonal_normal
    "orthogonal": (orthogonal_kernel, truncated_normal_std(1e-3)),
    # torch nn.Conv2d defaults (used by PHiSeg which never re-initializes)
    "torch_default": (torch_default_conv_kernel, None),  # bias handled per-layer
}
