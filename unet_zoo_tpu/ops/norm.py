"""Functional BatchNorm with exact torch semantics.

The reference wraps every conv in BatchNorm(eps=1e-3, momentum=0.01)
(reference torchlayers.py:20). torch semantics we reproduce:

* training: normalize with *biased* batch variance; update running stats as
  ``running = (1 - momentum) * running + momentum * batch`` where the
  variance contribution is the *unbiased* batch variance;
* eval (``use_running_average=True``): normalize with the stored EMA stats.

Running stats live in the ``batch_stats`` collection (a separate pytree the
trainer threads functionally — no module mutation).

For multi-chip data parallelism, pass ``axis_name`` to compute sync-BN
statistics with an ``lax.pmean`` over the mesh data axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class BatchNorm(nn.Module):
    momentum: float = 0.01  # torch-style: weight of the *new* batch stat
    eps: float = 1e-3
    axis_name: Optional[str] = None  # set for cross-replica sync-BN
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                n = x.size // features
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
