#!/usr/bin/env python
"""Inspect what each reversible_mode stores for backward.

jax.ad_checkpoint.saved_residuals lists the exact tensors the VJP keeps
live between forward and backward — the trace-level truth behind the
bench_memory.py XLA numbers. Runs on CPU (shapes only, no TPU needed).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def residual_report(mode: str, batch: int = 4, size: int = 64,
                    filters=(32, 64, 128, 192, 192, 192, 192)):
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    cfg = ExperimentConfig(
        experiment_name=f"res_{mode}",
        model="phiseg",
        filter_channels=filters,
        latent_levels=5,
        n_classes=2,
        batch_size=batch,
        image_size=(size, size),
        reversible_mode=mode,
        dtype="float32",
    )
    tr = Trainer(cfg, log_dir="/tmp/resbench", tensorboard=False)
    x = jnp.zeros((batch, size, size, 1), jnp.float32)
    y = jnp.zeros((batch, size, size), jnp.int32)

    def loss_fn(params):
        loss, _ = tr._forward_loss(params, tr.state.batch_stats, x, y,
                                   jax.random.PRNGKey(0))
        return loss

    from jax.ad_checkpoint import saved_residuals

    res = saved_residuals(loss_fn, tr.state.params)
    by_shape = defaultdict(lambda: [0, 0])
    total = 0
    for val, name in res:
        nbytes = val.size * val.dtype.itemsize
        total += nbytes
        key = (tuple(val.shape), str(val.dtype))
        by_shape[key][0] += 1
        by_shape[key][1] += nbytes
    print(f"== mode={mode}  total residual bytes: {total/2**20:.1f} MiB "
          f"({len(res)} tensors)")
    for (shape, dt), (cnt, nb) in sorted(
        by_shape.items(), key=lambda kv: -kv[1][1]
    )[:14]:
        print(f"   {cnt:4d} x {str(shape):28s} {dt:9s} {nb/2**20:8.1f} MiB")
    return total


if __name__ == "__main__":
    modes = sys.argv[1:] or ["plain", "remat", "reversible"]
    totals = {m: residual_report(m) for m in modes}
    base = totals.get("plain")
    if base:
        for m, t in totals.items():
            print(f"{m:11s} {t/2**20:9.1f} MiB  ({t/base:.2f}x plain)")
