#!/usr/bin/env python
"""Memory benchmark: PHiSeg vs RevPHiSeg train-step peak memory.

Measures the reference's headline axis — reversible-block memory savings
(reference README.md:4-6, RevPHiSeg MICCAI-UNSURE 2020: "up to 30%") — on
TPU, using XLA's compile-time memory analysis of the FULL jitted train
step (augment + fwd + loss + bwd + Adam), LIDC 128x128 config at the
paper's batch sizes.

MEASURED FINDINGS (round 2, TPU v5e, LIDC 128x128 f32, peak = temp+args):

| mode       | bs12 MiB | savings | bs24 MiB | savings |
|------------|----------|---------|----------|---------|
| plain      |   3120.4 |       — |   4471.3 |       — |
| remat      |   1939.2 |   37.9% |   2675.9 |   40.2% |
| reversible |   1828.1 |   41.4% |   2901.2 |   35.1% |

Both mechanisms exceed the reference's 30% headline; "reversible" (the
literal revtorch design: additive-coupling blocks with custom_vjp inverse
reconstruction) beats remat at the paper's canonical bs12.

Round-1 measured reversible at ~1.4x MORE than plain; two fixes turned
that into 41% savings (ops/reversible.py):
* the coupling chain is a lax.scan over depth-stacked params — the
  unrolled loop let XLA hoist several blocks' backward residuals into one
  live set;
* all long-lived values (carries, custom_vjp residuals) are flat rank-1
  buffers — C/2-channel NHWC tensors otherwise materialize with the
  channel dim padded to 128 vector lanes (8x inflation at C/2=16).
"""

from __future__ import annotations

import json

import os

# persistent XLA compile cache (remote TPU compiles run 1-17 min; the
# content-addressed cache makes repeat invocations skip them; env form so
# subprocess children inherit it)
os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def step_memory_bytes(reversible_mode: str, batch: int) -> int:
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    cfg = ExperimentConfig(
        experiment_name=f"mem_{reversible_mode}_{batch}",
        model="phiseg",
        filter_channels=(32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=2,
        batch_size=batch,
        image_size=(128, 128),
        reversible_mode=reversible_mode,
        dtype="float32",  # the reference trains f32; keep comparison faithful
    )
    tr = Trainer(cfg, log_dir="/tmp/membench", tensorboard=False)
    x = jnp.zeros((batch, 128, 128, 1), jnp.float32)
    y = jnp.zeros((batch, 128, 128), jnp.int32)
    lowered = jax.jit(tr._step_fn, donate_argnums=0).lower(tr.state, x, y)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    # peak device footprint of a step: live args (params/opt state; donated
    # so counted once) + temps; outputs alias donated inputs.
    return int(m.temp_size_in_bytes + m.argument_size_in_bytes)


def main() -> None:
    results = {}
    batches = [12, 24]
    for mode in ("plain", "remat", "reversible"):
        for batch in batches:
            b = step_memory_bytes(mode, batch)
            results[(mode, batch)] = b
            print(
                json.dumps(
                    {
                        "metric": f"phiseg_{mode}_train_step_peak_bytes",
                        "batch": batch,
                        "value": b,
                        "unit": "bytes",
                        "MiB": round(b / 2**20, 1),
                    }
                ),
                flush=True,
            )
    for mode in ("remat", "reversible"):
        for batch in batches:
            plain = results[("plain", batch)]
            print(
                json.dumps(
                    {
                        "metric": f"{mode}_memory_savings_vs_plain",
                        "batch": batch,
                        "value": round(1.0 - results[(mode, batch)] / plain, 4),
                        "unit": "fraction",
                        "reference_claim": 0.30,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
