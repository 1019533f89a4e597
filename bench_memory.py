#!/usr/bin/env python
"""Memory benchmark: PHiSeg vs RevPHiSeg train-step peak memory.

Measures the reference's headline axis — reversible-block memory savings
(reference README.md:4-6, RevPHiSeg MICCAI-UNSURE 2020: "up to 30%") — on
TPU, using XLA's compile-time memory analysis of the FULL jitted train
step (augment + fwd + loss + bwd + Adam), LIDC 128x128 config at the
paper's batch sizes.

MEASURED FINDINGS (round 1, TPU v5e, LIDC 128x128 f32):

* "remat" (per-conv-sequence jax.checkpoint, identical parameters to
  plain) saves 33-35% peak train-step memory at the paper's batch sizes —
  REPRODUCING AND EXCEEDING the reference's 30% headline with the
  XLA-idiomatic mechanism.
* "reversible" (the literal revtorch design: additive-coupling blocks with
  custom_vjp inverse reconstruction — a DIFFERENT architecture, as in
  RevPHiSeg) measures ~1.4x MORE peak memory than plain at full-model
  scale, even though isolated reversible blocks measure at 0.7-0.9x:
  its residuals/backward are opaque to XLA, which already remats the
  plain path at fusion level. The torch-era claim assumes a baseline with
  no compiler rematerialization.
"""

from __future__ import annotations

import json

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
