#!/usr/bin/env python
"""Diagnose reversible-mode peak-memory pathology (VERDICT r1 weak #2).

Compares XLA buffer-assignment peaks for the PHiSeg train step across
reversible modes, at an adjustable scale, on whatever backend is active
(CPU for fast iteration, TPU for ground truth).

Usage: JAX_PLATFORMS=cpu python tools/mem_diag.py --filters 8,16,16,16,16,16,16 --batch 4 --size 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def step_memory(mode: str, filters, batch: int, size: int, dtype="float32"):
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    cfg = ExperimentConfig(
        experiment_name=f"diag_{mode}",
        model="phiseg",
        filter_channels=filters,
        latent_levels=5,
        n_classes=2,
        batch_size=batch,
        image_size=(size, size),
        reversible_mode=mode,
        dtype=dtype,
    )
    tr = Trainer(cfg, log_dir="/tmp/memdiag", tensorboard=False)
    x = jnp.zeros((batch, size, size, 1), jnp.float32)
    y = jnp.zeros((batch, size, size), jnp.int32)
    compiled = jax.jit(tr._step_fn, donate_argnums=0).lower(tr.state, x, y).compile()
    m = compiled.memory_analysis()
    return {
        "temp": int(m.temp_size_in_bytes),
        "args": int(m.argument_size_in_bytes),
        "peak": int(m.temp_size_in_bytes + m.argument_size_in_bytes),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filters", default="8,16,16,16,16,16,16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--modes", default="plain,remat,reversible")
    args = ap.parse_args()
    filters = tuple(int(c) for c in args.filters.split(","))

    base = None
    for mode in args.modes.split(","):
        r = step_memory(mode, filters, args.batch, args.size, args.dtype)
        if mode == "plain":
            base = r["peak"]
        r["vs_plain"] = round(r["peak"] / base, 3) if base else None
        print(json.dumps({"mode": mode, **{k: round(v / 2**20, 2) if k in ("temp", "args", "peak") else v for k, v in r.items()}, "unit": "MiB"}), flush=True)


if __name__ == "__main__":
    main()
