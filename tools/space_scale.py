#!/usr/bin/env python
"""Spatial sharding at scale (VERDICT r1 #7).

Two measurement modes:

* ``--device tpu`` (default): the big-image configs on the real chip,
  space=1 — does the step fit, and how long does it take?
    - PHiSeg 512² (reference phiseg_uzh_rev_7_5_512.py:30-31 scale)
    - PHiSeg3D 128³ BraTS (reference phiseg_brats.py:30-31)
* ``--device cpu``: per-device XLA memory analysis of the SPMD train step
  on a virtual 8-device mesh at space=1/2/4 — what spatial sharding buys
  in per-chip peak memory (run with JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8).

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trainer(name: str, mesh=None, batch: int | None = None):
    from unet_zoo_tpu.experiments import get_experiment
    from unet_zoo_tpu.training import Trainer
    import dataclasses

    cfg = get_experiment(name)
    if batch is not None:
        cfg = dataclasses.replace(cfg, batch_size=batch)
    return Trainer(cfg, log_dir="/tmp/space_scale", tensorboard=False), cfg


def data_for(cfg):
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    spatial = tuple(cfg.image_size)
    x = jnp.asarray(
        rng.standard_normal((cfg.batch_size, *spatial, cfg.input_channels)),
        jnp.float32,
    )
    if cfg.model == "phiseg3d" and cfg.n_classes == 3:  # BraTS one-hot WT/TC/ET
        y = jnp.asarray(
            rng.integers(0, 2, (cfg.batch_size, *spatial, 3)), jnp.float32
        )
    else:
        y = jnp.asarray(
            rng.integers(0, cfg.n_classes, (cfg.batch_size, *spatial)), jnp.int32
        )
    return x, y


def tpu_step_time(name: str, batch: int | None):
    import jax

    tr, cfg = build_trainer(name, batch=batch)
    x, y = data_for(cfg)
    t0 = time.time()
    tr.state, aux = tr._train_step(tr.state, x, y)
    loss = float(aux["loss"])  # fences compile+run
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tr.state, aux = tr._train_step(tr.state, x, y)
        float(aux["loss"])
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"{name}_train_step",
        "batch": cfg.batch_size,
        "image_size": list(cfg.image_size),
        "step_ms": round(min(times) * 1e3, 1),
        "images_per_sec": round(cfg.batch_size / min(times), 2),
        "compile_s": round(compile_s, 1),
        "loss_finite": loss == loss,
        "device": "tpu",
    }), flush=True)


def cpu_shard_memory(name: str, space: int, batch: int | None, ndev: int = 8):
    """Per-device peak (temp+args) of the SPMD train step on a virtual
    8-device mesh. The compiled SPMD module is per-device, so XLA's
    memory analysis directly reports the per-chip footprint."""
    from unet_zoo_tpu.parallel import make_mesh
    from unet_zoo_tpu.experiments import get_experiment
    from unet_zoo_tpu.training import Trainer
    import dataclasses

    mesh = make_mesh(ndev, space=space)
    cfg = get_experiment(name)
    if batch is not None:
        cfg = dataclasses.replace(cfg, batch_size=batch)
    tr = Trainer(cfg, log_dir="/tmp/space_scale", tensorboard=False, mesh=mesh)
    x, y = data_for(cfg)
    compiled = tr._train_step.lower(tr.state, x, y).compile()
    m = compiled.memory_analysis()
    peak = int(m.temp_size_in_bytes + m.argument_size_in_bytes)
    print(json.dumps({
        "metric": f"{name}_per_device_peak",
        "mesh": {"data": ndev // space, "space": space},
        "batch_global": cfg.batch_size,
        "temp_MiB": round(m.temp_size_in_bytes / 2**20, 1),
        "args_MiB": round(m.argument_size_in_bytes / 2**20, 1),
        "peak_MiB": round(peak / 2**20, 1),
        "device": "cpu-virtual",
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--config", default="phiseg_uzh_rev_7_5_512")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--space", type=int, default=1)
    ap.add_argument("--ndev", type=int, default=8)
    a = ap.parse_args()
    if a.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        cpu_shard_memory(a.config, a.space, a.batch, a.ndev)
    else:
        tpu_step_time(a.config, a.batch)


if __name__ == "__main__":
    main()
