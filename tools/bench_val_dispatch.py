"""Measure the validation-loop dispatch pipelining win on the real chip.

Round-5 change (VERDICT r4 #6): Trainer.validate()/test() used to
``jax.device_get`` each per-image eval program synchronously — through the
remote-TPU tunnel used here that is 2xRTT (~52 ms) of pure latency per
image on top of device time. The loop now enqueues every program and
fetches once. This tool times ``Trainer.validate()`` both ways on the same
trainer/data (the "sync" mode wraps the cached eval_fn with an immediate
device_get, reproducing the old behavior exactly — device_get on the
already-fetched numpy results is then a no-op), and asserts the metrics are
IDENTICAL (same programs, same inputs; only the fetch schedule changes).

Usage: python tools/bench_val_dispatch.py  (real TPU; one JSON line out)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/unet_zoo_tpu/jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    from unet_zoo_tpu.data import synthetic
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    tmp = tempfile.mkdtemp()
    data = synthetic.synthetic_lidc(tmp, num_per_split=(8, 32, 2), size=128)
    cfg = ExperimentConfig(
        experiment_name="val_dispatch_bench",
        model="phiseg",
        filter_channels=(32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=2,
        batch_size=8,
        image_size=(128, 128),
        validation_samples=4,
        num_validation_images=32,
    )
    tr = Trainer(cfg, log_dir=tempfile.mkdtemp())

    def run(mode: str) -> tuple[float, dict]:
        tr._val_cache.clear()
        # warm: compile + one full pass so both modes time steady state
        tr.validate(data)
        if mode == "sync":
            key = ("eval", cfg.validation_samples, cfg.validation_samples)
            orig = tr._val_cache[key]
            tr._val_cache[key] = lambda *a: jax.device_get(orig(*a))
        t0 = time.perf_counter()
        agg = tr.validate(data)
        dt = time.perf_counter() - t0
        if mode == "sync":
            tr._val_cache[key] = orig
        return dt, agg

    t_pipe, agg_pipe = run("pipe")
    t_sync, agg_sync = run("sync")
    for k in agg_pipe:
        assert agg_pipe[k] == agg_sync[k], (k, agg_pipe[k], agg_sync[k])
    print(
        json.dumps(
            {
                "metric": "validate32_wall_s",
                "sync_per_image_fetch_s": round(t_sync, 2),
                "pipelined_s": round(t_pipe, 2),
                "speedup": round(t_sync / t_pipe, 2),
                "n_images": 32,
                "metrics_identical": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
