#!/usr/bin/env python
"""Extended benchmark suite (one JSON line per metric).

Covers the protocols the reference actually exercises (SURVEY.md §6):
* unet_fwd            — the north-star forward throughput (same as bench.py)
* unet_train_step     — full jitted train step (aug+fwd+loss+bwd+adam+sched)
* phiseg_train_step   — flagship model train step, reference batch 12 config
* phiseg_val_image    — 16-posterior-sample validation incl. on-device
                        GED/variance-NCC/Dice (reference train_model.py:138-275
                        does this on CPU via medpy)
* h5py/native_loader  — host-side input pipeline A/B on the same HDF5
                        cache: reference-style blocking h5py reads vs the
                        C++ mmap store's prefetching gather

Run: python bench_all.py [--quick]
"""

from __future__ import annotations

import json
import time

import os

# persistent XLA compile cache (remote TPU compiles run 1-17 min; the
# content-addressed cache makes repeat invocations skip them; env form so
# subprocess children inherit it)
os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def emit(metric, value, unit, target=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if target:
        rec["vs_baseline"] = round(value / target, 3)
    print(json.dumps(rec), flush=True)


def _scan_time(fn, state, xs, ys, n_runs=3):
    @jax.jit
    def run(state, xs, ys):
        def body(s, xy):
            s, aux = fn(s, xy[0], xy[1])
            return s, aux["loss"]

        s, losses = jax.lax.scan(body, state, (xs, ys))
        return s, jnp.sum(losses)

    s, l0 = run(state, xs, ys)
    float(l0)
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        s, l = run(s, xs, ys)
        float(l)
        times.append(time.perf_counter() - t0)
    return min(times) / xs.shape[0]


def bench_train_step(model_name: str, batch: int, n_iters: int = 8):
    from unet_zoo_tpu.data.augment import AugmentOptions
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    cfg = ExperimentConfig(
        experiment_name=f"bench_{model_name}_{batch}",
        model=model_name,
        filter_channels=(32, 64, 128, 192)
        if model_name == "unet"
        else (32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=2,
        batch_size=batch,
        image_size=(128, 128),
        dtype="bfloat16",
        augmentation_options=AugmentOptions(
            do_rotations=True, do_scaleaug=True, do_fliplr=True,
            do_flipud=True, nlabels=2,
        ),
    )
    tr = Trainer(cfg, log_dir="/tmp/bench_all", tensorboard=False)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((n_iters, batch, 128, 128, 1)), jnp.float32
    )
    ys = jnp.asarray(rng.integers(0, 2, (n_iters, batch, 128, 128)), jnp.int32)
    dt = _scan_time(tr._step_fn, tr.state, xs, ys)
    return batch / dt


def bench_phiseg_val(samples: int = 16):
    from unet_zoo_tpu.experiments import get_experiment
    from unet_zoo_tpu.training import Trainer

    cfg = get_experiment("phiseg_7_5_12")
    tr = Trainer(cfg, log_dir="/tmp/bench_all", tensorboard=False)
    eval_fn = tr._eval_image_fn(samples)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 1)), jnp.float32)
    y_all = jnp.asarray(rng.integers(0, 2, (4, 128, 128)), jnp.int32)
    y_c = jnp.asarray(rng.integers(0, 2, (1, 128, 128)), jnp.int32)
    variables = jax.device_put(tr.state.variables)
    key = jax.random.PRNGKey(0)
    out = eval_fn(variables, x, y_all, y_c, key)
    float(out["ged"])
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = eval_fn(variables, x, y_all, y_c, jax.random.fold_in(key, i))
        float(out["ged"])
        times.append(time.perf_counter() - t0)
    return 1.0 / min(times)


def bench_loaders_hdf5(n: int = 2000, B: int = 128):
    """A/B the two train-loader paths on the SAME HDF5 cache (VERDICT r3
    #4: the native store must be refereed on the real data path, not a
    synthetic in-memory provider): LIDC-schema file, h5py BatchProvider
    (the reference's blocking fancy-index read,
    /root/reference/data/batch_provider.py:58-59) vs loader='native'
    (C++ mmap store, thread-pool gather, one batch prefetched ahead).
    Returns (h5py images/sec, native images/sec)."""
    import os
    import tempfile

    import h5py

    from unet_zoo_tpu.data.lidc import LIDCData
    from unet_zoo_tpu.data.synthetic import make_lidc_cache

    tmp = tempfile.mkdtemp()
    cache = os.path.join(tmp, "data_lidc.hdf5")
    make_lidc_cache(cache, num_per_split=(n, 2, 2), size=128)

    def run(loader):
        d = LIDCData(
            h5py.File(cache, "r"), seed=0, loader=loader,
            batch_size=B if loader == "native" else None,
        )
        try:
            for _ in range(3):
                d.train.next_batch(B)
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                d.train.next_batch(B)
            return B * iters / (time.perf_counter() - t0)
        finally:
            if loader == "native":
                d.train.close()

    return run("h5py"), run("native")


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="skip the slow benches")
    args = p.parse_args()

    from bench import measure_eval100_ms, measure_unet_fwd

    fwd_img_s, fwd_mfu = measure_unet_fwd()
    emit("unet_fwd_lidc128", fwd_img_s, "images/sec/chip", target=10_000)
    if fwd_mfu is not None:
        emit("unet_fwd_mfu", round(fwd_mfu, 3), "fraction of v5e bf16 peak")
    emit("unet_train_step_bs64", bench_train_step("unet", 64), "images/sec/chip")
    emit("phiseg_train_step_bs12", bench_train_step("phiseg", 12), "images/sec/chip")
    if not args.quick:
        emit(
            "phiseg_val_16samples_ged_ncc_dice",
            bench_phiseg_val(16),
            "images/sec (full metric suite)",
        )
        emit(
            "phiseg_eval_100samples_full_metrics",
            measure_eval100_ms(100),
            "ms/image (reference protocol, train_model.py:364-366)",
        )
    h5_ips, nat_ips = bench_loaders_hdf5()
    emit("h5py_loader_host", h5_ips, "images/sec host-side (same HDF5)")
    emit("native_loader_host", nat_ips, "images/sec host-side (same HDF5)")


if __name__ == "__main__":
    main()
