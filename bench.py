#!/usr/bin/env python
"""North-star benchmark (BASELINE.json): U-Net forward throughput on
LIDC-shaped 128x128 single-channel batches, images/sec/chip.

Prints the north-star JSON line {"metric", "value", "unit", "vs_baseline"}
IMMEDIATELY after the first measurement (flushed — a driver timeout during
the extras still leaves a parseable record; round-3's rc=124 left none),
then re-prints a superset line with the extra metrics at the end. Extras
run under a wall-clock budget (``BENCH_BUDGET_S``, default 900 s measured
from process start): any extra not yet started when the budget is spent is
recorded as "skipped_budget" instead of risking the driver window.
vs_baseline is measured/10_000 (the >=10k img/s/chip target — the reference
publishes no throughput numbers, SURVEY.md §6).

Methodology: the forward pass is reduced to a scalar inside jit and the
scalar is fetched each call — through the remote-TPU tunnel used here,
``block_until_ready`` acks dispatch without completion, so only a value
readback actually fences execution. Calls are pipelined (enqueue all, then
fetch) so tunnel round-trip latency doesn't pollute the device number.
Compiled programs are persisted in a JAX compilation cache
(``~/.cache/unet_zoo_tpu/jax``, the CLI default — /tmp is wiped between
driver sessions) so repeat invocations skip the 1–17-min remote compiles
entirely.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_T_START = time.time()


def _watchdog_parent() -> int:
    """Hang insurance (round-3 failure mode: rc=124, parsed=null). The axon
    TPU platform hangs indefinitely inside ``jax.devices()`` when the remote
    tunnel is down (CLAUDE.md environment notes) — and a hung bench prints
    NOTHING, erasing the round's perf record. This jax-free parent re-execs
    bench.py as a child (BENCH_CHILD=1), relays its stdout line-by-line, and
    if no JSON line has appeared after ``BENCH_INSURANCE_S`` (default 600 s
    — enough for a loaded single-core host + jax import + a cached compile,
    NOT enough for a cold 17-min remote compile, which still prints its real
    line later) emits a value-null marker line so even a driver kill during
    a backend hang leaves a parseable record. Real measurement lines are
    always printed AFTER the marker, so last-JSON-line parsers see real
    numbers whenever any exist."""
    insurance_s = float(os.environ.get("BENCH_INSURANCE_S", "600"))
    hard_cap_s = float(os.environ.get("BENCH_HARD_CAP_S", "3400"))
    env = dict(os.environ, BENCH_CHILD="1")
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        stdout=subprocess.PIPE, text=True, env=env, bufsize=1,
    )
    saw_json = False
    insured = False

    import threading

    def _insure():
        nonlocal insured
        if not saw_json:
            insured = True
            print(
                json.dumps(
                    {
                        "metric": "unet_fwd_lidc128_images_per_sec_per_chip",
                        "value": None,
                        "unit": "images/sec/chip",
                        "vs_baseline": None,
                        "error": f"no measurement after {insurance_s:.0f}s "
                                 "(backend hang or cold compile; real line "
                                 "follows if/when ready)",
                    }
                ),
                flush=True,
            )

    timer = threading.Timer(insurance_s, _insure)
    timer.daemon = True
    timer.start()
    killer = threading.Timer(hard_cap_s, child.kill)
    killer.daemon = True
    killer.start()
    assert child.stdout is not None
    for line in child.stdout:
        if line.lstrip().startswith("{"):
            saw_json = True
            timer.cancel()
        print(line, end="", flush=True)
    rc = child.wait()
    timer.cancel()
    killer.cancel()
    return 0 if (saw_json or insured) else rc


if __name__ == "__main__" and os.environ.get("BENCH_CHILD") != "1":
    sys.exit(_watchdog_parent())

import jax
import jax.numpy as jnp

# Persistent cache (same default as the CLI, experiments/config.py): /tmp is
# wiped between driver sessions, which made every driver run pay the full
# 1-17-min remote cold compiles and starve the extras (round-4 VERDICT #3).
_CACHE_DIR = os.path.expanduser("~/.cache/unet_zoo_tpu/jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# v5e peak dense bf16 throughput (the BASELINE.json target hardware);
# MFU figures below are achieved-FLOPs / this peak (round-2 VERDICT Weak
# #5: "publish the denominator").
PEAK_BF16_FLOPS = 197e12


def _program_flops(compiled, scan_iters: int = 1) -> float | None:
    """Total FLOPs of a compiled XLA program via the compiler's own cost
    model (verified against 2*M*N*K on a plain matmul on this backend).

    ``scan_iters``: XLA's cost analysis counts a while-loop (lax.scan) BODY
    ONCE, not times the trip count — verified here by the fwd numbers
    (0.012 reported * 32 scan iters = the 38% MFU the per-image FLOP count
    predicts). Pass the scan length to restore the true total."""
    try:
        ca = compiled.cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(d.get("flops", 0.0))
        return flops * scan_iters if flops > 0 else None
    except Exception:
        return None


def measure_unet_fwd(batch: int = 512, n_iters: int = 32) -> tuple:
    """Steady-state device throughput: n_iters distinct batches fed through
    an in-program scan (the steady state of a pipelined input feed), timed
    over repeated fully-fenced calls.

    PROTOCOL NOTE: n_iters was 16 in round 1 and is 32 since round 2; a
    longer in-program steady state amortizes the per-call fence more, so
    the round-1 number (10.2k) and round>=2 numbers are not same-protocol.
    All round>=2 numbers use n_iters=32 — keep it fixed for regression
    comparisons (tools/bench_protocol.py measures both for the record)."""
    from unet_zoo_tpu.models.registry import get_model

    model = get_model(
        "unet",
        num_classes=2,
        num_filters=(32, 64, 128, 192),
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (n_iters, batch, 128, 128, 1), jnp.float32)
    variables = model.init({"params": key}, xs[0], train=False)

    @jax.jit
    def fwd_many(v, xs):
        def body(acc, x):
            logits = model.apply(v, x, train=False)
            return acc + jnp.sum(logits.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc

    compiled = fwd_many.lower(variables, xs).compile()
    flops = _program_flops(compiled, scan_iters=n_iters)
    float(fwd_many(variables, xs))  # compile cache warm
    float(fwd_many(variables, xs))  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_many(variables, xs))  # value fetch fences execution
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mfu = (flops / dt) / PEAK_BF16_FLOPS if flops else None
    return batch * n_iters / dt, mfu


def _bench_cfg(model_name: str, batch: int, augment: str = "device"):
    from unet_zoo_tpu.data.augment import AugmentOptions
    from unet_zoo_tpu.experiments import ExperimentConfig

    return ExperimentConfig(
        experiment_name=f"bench_{model_name}_{batch}_{augment}",
        model=model_name,
        filter_channels=(32, 64, 128, 192)
        if model_name == "unet"
        else (32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=2,
        batch_size=batch,
        image_size=(128, 128),
        dtype="bfloat16",
        augment_on=augment,
        augmentation_options=AugmentOptions(
            do_rotations=True, do_scaleaug=True, do_fliplr=True,
            do_flipud=True, nlabels=2,
        ),
    )


def measure_train_step(
    model_name: str, batch: int, n_iters: int = 8
) -> tuple[float, float | None]:
    """Full jitted train step (device aug + fwd + loss + bwd + Adam +
    plateau-LR) images/sec, scan-pipelined and fenced by value readback.
    Also returns the step program's MFU (XLA cost-model FLOPs / time /
    v5e bf16 peak)."""
    import numpy as np

    from unet_zoo_tpu.training import Trainer

    cfg = _bench_cfg(model_name, batch, augment="device")
    tr = Trainer(cfg, log_dir="/tmp/bench", tensorboard=False)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((n_iters, batch, 128, 128, 1)), jnp.float32
    )
    ys = jnp.asarray(rng.integers(0, 2, (n_iters, batch, 128, 128)), jnp.int32)

    @jax.jit
    def run(state, xs, ys):
        def body(s, xy):
            s, aux = tr._step_fn(s, xy[0], xy[1])
            return s, aux["loss"]

        s, losses = jax.lax.scan(body, state, (xs, ys))
        return s, jnp.sum(losses)

    flops = _program_flops(run.lower(tr.state, xs, ys).compile(), scan_iters=n_iters)
    s, l0 = run(tr.state, xs, ys)
    float(l0)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, l = run(s, xs, ys)
        float(l)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mfu = (flops / dt) / PEAK_BF16_FLOPS if flops else None
    return batch * n_iters / dt, mfu


def measure_train_step_host_aug(
    model_name: str, batch: int, n_iters: int = 32
) -> float:
    """REAL training cadence with host-side augmentation: the Trainer's own
    prefetching cv2 chain feeds per-step dispatches (no scan — host aug
    can't live inside jit), steps are enqueued without fencing (the remote
    tunnel acks dispatch immediately) and the final loss readback fences.
    This is the round-3 alternative to the device-aug path (VERDICT #4:
    device gathers cost ~35 ms/step at bs64). The provider is the REAL
    h5py BatchProvider over an on-disk LIDC-schema cache — the number
    includes the blocking HDF5 read cost real training pays (round-3
    VERDICT Weak #5: the old in-memory stand-in flattered the host path)."""
    import h5py
    import numpy as np

    from unet_zoo_tpu.data.augment_host import PrefetchingLoader
    from unet_zoo_tpu.data.lidc import LIDCData
    from unet_zoo_tpu.data.synthetic import make_lidc_cache
    from unet_zoo_tpu.training import Trainer

    cfg = _bench_cfg(model_name, batch, augment="host")
    tr = Trainer(cfg, log_dir="/tmp/bench", tensorboard=False)

    cache = "/tmp/bench/bench_lidc128.hdf5"
    if not os.path.exists(cache):
        os.makedirs("/tmp/bench", exist_ok=True)
        make_lidc_cache(cache, num_per_split=(256, 2, 2), size=128)
    data = LIDCData(h5py.File(cache, "r"), seed=0)
    loader = PrefetchingLoader(
        data.train, batch, opts=cfg.augmentation_options,
        rng=np.random.default_rng(0),
    )
    try:
        state = tr.state
        x, y = loader.next_batch(batch)
        state, aux = tr._train_step(state, jnp.asarray(x), jnp.asarray(y))
        float(aux["loss"])  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                x, y = loader.next_batch(batch)
                state, aux = tr._train_step(
                    state, jnp.asarray(x), jnp.asarray(y)
                )
            float(aux["loss"])  # fence the whole pipelined run
            times.append(time.perf_counter() - t0)
        return batch * n_iters / min(times)
    finally:
        loader.close()


def measure_eval100_ms(samples: int = 100) -> float:
    """Reference quantitative protocol (train_model.py:364-366,446-447):
    N posterior samples + GED/variance-NCC/Dice, all on device; ms/image."""
    from unet_zoo_tpu.experiments import get_experiment
    from unet_zoo_tpu.training import Trainer

    cfg = get_experiment("phiseg_7_5_12")
    tr = Trainer(cfg, log_dir="/tmp/bench", tensorboard=False)
    eval_fn = tr._eval_image_fn(samples)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 128, 128, 1), jnp.float32)
    y_all = jax.random.randint(key, (4, 128, 128), 0, 2, jnp.int32)
    y_c = y_all[:1]
    variables = jax.device_put(tr.state.variables)
    out = eval_fn(variables, x, y_all, y_c, key)
    float(out["ged"])
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = eval_fn(variables, x, y_all, y_c, jax.random.fold_in(key, i))
        float(out["ged"])
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def main() -> None:
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    images_per_sec, fwd_mfu = measure_unet_fwd()
    north_star = {
        "metric": "unet_fwd_lidc128_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 10_000.0, 3),
    }
    # The driver's record of the round: print NOW, before any extra can eat
    # the timeout window (round-3 lesson: rc=124 left parsed=null).
    print(json.dumps(north_star), flush=True)

    extras = {}
    if fwd_mfu is not None:
        extras["unet_fwd_mfu"] = round(fwd_mfu, 3)

    def _train(model, bs):
        img_s, mfu = measure_train_step(model, bs)
        out = {f"{model}_train_bs{bs}_img_s": round(img_s, 1)}
        if mfu is not None:
            out[f"{model}_train_bs{bs}_mfu"] = round(mfu, 3)
        return out

    # Ordered most-important-first: when the budget bites, the starred
    # regression guards (train steps, 100-sample eval — r02 record 69.7 ms)
    # must die LAST (round-4 VERDICT #3: hostaug starved eval100 twice).
    for name, fn in (
        ("unet_train_bs64", lambda: _train("unet", 64)),
        ("phiseg_train_bs12", lambda: _train("phiseg", 12)),
        (
            "phiseg_eval100_ms_per_image",
            lambda: {
                "phiseg_eval100_ms_per_image": round(measure_eval100_ms(100), 1)
            },
        ),
        (
            "unet_train_bs64_hostaug_img_s",
            lambda: {
                "unet_train_bs64_hostaug_img_s": round(
                    measure_train_step_host_aug("unet", 64), 1
                )
            },
        ),
    ):
        if time.time() - _T_START > budget_s:
            extras[name] = "skipped_budget"
            continue
        try:
            extras.update(fn())
        except Exception as e:  # the north-star line must survive any extra
            extras[name] = f"error: {str(e).splitlines()[0][:80]}"
    # Superset line: drivers that parse the LAST JSON line get everything;
    # a timeout mid-extras leaves the north-star line above as the record.
    print(json.dumps({**north_star, **extras}), flush=True)


if __name__ == "__main__":
    main()
