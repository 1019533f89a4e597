"""Per-op time breakdown of the full jitted train step on the real chip.

Captures a jax.profiler trace around a few train steps (the same program
`bench.py measure_train_step` times), then parses the TensorBoard trace
events for device-side op durations, grouped by fusion/op name prefix.
Answers "where do the 39 ms of a bs64 UNet train step go" — augmentation
warp, fwd convs, bwd convs, Adam, or dispatch gaps.

Usage:  python tools/profile_train.py [--model unet] [--batch 64]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import time

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(model: str, batch: int, n_iters: int, log_dir: str) -> None:
    from bench import _bench_cfg
    from unet_zoo_tpu.training import Trainer

    cfg = _bench_cfg(model, batch, augment="device")
    tr = Trainer(cfg, log_dir="/tmp/bench_prof", tensorboard=False)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((n_iters, batch, *cfg.image_size, 1)), jnp.float32
    )
    ys = jnp.asarray(rng.integers(0, 2, (n_iters, batch, *cfg.image_size)), jnp.int32)

    def body(state, xy):
        x, y = xy
        state, aux = tr._step_fn(state, x, y)
        return state, aux["loss"]

    @jax.jit
    def run(state, xs, ys):
        s, losses = jax.lax.scan(body, state, (xs, ys))
        return s, jnp.sum(losses)

    s, l0 = run(tr.state, xs, ys)
    float(l0)  # compile + warm
    jax.profiler.start_trace(log_dir)
    s, l = run(s, xs, ys)
    float(l)
    jax.profiler.stop_trace()


def parse(log_dir: str, n_iters: int) -> dict:
    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {log_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device-side complete events live under TPU pids; host threads have
    # python/TSL names. Identify device lanes by process name.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_name.items() if "TPU" in n or "/device:" in n
    }

    groups: dict[str, float] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        # bucket by op family
        base = re.sub(r"[.\d]+$", "", name.split("/")[-1])
        groups[base] = groups.get(base, 0.0) + dur
    top = sorted(groups.items(), key=lambda kv: -kv[1])[:25]
    return {
        "trace": path,
        "device_total_ms": round(total, 2),
        "per_step_ms": round(total / n_iters, 3),
        "top_ops_ms": {k: round(v, 2) for k, v in top},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--log-dir", default="/tmp/prof_train")
    args = ap.parse_args()
    t0 = time.time()
    capture(args.model, args.batch, args.iters, args.log_dir)
    out = parse(args.log_dir, args.iters)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
