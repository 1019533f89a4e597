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


def _phase_of(tf_op: str, src: str) -> str:
    """Classify a device op by its jax name-scope metadata: ``jvp(...)`` is
    the forward trace, ``transpose(jvp(...))`` the backward, the
    augmentation scope the in-step warp, optax the optimizer."""
    if "augment" in tf_op:
        return "aug"
    if "transpose(jvp" in tf_op:
        return "bwd"
    if "jvp(" in tf_op:
        return "fwd"
    if "optax" in src or "adam" in tf_op.lower():
        return "opt"
    return "other"


def parse_phases(log_dir: str, n_iters: int) -> dict:
    """fwd/bwd/aug/opt attribution + the top (phase, source, category)
    rows, with achieved TFLOP/s and GB/s per row (from the profiler's
    XLA cost-model ``model_flops`` and ``bytes_accessed``). This is the
    breakdown that answers VERDICT r4 #6 ("where do the bwd ms go")."""
    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {log_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    pid_name = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {
        p for p, n in pid_name.items() if "TPU" in n or "/device:" in n
    }
    per_phase: dict[str, float] = {}
    per_phase_flops: dict[str, int] = {}
    rows: dict[tuple, list] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {})
        # leaf device ops only — the jit_run/while wrappers double-count
        if "device_duration_ps" not in a or a.get("hlo_category") in (
            None, "while",
        ):
            continue
        dur_ms = int(a["device_duration_ps"]) / 1e9
        ph = _phase_of(a.get("tf_op", ""), a.get("source", ""))
        per_phase[ph] = per_phase.get(ph, 0.0) + dur_ms
        fl = int(a.get("model_flops", 0) or 0)
        per_phase_flops[ph] = per_phase_flops.get(ph, 0) + fl
        key = (ph, a.get("source", "?"), a.get("hlo_category", "?"))
        r = rows.setdefault(key, [0.0, 0, 0])
        r[0] += dur_ms
        r[1] += fl
        r[2] += int(a.get("bytes_accessed", 0) or 0)
    phases = {
        ph: {
            "ms_per_step": round(ms / n_iters, 3),
            "gflop_per_step": round(per_phase_flops[ph] / n_iters / 1e9, 1),
            "tflops_per_sec": round(
                per_phase_flops[ph] / (ms / 1e3) / 1e12, 1
            ) if ms else 0.0,
        }
        for ph, ms in sorted(per_phase.items(), key=lambda kv: -kv[1])
    }
    top = []
    for (ph, src, cat), (ms, fl, by) in sorted(
        rows.items(), key=lambda kv: -kv[1][0]
    )[:20]:
        top.append(
            {
                "ms_per_step": round(ms / n_iters, 3),
                "phase": ph,
                "tflops_per_sec": round(fl / (ms / 1e3) / 1e12, 1) if ms else 0,
                "gb_per_sec": round(by / (ms / 1e3) / 1e9, 1) if ms else 0,
                "category": cat,
                "source": src,
            }
        )
    return {"trace": path, "phases": phases, "top_rows": top}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--log-dir", default="/tmp/prof_train")
    ap.add_argument(
        "--parse-only", action="store_true",
        help="re-parse an existing trace (no TPU capture)",
    )
    args = ap.parse_args()
    t0 = time.time()
    if not args.parse_only:
        capture(args.model, args.batch, args.iters, args.log_dir)
    out = parse(args.log_dir, args.iters)
    out.update(parse_phases(args.log_dir, args.iters))
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
