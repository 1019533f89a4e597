#!/usr/bin/env python
"""XLA-vs-Pallas timing for the fused 3-conv chain (ops/pallas/conv_chain).

Decides VERDICT r1 item #4: the Pallas kernel must demonstrably win
somewhere to stay wired; this prints one JSON line per U-Net block shape
(north-star bench config: bs512 bf16 128x128 LIDC) with both times.

Run on the real TPU (one job at a time — remote compiles serialize).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, *args, iters: int = 8) -> float:
    """Median seconds per call; value readback fences the remote TPU."""
    out = fn(*args)
    jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready()
    float(jnp.sum(out))  # fence via readback
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_block(B: int, H: int, cin: int, cmid: int, dtype=jnp.bfloat16):
    from unet_zoo_tpu.ops.pallas.conv_chain import fused_conv_chain

    key = jax.random.PRNGKey(0)
    ks = [
        jax.random.normal(key, (3, 3, cin, cmid), jnp.float32) * 0.1,
        jax.random.normal(key, (3, 3, cmid, cmid), jnp.float32) * 0.1,
        jax.random.normal(key, (3, 3, cmid, cmid), jnp.float32) * 0.1,
    ]
    bs = [jnp.zeros((k.shape[-1],), jnp.float32) for k in ks]
    x = jax.random.normal(key, (B, H, H, cin), dtype)

    @jax.jit
    def xla_chain(x, ks, bs):
        y = x
        for k, b in zip(ks, bs):
            y = jax.lax.conv_general_dilated(
                y, k.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jax.nn.relu(y.astype(jnp.float32) + b).astype(y.dtype)
        return y

    t_xla = _time_fn(xla_chain, x, ks, bs)
    t_pl = _time_fn(fused_conv_chain, x, ks, bs)
    # numerics check
    a = np.asarray(xla_chain(x, ks, bs), np.float32)
    b = np.asarray(fused_conv_chain(x, ks, bs), np.float32)
    err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6))
    print(json.dumps({
        "metric": "conv_chain_xla_vs_pallas",
        "shape": f"{B}x{H}x{H}x{cin}->{cmid}",
        "xla_ms": round(t_xla * 1e3, 2),
        "pallas_ms": round(t_pl * 1e3, 2),
        "speedup": round(t_xla / t_pl, 3),
        "rel_err": err,
    }), flush=True)


if __name__ == "__main__":
    B = 512
    for (H, cin, cmid) in [(128, 1, 32), (64, 32, 64), (32, 64, 128),
                           (16, 128, 192), (32, 192 + 128, 128),
                           (64, 128 + 64, 64), (128, 64 + 32, 32)]:
        try:
            bench_block(B, H, cin, cmid)
        except Exception as e:  # e.g. scoped-vmem OOM at large blocks
            print(json.dumps({
                "metric": "conv_chain_xla_vs_pallas",
                "shape": f"{B}x{H}x{H}x{cin}->{cmid}",
                "error": str(e).split("\n")[0][:160],
            }), flush=True)
