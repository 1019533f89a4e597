#!/usr/bin/env python
"""North-star benchmark (BASELINE.json): U-Net forward throughput on
LIDC-shaped 128x128 single-channel batches, images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured/10_000 (the >=10k img/s/chip target — the reference
publishes no throughput numbers, SURVEY.md §6).

Methodology: the forward pass is reduced to a scalar inside jit and the
scalar is fetched each call — through the remote-TPU tunnel used here,
``block_until_ready`` acks dispatch without completion, so only a value
readback actually fences execution. Calls are pipelined (enqueue all, then
fetch) so tunnel round-trip latency doesn't pollute the device number.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def measure_unet_fwd(batch: int = 512, n_iters: int = 16) -> float:
    """Steady-state device throughput: n_iters distinct batches fed through
    an in-program scan (the steady state of a pipelined input feed), timed
    over repeated fully-fenced calls."""
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

    float(fwd_many(variables, xs))  # compile
    float(fwd_many(variables, xs))  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_many(variables, xs))  # value fetch fences execution
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch * n_iters / dt


def main() -> None:
    images_per_sec = measure_unet_fwd()
    print(
        json.dumps(
            {
                "metric": "unet_fwd_lidc128_images_per_sec_per_chip",
                "value": round(images_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
