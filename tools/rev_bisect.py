#!/usr/bin/env python
"""Locate the reversible-mode memory blowup by component (VERDICT r1 #3).

Measures XLA peak (temp+args) for grad of isolated PHiSeg sub-structures at
full scale (bs12, 128², f32), plain vs reversible, using the real building
blocks (models/blocks.py, models/phiseg.py internals).

Usage: python tools/rev_bisect.py --scenario down --mode reversible
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

FILTERS = (32, 64, 128, 192, 192, 192, 192)


class DownStack(nn.Module):
    """Posterior/prior contracting path shape: 7 PhiDownBlocks."""

    mode: str

    @nn.compact
    def __call__(self, x, train=True):
        from unet_zoo_tpu.models.blocks import PhiDownBlock

        acc = 0.0
        for i, f in enumerate(FILTERS):
            x = PhiDownBlock(
                f, pool=i > 0, depth=3, reversible_mode=self.mode,
                rev_depth=3, name=f"down{i}",
            )(x, train=train)
            acc = acc + jnp.sum(x.astype(jnp.float32))
        return acc


class LikStack(nn.Module):
    """Likelihood shape: per-level 2ch z -> embed -> increase_resolution,
    then top-down concat-refine, heads to full res (phiseg.py:197-309)."""

    mode: str
    latent_levels: int = 5
    lvl_diff: int = 2

    @nn.compact
    def __call__(self, z_list, train=True):
        from unet_zoo_tpu import ops
        from unet_zoo_tpu.ops import conv_sequence

        post = []
        for i, z in enumerate(z_list):  # i = latent level (0 finest)
            if self.mode == "reversible":
                h = ops.ReversibleSequence(
                    FILTERS[i], depth=2, mode="reversible", name=f"emb{i}"
                )(z, train=train)
            else:
                h = conv_sequence(
                    FILTERS[i], 2, mode=self.mode, name=f"emb{i}"
                )(z, train)
            for j in range(self.lvl_diff):  # upsample+conv, never reversible
                h = ops.upsample_linear(h, scale=2, align_corners=True)
                h = conv_sequence(
                    FILTERS[i], 1, mode="plain", name=f"ups{i}_{j}"
                )(h, train)
            post.append(h)
        c = post[-1]
        for i in reversed(range(self.latent_levels - 1)):
            up = ops.upsample_linear(c, scale=2, align_corners=True)
            cat = jnp.concatenate([post[i], up], axis=-1)
            if self.mode == "reversible":
                c = ops.ReversibleSequence(
                    FILTERS[i + self.lvl_diff], depth=2, mode="reversible",
                    name=f"postc{i}",
                )(cat, train=train)
            else:
                c = conv_sequence(
                    FILTERS[i + self.lvl_diff], 2, mode=self.mode,
                    name=f"postc{i}",
                )(cat, train)
        return jnp.sum(c.astype(jnp.float32))


class OneSeq(nn.Module):
    """A single sequence at a fixed channel width (in_ch set by the input)."""

    mode: str
    features: int = 32
    depth: int = 3

    @nn.compact
    def __call__(self, x, train=True):
        from unet_zoo_tpu import ops
        from unet_zoo_tpu.ops import conv_sequence

        if self.mode == "reversible":
            y = ops.ReversibleSequence(
                self.features, depth=self.depth, mode="reversible", name="s"
            )(x, train=train)
        else:
            y = conv_sequence(
                self.features, self.depth, mode=self.mode, name="s"
            )(x, train)
        return jnp.sum(y.astype(jnp.float32))


def measure(scenario: str, mode: str, batch: int, size: int):
    if scenario == "down":
        model = DownStack(mode=mode)
        x = jnp.zeros((batch, size, size, 1), jnp.float32)
        args = (x,)
    elif scenario == "seq32":  # no initial conv in rev mode (32 -> 32)
        model = OneSeq(mode=mode)
        args = (jnp.zeros((batch, size, size, 32), jnp.float32),)
    elif scenario == "seq1":  # initial conv 1 -> 32 in rev mode
        model = OneSeq(mode=mode)
        args = (jnp.zeros((batch, size, size, 1), jnp.float32),)
    elif scenario == "lik":
        model = LikStack(mode=mode)
        # z at latent levels: finest latent res = size/2^lvl_diff
        zs = [
            jnp.zeros(
                (batch, size // 2 ** (i + 2), size // 2 ** (i + 2), 2),
                jnp.float32,
            )
            for i in range(5)
        ]
        args = (zs,)
    else:
        raise SystemExit(f"unknown scenario {scenario}")

    variables = model.init({"params": jax.random.PRNGKey(0)}, *args, train=False)

    def loss_fn(v, *a):
        out, _ = model.apply(v, *a, train=True, mutable=["batch_stats"])
        return out

    compiled = (
        jax.jit(jax.grad(loss_fn)).lower(variables, *args).compile()
    )
    m = compiled.memory_analysis()
    peak = int(m.temp_size_in_bytes + m.argument_size_in_bytes)
    print(json.dumps({
        "scenario": scenario, "mode": mode,
        "temp_MiB": round(m.temp_size_in_bytes / 2**20, 1),
        "args_MiB": round(m.argument_size_in_bytes / 2**20, 1),
        "peak_MiB": round(peak / 2**20, 1),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="down")
    ap.add_argument("--modes", default="plain,reversible")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--size", type=int, default=128)
    a = ap.parse_args()
    for mode in a.modes.split(","):
        measure(a.scenario, mode, a.batch, a.size)
