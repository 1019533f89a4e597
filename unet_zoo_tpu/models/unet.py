"""Vanilla / Reversible U-Net (reference models/unet.py:78-165).

TPU-first differences from the reference:
* NHWC layout, pure-functional apply, bf16-capable compute dtype;
* the reversible variant maps onto ops.ReversibleSequence (custom_vjp
  inverse reconstruction) or jax.checkpoint, chosen by ``reversible_mode``;
* the CE loss is shape-generic (the reference hardcodes 128x128,
  models/unet.py:163 — an acknowledged reference bug).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu import ops
from unet_zoo_tpu.models.blocks import DownBlock


class UNet(nn.Module):
    """Contracting/expanding conv net with skip concats.

    Up path: bilinear x2 upsample with ``align_corners=False``
    (reference models/unet.py:67), concat skip, then a 3-conv block.
    """

    num_classes: int
    num_filters: Sequence[int] = (32, 64, 128, 192)
    apply_last_layer: bool = True
    reversible_mode: str = "plain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        skips = []
        n = len(self.num_filters)
        for i, f in enumerate(self.num_filters):
            x = DownBlock(
                f,
                pool=(i != 0),
                reversible_mode=self.reversible_mode,
                dtype=self.dtype,
                name=f"down{i}",
            )(x, train=train)
            if i != n - 1:
                skips.append(x)

        for i in range(n - 2, -1, -1):
            # resize to the skip's exact spatial shape (== x2 on power-of-two
            # sizes; handles odd pyramids the reference's scale_factor=2
            # cannot, models/unet.py:67,71)
            x = ops.resize_linear(x, skips[i].shape[1:-1], align_corners=False)
            # (x, skip) tuple = implicit concat (ops.Conv) — identical math,
            # no materialized concat/layout copy on TPU
            x = DownBlock(
                self.num_filters[i],
                pool=False,
                reversible_mode=self.reversible_mode,
                dtype=self.dtype,
                name=f"up{i}",
            )((x, skips[i]), train=train)

        if self.apply_last_layer:
            x = ops.Conv(
                self.num_classes,
                kernel_size=1,
                init_scheme="torch_default",
                name="last",
            )(x)
        return x

    # ------------------------------------------------------------------
    # harness contract (mirrors the duck-typed API consumed by the
    # reference train loop, train_model.py:111-117,185-192)
    # ------------------------------------------------------------------

    @staticmethod
    def loss(logits, mask, params=None):
        """Mean CE over all pixels (torch CrossEntropyLoss default)."""
        ce = softmax_cross_entropy(logits, mask)
        loss = jnp.mean(ce)
        return loss, {"loss": loss, "kl": jnp.zeros(()), "recon": loss}

    def sample(self, x, n: int, train: bool = False):
        """Deterministic model: n identical prediction samples (B,n,...,C)."""
        logits = self(x, train=train)
        return jnp.broadcast_to(logits[:, None], (logits.shape[0], n) + logits.shape[1:])

    @staticmethod
    def accumulate_output(logits, use_softmax: bool = False):
        return jax.nn.softmax(logits, axis=-1) if use_softmax else logits


def softmax_cross_entropy(logits, labels):
    """Per-element CE with integer labels over the trailing channel axis.

    One-hot contraction instead of take_along_axis: the label gather (and
    its scatter-add backward) dominated the PHiSeg train step on TPU
    (profiled ~40 of 80 ms/step — the residual loss evaluates CE at every
    latent level); the one-hot form is elementwise on the VPU."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(oh * logp, axis=-1)
