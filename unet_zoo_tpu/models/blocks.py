"""Shared encoder/decoder building blocks (dimension-generic NHWC/NDHWC)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu import ops


class DownBlock(nn.Module):
    """U-Net contracting block: optional ceil-mode avg-pool, then 3 conv+ReLU
    (NO BatchNorm — reference models/unet.py:24-31) or a reversible sequence.
    """

    features: int
    pool: bool = True
    depth: int = 3
    reversible_mode: str = "plain"  # plain | remat | reversible
    init_scheme: str = "he_normal"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """``x`` may be a tuple (implicit channel concat — see ops.Conv):
        the up-path passes (upsampled, skip) directly, avoiding the
        materialized concat."""
        is_multi = isinstance(x, (tuple, list))
        if self.pool:
            assert not is_multi
            x = ops.avg_pool_ceil(x)
        if self.reversible_mode == "reversible":
            if is_multi:  # reversible sequences need one tensor
                x = jnp.concatenate(x, axis=-1)
            return ops.ReversibleSequence(
                self.features,
                depth=self.depth,
                mode="reversible",
                init_scheme=self.init_scheme,
                dtype=self.dtype,
                name="rev",
            )(x, train=train)
        if self.reversible_mode == "remat" and is_multi:
            x = jnp.concatenate(x, axis=-1)
        # plain and remat share the param tree (convs/conv{i}) so their
        # checkpoints interchange; plain keeps the implicit-concat tuple
        # input (the first conv consumes it directly — see ops.Conv)
        return ops.conv_sequence(
            self.features, self.depth, mode=self.reversible_mode, norm=False,
            init_scheme=self.init_scheme, dtype=self.dtype, name="convs",
        )(x, train)


class PhiDownBlock(nn.Module):
    """PHiSeg contracting block: pool + depth×(conv+BN+ReLU) or reversible
    (reference models/phiseg.py:14-39; 3D: models/phiseg3D.py:92-116).
    """

    features: int
    pool: bool = True
    depth: int = 3
    reversible_mode: str = "plain"
    rev_depth: int = 3  # 2D uses 3; the 3D model uses 1 (phiseg3D.py:105)
    init_scheme: str = "torch_default"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.pool:
            x = ops.avg_pool_ceil(x)
        if self.reversible_mode == "reversible":
            return ops.ReversibleSequence(
                self.features,
                depth=self.rev_depth,
                mode="reversible",
                init_scheme=self.init_scheme,
                dtype=self.dtype,
                name="rev",
            )(x, train=train)
        # "remat" stores only block boundaries (same params as plain)
        return ops.conv_sequence(
            self.features, self.depth, mode=self.reversible_mode,
            init_scheme=self.init_scheme, dtype=self.dtype, name="convs",
        )(x, train)
