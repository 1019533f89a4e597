"""Convolution blocks (dimension-generic: 2D NHWC / 3D NDHWC).

Reproduces the reference layer vocabulary TPU-natively:

* ``Conv``      — bare conv, torch-compatible padding rule (k=3 -> SAME-1,
                  k=1 -> VALID), selectable init scheme.
                  (reference torchlayers.py:7-29 conv part)
* ``ConvBNAct`` — conv + BatchNorm(eps 1e-3, momentum 0.01) + ReLU, the
                  reference's ``Conv2D``/``Conv3D`` unit
                  (reference torchlayers.py:7-29, models/phiseg3D.py:13-36).
* ``ConvSeq``   — ``depth`` stacked ConvBNAct, the reference's
                  ``Conv2DSequence``/``Conv3DSequence``
                  (reference torchlayers.py:32-52).

XLA fuses BN+ReLU into the conv epilogue on TPU; we keep them as separate
ops in the graph and let the compiler fuse (measured faster than manual
Pallas conv at these channel counts; revisit per-bench).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.lax as lax
import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu.ops import init as init_lib
from unet_zoo_tpu.ops.norm import BatchNorm


def _kernel_tuple(kernel_size, ndim):
    if isinstance(kernel_size, (tuple, list)):
        return tuple(kernel_size)
    return (kernel_size,) * ndim


class Conv(nn.Module):
    """Bare convolution with torch-compatible padding and init.

    ``init_scheme`` is one of: 'he_normal' (reference utils.init_weights),
    'orthogonal' (Fcomb), 'torch_default' (PHiSeg un-initialized layers).

    ``x`` may be a TUPLE of tensors — an *implicit channel concat*:
    conv(concat(a, b), K) is computed as conv(a, K[..., :Ca, :]) +
    conv(b, K[..., Ca:, :]). Mathematically identical (same parameter
    tensor, same init), but skips materializing the concatenated array —
    on TPU the skip-concats otherwise force whole-tensor layout copies
    between the producers' and the conv's preferred layouts (measured
    ~24% of U-Net forward time at LIDC bench shapes).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    init_scheme: str = "torch_default"
    use_bias: bool = True
    # True when a train-mode BatchNorm directly follows this conv: the bias
    # gradient is then mathematically ~0 (BN's backward projects out the
    # per-channel mean of the cotangent), but XLA still pays a separate
    # whole-cotangent convert+reduce per conv to compute it — measured
    # 2.4 ms of a 26.3 ms PHiSeg bs12 train step. stop_gradient makes the
    # zero exact and deletes those reads; the coupled-L2 Adam weight decay
    # (the only surviving term of the true torch bias gradient) still
    # applies, since it is added to the (now exactly zero) gradient.
    grad_free_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        parts = list(x) if isinstance(x, (tuple, list)) else [x]
        ndim = parts[0].ndim - 2  # spatial dims
        ks = _kernel_tuple(self.kernel_size, ndim)
        # torch rule in the reference: kernel 3 -> padding 1, else 0.
        pad = tuple((k // 2, k // 2) if k == 3 else (0, 0) for k in ks)

        cin = sum(p.shape[-1] for p in parts)
        kernel_shape = ks + (cin, self.features)
        fan_in = int(np.prod(ks)) * cin

        kernel_init, bias_init = init_lib.SCHEMES[self.init_scheme]
        if bias_init is None:  # torch default bias
            bias_init = init_lib.torch_default_conv_bias(fan_in)

        kernel = self.param("kernel", kernel_init, kernel_shape, jnp.float32)
        dtype = self.dtype or parts[0].dtype
        y = None
        off = 0
        for p in parts:
            kp = kernel[..., off : off + p.shape[-1], :]
            # NOTE: no preferred_element_type=f32 — the MXU accumulates in
            # f32 internally regardless, and an f32 output makes the conv's
            # backward cotangent f32 against bf16 operands (a dtype error
            # under grad). The bias add below runs in f32.
            yc = lax.conv_general_dilated(
                p.astype(dtype),
                kp.astype(dtype),
                window_strides=(self.strides,) * ndim,
                padding=pad,
                dimension_numbers=_dim_numbers(ndim),
            )
            y = yc if y is None else y + yc
            off += p.shape[-1]
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            if self.grad_free_bias:
                bias = lax.stop_gradient(bias)
            y = y.astype(jnp.float32) + bias
        return y.astype(dtype)


def _dim_numbers(ndim):
    if ndim == 2:
        return ("NHWC", "HWIO", "NHWC")
    if ndim == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    if ndim == 1:
        return ("NWC", "WIO", "NWC")
    raise ValueError(f"unsupported spatial ndim {ndim}")


class ConvBNAct(nn.Module):
    """conv -> BatchNorm -> activation (the reference's Conv2D/Conv3D unit).

    ``norm=False`` / ``act=None`` degrade to bare conv(+act), matching the
    Identity norm/activation overrides used for the 1x1 output heads
    (reference models/phiseg.py:283-284).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: bool = True
    act: Optional[Callable] = nn.relu
    init_scheme: str = "torch_default"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(
            self.features,
            self.kernel_size,
            self.strides,
            init_scheme=self.init_scheme,
            # bias grads are ~0 through the train-mode BN that follows;
            # see Conv.grad_free_bias (eval-mode forwards are never
            # differentiated in this framework)
            grad_free_bias=self.norm,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm:
            y = BatchNorm(axis_name=self.bn_axis_name, name="bn")(
                y, use_running_average=not train
            )
        if self.act is not None:
            y = self.act(y)
        # keep activations sharded over the "space" mesh axis (no-op unless
        # the trainer enabled spatial sharding — parallel/space.py)
        from unet_zoo_tpu.parallel.space import constrain

        return constrain(y)


def conv_sequence(
    features: int,
    depth: int,
    mode: str = "plain",
    rev_depth: Optional[int] = None,
    norm: bool = True,
    init_scheme: str = "torch_default",
    dtype=None,
    name: Optional[str] = None,
):
    """Build a conv sequence for the given memory mode:

    * "plain"      — ConvSeq, all activations stored;
    * "remat"      — the SAME ConvSeq under nn.remat: stores only the
                     sequence boundary, recomputes internals in backward
                     (identical parameter structure to plain — checkpoints
                     interchange);
    * "reversible" — additive-coupling ReversibleSequence (custom_vjp
                     inverse reconstruction; the reference's revtorch
                     design, different parameter structure).
    """
    from unet_zoo_tpu.ops.reversible import ReversibleSequence

    if mode == "reversible":
        return ReversibleSequence(
            features,
            depth=rev_depth if rev_depth is not None else depth,
            mode="reversible",
            init_scheme=init_scheme,
            dtype=dtype,
            name=name,
        )
    cls = nn.remat(ConvSeq, static_argnums=(2,)) if mode == "remat" else ConvSeq
    return cls(
        features,
        depth=depth,
        norm=norm,
        init_scheme=init_scheme,
        dtype=dtype,
        name=name,
    )


class ConvSeq(nn.Module):
    """``depth`` stacked ConvBNAct blocks (reference Conv2DSequence)."""

    features: int
    depth: int = 2
    kernel_size: int = 3
    norm: bool = True
    act: Optional[Callable] = nn.relu
    init_scheme: str = "torch_default"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.depth >= 1
        for i in range(self.depth):
            x = ConvBNAct(
                self.features,
                self.kernel_size,
                norm=self.norm,
                act=self.act,
                init_scheme=self.init_scheme,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x, train=train)
        return x
