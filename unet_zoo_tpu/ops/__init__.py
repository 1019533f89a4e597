"""Core TPU op library: conv blocks, norms, resizing, pooling, initializers,
reversible sequences.

Everything is NHWC (2D) / NDHWC (3D) — the TPU-native layout where the
channel dimension maps onto the 128-wide lane dimension of the VPU/MXU.
"""

from unet_zoo_tpu.ops.init import (
    kaiming_normal_fan_in,
    truncated_normal_std,
    torch_default_conv_kernel,
    torch_default_conv_bias,
    orthogonal_kernel,
)
from unet_zoo_tpu.ops.norm import BatchNorm
from unet_zoo_tpu.ops.conv import Conv, ConvBNAct, ConvSeq, conv_sequence
from unet_zoo_tpu.ops.pool import avg_pool_ceil
from unet_zoo_tpu.ops.resize import (
    upsample_linear,
    upsample_nearest,
    resize_linear,
)
from unet_zoo_tpu.ops.reversible import ReversibleSequence

__all__ = [
    "kaiming_normal_fan_in",
    "truncated_normal_std",
    "torch_default_conv_kernel",
    "torch_default_conv_bias",
    "orthogonal_kernel",
    "BatchNorm",
    "Conv",
    "ConvBNAct",
    "ConvSeq",
    "conv_sequence",
    "avg_pool_ceil",
    "upsample_linear",
    "upsample_nearest",
    "resize_linear",
    "ReversibleSequence",
]
