"""Pallas TPU kernels for the hot ops.

`fused_conv_chain` — a U-Net conv block (3x conv3x3+ReLU) as one
VMEM-resident kernel (see conv_chain.py). Inference-path only (no
autodiff rules); the training step uses XLA convs.
"""

from unet_zoo_tpu.ops.pallas.conv_chain import fused_conv_chain

__all__ = ["fused_conv_chain"]
