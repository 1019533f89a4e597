"""Model families: U-Net, Probabilistic U-Net, PHiSeg (2D & 3D), each with
plain / remat / reversible memory modes."""

from unet_zoo_tpu.models.unet import UNet
from unet_zoo_tpu.models.prob_unet import ProbUNet
from unet_zoo_tpu.models.phiseg import PHiSeg
from unet_zoo_tpu.models.registry import get_model, MODELS

__all__ = ["UNet", "ProbUNet", "PHiSeg", "get_model", "MODELS"]
