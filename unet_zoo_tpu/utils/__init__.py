"""Misc utilities: NIfTI I/O, logging setup."""

from unet_zoo_tpu.utils.nii import load_nii, save_nii

__all__ = ["load_nii", "save_nii"]
