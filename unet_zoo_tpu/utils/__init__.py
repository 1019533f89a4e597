"""Misc utilities: NIfTI I/O, metrics writers, post-processing."""

from unet_zoo_tpu.utils.nii import load_nii, save_nii
from unet_zoo_tpu.utils.summary import MetricsWriter
from unet_zoo_tpu.utils.profiling import (
    device_memory_stats,
    step_memory_analysis,
    trace,
)
from unet_zoo_tpu.utils.postprocess import (
    convert_to_onehot,
    keep_largest_connected_components,
    l2_regularisation,
    convert_to_uint8,
    map_image_to_intensity_range,
    norm_l2,
    normalise_image,
    tile_batch_for_display,
    normalise_images,
)

__all__ = [
    "load_nii",
    "save_nii",
    "MetricsWriter",
    "trace",
    "device_memory_stats",
    "step_memory_analysis",
    "convert_to_onehot",
    "keep_largest_connected_components",
    "l2_regularisation",
    "convert_to_uint8",
    "map_image_to_intensity_range",
    "norm_l2",
    "normalise_image",
    "tile_batch_for_display",
    "normalise_images",
]
