"""Experiment configuration: frozen dataclass configs + named registry
(the reference's executable-config layer, models/experiments/*.py)."""

from unet_zoo_tpu.experiments.config import (
    ExperimentConfig,
    SystemConfig,
    load_experiment,
)
from unet_zoo_tpu.experiments.registry import get_experiment, list_experiments

__all__ = [
    "ExperimentConfig",
    "SystemConfig",
    "load_experiment",
    "get_experiment",
    "list_experiments",
]
