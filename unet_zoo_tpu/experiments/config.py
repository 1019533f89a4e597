"""Experiment & system configuration.

The reference uses executable python modules as configs, loaded by path with
SourceFileLoader (reference train_model.py:584) and exposing ~25 module
attributes (e.g. reference models/experiments/phiseg_7_5_12.py:7-51). Here
the same fields live in a frozen dataclass: hashable (jit-static),
explicitly validated, loadable either from the built-in registry by name or from a
python file defining ``config = ExperimentConfig(...)`` — preserving the
file-per-experiment semantics.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import os
from typing import Optional, Tuple, Union

from unet_zoo_tpu.data.augment import Augment3DOptions, AugmentOptions


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    """Machine paths (reference config/system.py + config/local_config.py:7-23)."""

    project_root: str = "."
    log_root: str = "logs"
    data_root: str = "data/data_lidc.pickle"
    preproc_folder: str = "preproc"
    uzh_input_image_folder: str = ""
    uzh_input_mask_folder: str = ""
    uzh_preproc_folder: str = "preproc"
    brats_root: str = ""
    # Persistent XLA compilation cache shared across runs (no reference
    # counterpart — a TPU-first concern: remote/cold TPU compiles of the
    # jitted train/eval programs run 1-17 min, and the reference UX is
    # many short train/eval invocations over the same experiment configs).
    # "~" expands; set to null in the json to disable.
    jax_compilation_cache_dir: Optional[str] = "~/.cache/unet_zoo_tpu/jax"


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = one frozen value (field set mirrors the reference
    experiment modules, e.g. models/experiments/phiseg_7_5_12.py:7-51)."""

    experiment_name: str
    log_dir_name: str = "lidc"
    model: str = "phiseg"  # unet_zoo_tpu.models.registry name
    data_loader: str = "lidc"  # unet_zoo_tpu.data.registry name

    # architecture
    filter_channels: Tuple[int, ...] = (32, 64, 128, 192, 192, 192, 192)
    latent_levels: int = 5
    latent_dim: int = 6  # prob_unet only (reference prob_unet.py:15)
    zdim: int = 2  # phiseg per-level latent channels (reference phiseg.py:132)
    no_convs_fcomb: int = 4
    beta: float = 10.0  # kept for parity; unused (reference comment "not used")
    n_classes: int = 2
    input_channels: int = 1
    image_size: Tuple[int, ...] = (128, 128)  # SPATIAL dims (reference
    # stores (C, H, W), train_model reads [1:]; we keep channels separate)
    use_reversible: bool = False
    reversible_mode: Optional[str] = None  # override: "reversible"|"remat"|"plain"
    exponential_weighting: bool = True
    kl_parity: bool = True  # reproduce reference sigma1*sigma0 KL quirk
    dtype: str = "float32"  # compute dtype; "bfloat16" for TPU speed

    # data
    num_labels_per_subject: int = 4
    annotator_range: Optional[Tuple[int, ...]] = None
    resize_to: Optional[Tuple[int, ...]] = None
    target_resolution: Optional[Tuple[float, ...]] = None
    augmentation_options: Optional[AugmentOptions] = None
    augmentation_options_3d: Optional[Augment3DOptions] = None
    # "device": warps inside the jitted step (no host dependency);
    # "host": the reference's cv2 chain on a thread pool, overlapped with
    # device compute via PrefetchingLoader (faster on TPU — device gathers
    # are expensive)
    augment_on: str = "device"
    data_seed: Optional[int] = 0
    # "h5py": blocking reads in the train loop (the reference's own IO
    # model, data/batch_provider.py:58-59); "native": the C++ mmap store
    # (native/batchstore.cpp) — records gathered by a thread pool one
    # batch AHEAD of the consumer (async double-buffered prefetch), same
    # sampling semantics/RNG stream as the h5py provider
    loader: str = "h5py"

    # optimization (reference hardcodes these in the harness,
    # train_model.py:49-51)
    iterations: int = 5_000_000
    batch_size: int = 12
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    min_lr: float = 1e-4
    lr_plateau_patience: int = 50_000
    lr_plateau_factor: float = 0.1

    # evaluation / logging
    validation_samples: int = 16
    num_validation_images: Union[int, str] = 100  # int or "all"
    logging_frequency: int = 1000
    validation_frequency: int = 1000
    pretrained_model: Optional[str] = None
    seed: int = 0

    # ------------------------------------------------------------------

    @property
    def effective_reversible_mode(self) -> str:
        if self.reversible_mode is not None:
            return self.reversible_mode
        return "reversible" if self.use_reversible else "plain"

    @property
    def is_3d(self) -> bool:
        return len(self.image_size) == 3

    def model_kwargs(self) -> dict:
        """Constructor kwargs for unet_zoo_tpu.models.registry.get_model
        (the twin of the reference kwargs contract, train_model.py:34-42)."""
        import jax.numpy as jnp

        kw = dict(
            num_classes=self.n_classes,
            num_filters=tuple(self.filter_channels),
            reversible_mode=self.effective_reversible_mode,
            dtype={"float32": None, "bfloat16": jnp.bfloat16}[self.dtype],
        )
        if self.model in ("phiseg", "phiseg3d"):
            kw.update(
                latent_levels=self.latent_levels,
                zdim=self.zdim,
                image_size=tuple(self.image_size),
                exponential_weighting=self.exponential_weighting,
                kl_parity=self.kl_parity,
            )
        elif self.model == "prob_unet":
            kw.update(
                latent_dim=self.latent_dim,
                no_convs_fcomb=self.no_convs_fcomb,
                kl_parity=self.kl_parity,
            )
        return kw

    def validate(self) -> None:
        assert self.model in ("unet", "prob_unet", "phiseg", "phiseg3d"), self.model
        if self.model in ("phiseg", "phiseg3d"):
            assert self.latent_levels <= len(self.filter_channels)
        assert self.dtype in ("float32", "bfloat16")
        assert self.loader in ("h5py", "native"), self.loader
        if self.loader == "native":
            assert self.resize_to is None, (
                "loader='native' serves raw records; resize_to needs the "
                "h5py provider's post-processing"
            )
        # any spatial size works: pooling is ceil-mode and every upsample
        # resizes to the exact skip shape (unlike the reference's fixed
        # scale_factor=2, which breaks on non-power-of-two pyramids); just
        # require the coarsest level to be nonempty
        levels = len(self.filter_channels)
        for s in self.image_size:
            assert -(-s // (2 ** (levels - 1))) >= 1 and s >= 2 ** (levels - 1), (
                f"image size {s} too small for {levels} resolution levels"
            )


def load_experiment(name_or_path: str) -> ExperimentConfig:
    """Resolve an experiment: registry name, or path to a .py file defining
    ``config`` (file-per-experiment semantics of reference train_model.py:584)."""
    if os.path.exists(name_or_path) and name_or_path.endswith(".py"):
        spec = importlib.util.spec_from_file_location("exp_config", name_or_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        cfg = getattr(module, "config")
        assert isinstance(cfg, ExperimentConfig)
        return cfg
    from unet_zoo_tpu.experiments.registry import get_experiment

    return get_experiment(name_or_path)
