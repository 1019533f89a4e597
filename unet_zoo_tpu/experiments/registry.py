"""Built-in experiment registry.

Every experiment module shipped by the reference
(reference models/experiments/*.py, 27 runnable configs) has a named twin
here, same hyperparameters, same naming convention
(phiseg_[rev_]7_5_<batch> = 7 resolution levels, 5 latent levels, batch
size; *_uzh_*_<res> = image resolution).
"""

from __future__ import annotations

from typing import Callable, Dict

from unet_zoo_tpu.data.augment import Augment3DOptions, AugmentOptions
from unet_zoo_tpu.experiments.config import ExperimentConfig

_REGISTRY: Dict[str, Callable[[], ExperimentConfig]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_experiment(name: str) -> ExperimentConfig:
    try:
        cfg = _REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown experiment '{name}'; available: {sorted(_REGISTRY)}"
        ) from None
    cfg.validate()
    return cfg


def list_experiments():
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

_LIDC_AUG = AugmentOptions(  # reference phiseg_7_5_12.py:33-37
    do_rotations=True,
    do_scaleaug=True,
    do_fliplr=True,
    do_flipud=True,
    nlabels=2,
)


def _phiseg_lidc(batch_size: int, reversible: bool) -> ExperimentConfig:
    """reference models/experiments/phiseg_[rev_]7_5_<bs>.py"""
    rev = "Rev" if reversible else ""
    return ExperimentConfig(
        experiment_name=f"PHISeg{rev}_7_5_{batch_size}",
        log_dir_name="lidc",
        model="phiseg",
        data_loader="lidc",
        filter_channels=(32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=2,
        num_labels_per_subject=4,
        use_reversible=reversible,
        batch_size=batch_size,
        image_size=(128, 128),
        augmentation_options=_LIDC_AUG,
        validation_samples=16,
        num_validation_images=100,
    )


for _bs in (12, 24, 36, 48, 56):
    _REGISTRY[f"phiseg_7_5_{_bs}"] = (lambda b: lambda: _phiseg_lidc(b, False))(_bs)
for _bs in (12, 24, 36, 48, 56, 60, 64):
    _REGISTRY[f"phiseg_rev_7_5_{_bs}"] = (lambda b: lambda: _phiseg_lidc(b, True))(_bs)


@register("phiseg_big")
def _phiseg_big() -> ExperimentConfig:
    """reference models/experiments/phiseg_big.py (256-wide, batch 32)"""
    return ExperimentConfig(
        experiment_name="PHISegBig",
        model="phiseg",
        data_loader="lidc",
        filter_channels=(32, 64, 128, 192, 256, 256, 256),
        latent_levels=5,
        batch_size=32,
        image_size=(128, 128),
        augmentation_options=_LIDC_AUG,
    )


@register("phiseg_big_reversible")
def _phiseg_big_rev() -> ExperimentConfig:
    import dataclasses

    return dataclasses.replace(
        _phiseg_big(), experiment_name="PHISegBigRev", use_reversible=True
    )


def _phiseg_uzh(resolution: int, reversible: bool) -> ExperimentConfig:
    """reference models/experiments/phiseg_uzh_[rev_]7_5_<res>.py"""
    rev = "Rev" if reversible else ""
    return ExperimentConfig(
        experiment_name=f"PHISegUZH{rev}_7_5_{resolution}",
        log_dir_name="uzh",
        model="phiseg",
        data_loader="uzh_prostate",
        filter_channels=(32, 64, 128, 192, 192, 192, 192),
        latent_levels=5,
        n_classes=3,
        num_labels_per_subject=6,
        use_reversible=reversible,
        batch_size=12,
        image_size=(resolution, resolution),
        resize_to=(resolution, resolution),
        target_resolution=(0.625, 0.625),
        augmentation_options=AugmentOptions(
            do_rotations=True, do_scaleaug=True,
            do_fliplr=True, do_flipud=True, nlabels=3,
        ),
        validation_samples=16,
        num_validation_images="all",
    )


for _res in (192, 256, 384, 512):
    _REGISTRY[f"phiseg_uzh_7_5_{_res}"] = (lambda r: lambda: _phiseg_uzh(r, False))(_res)
for _res in (192, 224, 256, 384, 512):
    _REGISTRY[f"phiseg_uzh_rev_7_5_{_res}"] = (lambda r: lambda: _phiseg_uzh(r, True))(
        _res
    )


@register("prob_unet")
def _prob_unet() -> ExperimentConfig:
    """reference models/experiments/prob_unet.py"""
    return ExperimentConfig(
        experiment_name="ProbabilisticUnet",
        model="prob_unet",
        data_loader="lidc",
        filter_channels=(32, 64, 128, 192, 192, 192, 192),
        latent_levels=1,
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        n_classes=2,
        num_labels_per_subject=4,
        batch_size=12,
        image_size=(128, 128),
        augmentation_options=_LIDC_AUG,
    )


@register("prob_unet_reversible")
def _prob_unet_rev() -> ExperimentConfig:
    import dataclasses

    return dataclasses.replace(
        _prob_unet(), experiment_name="ProbabilisticUnetRev", use_reversible=True
    )


@register("unet")
def _unet() -> ExperimentConfig:
    """reference models/experiments/unet.py (4-level vanilla U-Net)"""
    return ExperimentConfig(
        experiment_name="Unet",
        model="unet",
        data_loader="lidc",
        filter_channels=(32, 64, 128, 192),
        latent_levels=3,
        n_classes=2,  # reference file says 1 but its own loss needs >= 2
        num_labels_per_subject=4,
        batch_size=12,
        image_size=(128, 128),
        augmentation_options=_LIDC_AUG,
    )


@register("reversible_unet")
def _reversible_unet() -> ExperimentConfig:
    import dataclasses

    return dataclasses.replace(
        _unet(), experiment_name="ReversibleUnet", use_reversible=True
    )


@register("phiseg_brats")
def _phiseg_brats() -> ExperimentConfig:
    """reference models/experiments/phiseg_brats.py (volumetric 128^3)"""
    return ExperimentConfig(
        experiment_name="PHISeg_brats",
        log_dir_name="brats",
        model="phiseg3d",
        data_loader="brats",
        filter_channels=(32, 64, 128),
        latent_levels=2,
        n_classes=3,
        num_labels_per_subject=1,
        use_reversible=True,
        input_channels=4,
        batch_size=1,
        image_size=(128, 128, 128),
        augmentation_options_3d=Augment3DOptions(
            do_rotate=True, rot_degrees=20.0,
            do_scale=True, scale_factor=1.1,
            do_elastic=True, elastic_sigma=10.0,
            do_flip=True, do_intensity_shift=True, max_intensity_shift=0.1,
            nlabels=3,
        ),
    )
