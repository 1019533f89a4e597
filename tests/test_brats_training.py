"""End-to-end 3D (BraTS) training path: provider splits, 3D augmentation in
the jitted step, PHiSeg3D forward/loss, per-region dice validation."""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.data import synthetic
from unet_zoo_tpu.data.brats import BratsData
from unet_zoo_tpu.data.augment import Augment3DOptions
from unet_zoo_tpu.experiments import ExperimentConfig
from unet_zoo_tpu.training import Trainer


@pytest.fixture(scope="module")
def brats16(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("brats")
    cache = synthetic.make_brats_cache(
        str(tmp / "brats.hdf5"), num_per_split=(4, 2), size=(16, 16, 16)
    )
    return BratsData(h5py.File(cache, "r"), seed=0)


def _cfg(**kw):
    base = dict(
        experiment_name="tiny_brats",
        log_dir_name="brats",
        model="phiseg3d",
        data_loader="brats",
        filter_channels=(2, 4, 4),
        latent_levels=2,
        n_classes=3,
        num_labels_per_subject=1,
        input_channels=4,
        batch_size=2,
        image_size=(16, 16, 16),
        validation_samples=2,
        num_validation_images=2,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_brats_splits_provider_api(brats16):
    x, y = brats16.train.next_batch(2)
    assert x.shape == (2, 16, 16, 16, 4)
    assert y.shape == (2, 16, 16, 16, 3)  # WT/TC/ET one-hot
    assert brats16.validation.images.shape[0] == 2


def test_brats_train_step_descends(brats16, tmp_path):
    cfg = _cfg()
    tr = Trainer(cfg, log_dir=str(tmp_path / "b"))
    losses = []
    for _ in range(6):
        x, y = brats16.train.next_batch(cfg.batch_size)
        tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_brats_train_step_with_3d_augmentation(brats16, tmp_path):
    cfg = _cfg(
        augmentation_options_3d=Augment3DOptions(
            do_rotate=True, do_scale=True, do_elastic=True, do_flip=True,
            do_intensity_shift=True,
        )
    )
    tr = Trainer(cfg, log_dir=str(tmp_path / "baug"))
    x, y = brats16.train.next_batch(cfg.batch_size)
    tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(aux["loss"]))


def test_brats_validation_dice_and_checkpoints(brats16, tmp_path):
    cfg = _cfg()
    tr = Trainer(cfg, log_dir=str(tmp_path / "bval"))
    agg = tr.validate(brats16)
    for k in ("dice_wt", "dice_tc", "dice_et", "loss"):
        assert np.isfinite(agg[k]), k
        if k.startswith("dice"):
            assert 0.0 <= agg[k] <= 1.0
    assert os.path.exists(tmp_path / "bval" / "best_dice")
    assert os.path.exists(tmp_path / "bval" / "best_loss")
