"""End-to-end preprocessing over synthetic raw NIfTI inputs: exercises the
minimal NIfTI reader and the full UZH/BraTS prepare_data pipelines
(reference uzh_prostate_data_loader.py:51-247, brats18_data_loader.py:98-248)."""

import os

import h5py
import numpy as np
import pytest

from unet_zoo_tpu.utils.nii import save_nii
from unet_zoo_tpu.data import uzh as uzh_mod
from unet_zoo_tpu.data import brats as brats_mod


def _make_uzh_raw(root, patient_ids, shape=(24, 24, 3)):
    """Per-case folders 888<id>/t2_tse_tra.nii.gz + per-expert masks."""
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    rng = np.random.default_rng(0)
    for pid in patient_ids:
        case = os.path.join(img_dir, f"888{pid}")
        os.makedirs(case, exist_ok=True)
        vol = rng.uniform(0, 100, shape).astype(np.float32)
        save_nii(os.path.join(case, "t2_tse_tra.nii.gz"), vol)
        for exp in uzh_mod.EXPERT_LIST:
            d = os.path.join(mask_dir, exp)
            os.makedirs(d, exist_ok=True)
            mask = rng.integers(0, 4, shape).astype(np.uint8)  # incl. label 3
            save_nii(
                os.path.join(d, f"case_{str(pid).zfill(4)}_x.nii.gz"), mask
            )
    return img_dir, mask_dir


def test_uzh_prepare_data_end_to_end(tmp_path):
    ids = [1, 2, 3, 4, 5, 6]  # %5==0 -> test(5); %4==0 -> val(4); rest train
    img_dir, mask_dir = _make_uzh_raw(str(tmp_path), ids)
    out = str(tmp_path / "uzh.hdf5")
    uzh_mod.prepare_data(
        img_dir, mask_dir, out, size=(16, 16), target_resolution=(1.0, 1.0)
    )
    with h5py.File(out, "r") as f:
        # 3 slices per volume
        assert f["images_train"].shape == (4 * 3, 16, 16)
        assert f["images_validation"].shape == (3, 16, 16)
        assert f["images_test"].shape == (3, 16, 16)
        assert f["masks_train"].shape == (12, 16, 16, 6)
        # seminal vesicles (label 3) removed
        assert 3 not in np.unique(f["masks_train"][:])
        # image normalized ~zero-mean per volume
        assert abs(float(np.mean(f["images_train"][0:3]))) < 1.0
        assert list(f["patient_id_train"][:]) == [1, 1, 1, 2, 2, 2, 3, 3, 3, 6, 6, 6]


def test_uzh_skips_case9(tmp_path):
    img_dir, mask_dir = _make_uzh_raw(str(tmp_path), [9, 11])
    out = str(tmp_path / "uzh.hdf5")
    uzh_mod.prepare_data(
        img_dir, mask_dir, out, size=(16, 16), target_resolution=(1.0, 1.0)
    )
    with h5py.File(out, "r") as f:
        all_ids = np.concatenate(
            [f[f"patient_id_{tt}"][:] for tt in ("train", "validation", "test")]
        )
        assert 9 not in all_ids and 11 in all_ids


def test_uzh_rescale_by_pixdim(tmp_path):
    """target_resolution=0.5 with pixdim=1 doubles the in-plane size before
    the centre crop (reference uzh_prostate_data_loader.py:160-186)."""
    img_dir, mask_dir = _make_uzh_raw(str(tmp_path), [1], shape=(8, 8, 1))
    out = str(tmp_path / "uzh.hdf5")
    uzh_mod.prepare_data(
        img_dir, mask_dir, out, size=(16, 16), target_resolution=(0.5, 0.5)
    )
    with h5py.File(out, "r") as f:
        assert f["images_train"].shape == (1, 16, 16)
        # 8x8 rescaled to 16x16 fills the full crop; nothing zero-padded
        img = f["images_train"][0]
        assert (np.abs(img) > 0).mean() > 0.9


def _make_brats_raw(root, n_cases, shape=(20, 22, 18)):
    rng = np.random.default_rng(1)
    for i in range(n_cases):
        case = f"Brats18_case_{i}"
        d = os.path.join(root, case)
        os.makedirs(d, exist_ok=True)
        for mod in brats_mod.MODALITIES:
            vol = np.zeros(shape, np.float32)
            vol[2:-2, 2:-2, 2:-2] = rng.uniform(1, 10, tuple(s - 4 for s in shape))
            save_nii(os.path.join(d, f"{case}_{mod}.nii.gz"), vol)
        seg = np.zeros(shape, np.uint8)
        seg[5:9, 5:9, 5:9] = rng.choice([1, 2, 4], (4, 4, 4))
        save_nii(os.path.join(d, f"{case}_seg.nii.gz"), seg)


def test_brats_prepare_data_end_to_end(tmp_path):
    raw = str(tmp_path / "raw")
    os.makedirs(raw)
    _make_brats_raw(raw, 4)
    out = str(tmp_path / "brats.hdf5")
    brats_mod.prepare_data(raw, out, size=(16, 16, 16))
    with h5py.File(out, "r") as f:
        n_total = sum(
            f[f"images_{tt}"].shape[0] for tt in ("train", "validation", "test")
        )
        assert n_total == 4
        imgs = f["images_train"]
        assert imgs.shape[1:] == (16, 16, 16, 4)
        # zero-preserving normalization: background exactly zero
        vol = imgs[0]
        assert (vol[0, 0, 0] == 0).all()
        masks = f["masks_train"][:]
        assert set(np.unique(masks)).issubset({0, 1, 2, 4})


def test_brats_data_class_over_prepared(tmp_path):
    raw = str(tmp_path / "raw")
    os.makedirs(raw)
    _make_brats_raw(raw, 5)
    f = brats_mod.load_and_maybe_process_data(raw, str(tmp_path / "pre"), size=(16, 16, 16))
    data = brats_mod.BratsData(f, seed=0)
    if data.train.images.shape[0]:
        img, lbl, pid = data.get(0, "train")
        assert img.shape == (16, 16, 16, 4) and lbl.shape == (16, 16, 16, 3)


def test_brats_reassembly_roundtrip():
    """crop_volume_all_dim + crop_or_pad + reassemble == identity on the
    cropped region."""
    from unet_zoo_tpu.data.brats import (
        crop_or_pad_volume, crop_volume_all_dim, reassemble_to_original,
    )

    rng = np.random.default_rng(0)
    orig = np.zeros((30, 26, 22, 1), np.float32)
    orig[5:20, 4:22, 3:19, :] = rng.uniform(1, 5, (15, 18, 16, 1))
    cropped, (lo, hi) = crop_volume_all_dim(orig)
    grid = crop_or_pad_volume(cropped, (16, 16, 16), channels=1)
    back = reassemble_to_original(grid, orig.shape[:3], lo, hi)
    # the part of the original that survived crop/pad must round-trip
    inner = tuple(
        slice(l + max(0, (h - l - 16)) // 2, l + max(0, (h - l - 16)) // 2 + min(16, h - l))
        for l, h in zip(lo, hi)
    )
    np.testing.assert_allclose(back[inner], orig[inner])
