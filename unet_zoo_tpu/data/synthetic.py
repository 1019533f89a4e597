"""Synthetic dataset generators.

The reference has no runnable fixtures — its one pytest file loads the real
LIDC set from a hardcoded absolute path (reference test/test_scores.py:15-28).
Here every dataset gets an in-memory/in-tmpdir synthetic twin with the exact
cache schema, so the full pipeline (preproc -> provider -> augment -> train)
is testable and benchmarkable without the (non-redistributable) medical data.

Images are smooth random blobs; graders are correlated noisy dilations of a
ground-truth mask, mimicking LIDC's 4-annotator disagreement structure.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import h5py
import numpy as np


def _blob_case(rng, size: int, num_graders: int):
    """One synthetic case: image (size,size) float in [0,1], masks
    (graders,size,size) uint8."""
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = rng.uniform(0.3, 0.7, 2) * size
    r = rng.uniform(0.08, 0.2) * size
    dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    image = np.exp(-((dist / (1.5 * r)) ** 2)) + 0.05 * rng.standard_normal(
        (size, size)
    )
    masks = []
    for _ in range(num_graders):
        jitter = rng.uniform(0.85, 1.15)
        empty = rng.random() < 0.15  # some graders see no lesion (LIDC-like)
        m = (dist < r * jitter) & (not empty)
        masks.append(m.astype(np.uint8))
    return image.astype(np.float32), np.asarray(masks)


def make_lidc_pickle(
    path: str,
    num_cases: int = 40,
    num_subjects: int = 10,
    size: int = 128,
    seed: int = 0,
) -> str:
    """Raw-input twin of the LIDC crops pickle
    (consumed by unet_zoo_tpu.data.lidc.prepare_data)."""
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(num_cases):
        image, masks = _blob_case(rng, size, 4)
        data[i] = {
            "image": image,
            "masks": masks,
            "series_uid": f"subject_{i % num_subjects:03d}",
        }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def make_lidc_cache(
    path: str,
    num_per_split: Tuple[int, int, int] = (24, 8, 8),
    size: int = 128,
    seed: int = 0,
) -> str:
    """Directly write an HDF5 cache with the LIDC schema
    (groups train/val/test x images/labels/uids)."""
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for tt, n in zip(("train", "val", "test"), num_per_split):
            imgs, lbls, uids = [], [], []
            for i in range(n):
                image, masks = _blob_case(rng, size, 4)
                imgs.append(image.astype(np.float64) - 0.5)
                lbls.append(masks.transpose(1, 2, 0))
                uids.append(i)
            g = f.create_group(tt)
            g.create_dataset("images", data=np.asarray(imgs))
            g.create_dataset("labels", data=np.asarray(lbls, dtype=np.uint8))
            g.create_dataset("uids", data=np.asarray(uids, dtype=np.int64))
    return path


def make_uzh_cache(
    path: str,
    num_per_split: Tuple[int, int, int] = (24, 8, 8),
    size: int = 128,
    num_classes: int = 3,
    seed: int = 0,
) -> str:
    """HDF5 cache with the UZH prostate schema
    (images_/masks_/patient_id_{train,validation,test}; 6 annotators)."""
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for tt, n in zip(("train", "validation", "test"), num_per_split):
            imgs, msks = [], []
            for _ in range(n):
                image, masks = _blob_case(rng, size, 6)
                lbl = masks * rng.integers(1, num_classes, size=1).astype(np.uint8)
                imgs.append(image)
                msks.append(lbl.transpose(1, 2, 0))
            f.create_dataset(f"images_{tt}", data=np.asarray(imgs, dtype=np.float32))
            f.create_dataset(f"masks_{tt}", data=np.asarray(msks, dtype=np.uint8))
            f.create_dataset(
                f"patient_id_{tt}", data=np.arange(n, dtype=np.uint8)
            )
    return path


def make_brats_cache(
    path: str,
    num_per_split: Tuple[int, int] = (4, 2),
    size: Tuple[int, int, int] = (32, 32, 32),
    seed: int = 0,
    keep_offsets: bool = False,
) -> str:
    """HDF5 cache with the BraTS schema
    (images_/masks_/pids_{train,validation,test}; labels in {0,1,2,4}).
    ``keep_offsets`` additionally writes the crop-box/original-shape
    datasets the prediction-reassembly flow consumes (the schema
    data.brats.prepare_data(keep_offsets=True) produces)."""
    rng = np.random.default_rng(seed)
    d, h, w = size
    with h5py.File(path, "w") as f:
        for tt, n in zip(("train", "validation"), num_per_split):
            imgs = rng.standard_normal((n, d, h, w, 4)).astype(np.float32)
            masks = np.zeros((n, d, h, w), dtype=np.uint8)
            for i in range(n):
                cz, cy, cx = (rng.uniform(0.3, 0.7, 3) * np.array(size)).astype(int)
                r = int(0.2 * min(size))
                zz, yy, xx = np.mgrid[0:d, 0:h, 0:w]
                dist = np.sqrt((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
                masks[i][dist < r] = 1
                masks[i][dist < 0.6 * r] = 2
                masks[i][dist < 0.3 * r] = 4
            f.create_dataset(f"images_{tt}", data=imgs)
            f.create_dataset(f"masks_{tt}", data=masks)
            f.create_dataset(f"pids_{tt}", data=np.arange(n, dtype=np.int64))
            if keep_offsets:
                lo = rng.integers(0, 5, (n, 3)).astype(np.int64)
                hi = lo + np.asarray(size)  # crop box exactly grid-sized
                orig = hi + rng.integers(0, 4, (n, 3)).astype(np.int64)
                for j, nm in enumerate(("xOffsets", "yOffsets", "zOffsets")):
                    f.create_dataset(f"{nm}_{tt}", data=lo[:, j])
                f.create_dataset(f"cropHi_{tt}", data=hi)
                f.create_dataset(f"origShape_{tt}", data=orig)
        for name in ("images", "masks", "pids"):
            shape = {
                "images": (0, d, h, w, 4),
                "masks": (0, d, h, w),
                "pids": (0,),
            }[name]
            f.create_dataset(f"{name}_test", shape=shape)
    return path


def synthetic_lidc(
    tmpdir: str,
    annotator_range=None,
    num_per_split=(24, 8, 8),
    size: int = 128,
    seed: int = 0,
):
    """One-call LIDCData over a synthetic cache (test/bench fixture)."""
    from unet_zoo_tpu.data.lidc import LIDCData

    path = os.path.join(tmpdir, f"synthetic_lidc_{size}.hdf5")
    if not os.path.exists(path):
        make_lidc_cache(path, num_per_split=num_per_split, size=size, seed=seed)
    return LIDCData(h5py.File(path, "r"), annotator_range=annotator_range, seed=seed)
