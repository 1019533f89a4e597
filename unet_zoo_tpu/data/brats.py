"""BraTS 2018 volumetric dataset: NIfTI -> HDF5 cache -> volume batches.

Capability twin of reference data/BratsProcessing/brats18_data_loader.py,
brats18_validation_data_loader.py and data/bratsDataset.py:9-141.

Preprocessing semantics preserved:
* 4 modalities stacked channel-last in order (t1, t1ce, t2, flair)
  (reference brats18_data_loader.py:131-168);
* nonzero bounding-box crop over all dims (`crop_volume_allDim`,
  reference :42-54);
* zero-pixel-preserving standardization: mean/std over nonzero voxels per
  channel, zeros stay zero (reference :31-39);
* centre crop-or-pad to the target size, default 128^3 (reference :56-96);
* patient-id-mod split (reference :22-29 — note ids %10 in {6,7} go to
  validation and everything else to train; the published "test" ids
  branch is unreachable, reproduced faithfully);
* evaluation one-hot WT/TC/ET: (l!=0, l!=0 & l!=2, l==4)
  (reference bratsDataset.py:125-131);
* the validation-set variant records crop offsets for reassembly
  (reference brats18_validation_data_loader.py:24-51).

Volumes are stored (D, H, W, C); the model consumes NDHWC directly.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional, Tuple

import h5py
import numpy as np
from scipy.ndimage import zoom as _zoom

from unet_zoo_tpu.utils.nii import load_nii

log = logging.getLogger(__name__)

MODALITIES = ("t1", "t1ce", "t2", "flair")


def test_train_val_split(patient_id: int) -> str:
    """Reference brats18_data_loader.py:22-29 (faithful: never 'test')."""
    if patient_id % 10 >= 8:
        return "train"
    if patient_id % 10 >= 6:
        return "validation"
    return "train"


def normalise_image(image: np.ndarray) -> np.ndarray:
    """Standardize on nonzero voxels per channel; zeros stay zero
    (reference brats18_data_loader.py:31-39)."""
    img = image.astype(np.float32)
    nz = img != 0
    out = np.zeros_like(img)
    for c in range(img.shape[-1]):
        ch = img[..., c]
        m = ch[nz[..., c]]
        if m.size == 0:
            continue
        out[..., c] = np.where(
            nz[..., c], (ch - m.mean()) / max(float(m.std()), 1e-8), 0.0
        )
    return out


def crop_volume_all_dim(image: np.ndarray, mask: Optional[np.ndarray] = None):
    """Strip zero borders in all three spatial dims
    (reference brats18_data_loader.py:42-54)."""
    coords = np.argwhere(image > 0)
    lo = coords.min(axis=0)[:3]
    hi = coords.max(axis=0)[:3] + 1
    image = image[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2], :]
    if mask is not None:
        return image, mask[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
    return image, (lo, hi)


def crop_or_pad_volume(
    vol: np.ndarray, target: Tuple[int, int, int], channels: Optional[int] = None
) -> np.ndarray:
    """Centre crop-or-zero-pad to target 3D size
    (reference brats18_data_loader.py:56-96)."""
    shape = (
        tuple(target) + (channels,) if channels is not None else tuple(target)
    )
    out = np.zeros(shape, dtype=np.float32)
    src_sl, dst_sl = [], []
    for t, s in zip(target, vol.shape[:3]):
        d = abs(t - s) // 2
        if s >= t:
            src_sl.append(slice(d, d + t))
            dst_sl.append(slice(0, t))
        else:
            src_sl.append(slice(0, s))
            dst_sl.append(slice(d, d + s))
    out[tuple(dst_sl)] = vol[tuple(src_sl)]
    return out


def to_evaluation_onehot(labels: np.ndarray) -> np.ndarray:
    """WT/TC/ET channels (reference bratsDataset.py:125-131)."""
    out = np.zeros(labels.shape + (3,), dtype=np.float32)
    out[..., 0] = labels != 0
    out[..., 1] = (labels != 0) & (labels != 2)
    out[..., 2] = labels == 4
    return out


def reassemble_to_original(
    pred: np.ndarray,
    original_shape: Tuple[int, int, int],
    crop_lo: Tuple[int, int, int],
    crop_hi: Tuple[int, int, int],
) -> np.ndarray:
    """Place a prediction on the preprocessed (nonzero-cropped +
    centre-crop/padded) grid back into the original volume — the inverse of
    crop_volume_all_dim + crop_or_pad_volume, using the offsets the
    validation-set preprocessing records (reference
    brats18_validation_data_loader.py:24-51 keeps xOffsets/yOffsets/zOffsets
    for exactly this reassembly)."""
    out_shape = tuple(original_shape) + pred.shape[3:]
    out = np.zeros(out_shape, dtype=pred.dtype)
    src_sl, dst_sl = [], []
    for t, lo, hi in zip(pred.shape[:3], crop_lo, crop_hi):
        s = hi - lo
        d = abs(t - s) // 2
        if s <= t:  # prediction grid was padded; take its centre
            src_sl.append(slice(d, d + s))
            dst_sl.append(slice(lo, lo + s))
        else:  # cropped region was larger; prediction covers the centre
            src_sl.append(slice(0, t))
            dst_sl.append(slice(lo + d, lo + d + t))
    out[tuple(dst_sl)] = pred[tuple(src_sl)]
    return out


def prepare_data(
    input_folder: str,
    output_file: str,
    size: Tuple[int, int, int] = (128, 128, 128),
    target_resolution: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    keep_offsets: bool = False,
):
    """Build the HDF5 cache from raw BraTS folders (one folder per case
    containing <case>_<modality>.nii.gz and <case>_seg.nii.gz)."""
    vols = {"train": ([], [], []), "validation": ([], [], []), "test": ([], [], [])}
    offsets = {tt: [] for tt in vols}  # (lo, hi, original shape) per case

    case_dirs = sorted(
        d for d in glob.glob(os.path.join(input_folder, "*")) if os.path.isdir(d)
    )
    for i, case_dir in enumerate(case_dirs):
        case = os.path.basename(case_dir)
        pid = i
        tt = test_train_val_split(pid)

        channels = []
        for mod in MODALITIES:
            path = os.path.join(case_dir, f"{case}_{mod}.nii.gz")
            channels.append(load_nii(path)[0])
        img = np.stack(channels, axis=-1).astype(np.float32)
        seg_path = os.path.join(case_dir, f"{case}_seg.nii.gz")
        mask = (
            load_nii(seg_path)[0].astype(np.uint8)
            if os.path.exists(seg_path)
            else None
        )

        # nonzero crop box, computed up-front so (lo, hi, original shape)
        # can be recorded for prediction reassembly regardless of whether a
        # mask exists (the reference's validation loader records the same
        # offsets, brats18_validation_data_loader.py:39-51)
        orig_shape = np.asarray(img.shape[:3], dtype=np.int64)
        coords = np.argwhere(img > 0)
        lo = coords.min(axis=0)[:3]
        hi = coords.max(axis=0)[:3] + 1
        img = img[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2], :]
        if mask is not None:
            mask = mask[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
        offsets[tt].append((lo, hi, orig_shape))

        if tuple(target_resolution) != (1.0, 1.0, 1.0):
            factors = tuple(1.0 / r for r in target_resolution)
            img = _zoom(img, factors + (1.0,), order=1)
            if mask is not None:
                mask = _zoom(mask, factors, order=0)

        img = normalise_image(img)
        img = crop_or_pad_volume(img, size, channels=len(MODALITIES))
        if mask is not None:
            mask = crop_or_pad_volume(mask, size).astype(np.uint8)

        vols[tt][0].append(img)
        vols[tt][1].append(mask if mask is not None else np.zeros(size, np.uint8))
        vols[tt][2].append(pid)

    with h5py.File(output_file, "w") as f:
        for tt in vols:
            f.create_dataset(
                f"images_{tt}", data=np.asarray(vols[tt][0], dtype=np.float32)
            )
            f.create_dataset(
                f"masks_{tt}", data=np.asarray(vols[tt][1], dtype=np.uint8)
            )
            f.create_dataset(f"pids_{tt}", data=np.asarray(vols[tt][2], dtype=np.int64))
            if keep_offsets:
                lo_a = np.asarray([o[0] for o in offsets[tt]], np.int64).reshape(-1, 3)
                hi_a = np.asarray([o[1] for o in offsets[tt]], np.int64).reshape(-1, 3)
                sh_a = np.asarray([o[2] for o in offsets[tt]], np.int64).reshape(-1, 3)
                # reference-named per-axis lo offsets
                # (brats18_validation_data_loader.py:39-51) …
                for j, name in enumerate(("xOffsets", "yOffsets", "zOffsets")):
                    f.create_dataset(f"{name}_{tt}", data=lo_a[:, j])
                # … plus the crop box upper corner and the original volume
                # shape, which reassemble_to_original needs (the reference
                # hardcodes 240x240x155 instead)
                f.create_dataset(f"cropHi_{tt}", data=hi_a)
                f.create_dataset(f"origShape_{tt}", data=sh_a)
    log.info("wrote BraTS cache to %s", output_file)


def load_and_maybe_process_data(
    input_folder: str,
    preprocessing_folder: str,
    size: Tuple[int, int, int] = (128, 128, 128),
    force_overwrite: bool = False,
) -> h5py.File:
    os.makedirs(preprocessing_folder, exist_ok=True)
    path = os.path.join(
        preprocessing_folder,
        "data_brats18_%s.hdf5" % "x".join(str(i) for i in size),
    )
    if not os.path.exists(path) or force_overwrite:
        prepare_data(input_folder, path, size=size)
    return h5py.File(path, "r")


class _BratsSplit:
    """Provider-style view of one split: `next_batch` with the same
    without-replacement semantics as BatchProvider, plus raw `.images` /
    `.labels` access for evaluation loops."""

    def __init__(self, parent: "BratsData", mode: str):
        self._parent = parent
        self._mode = mode
        n = parent.num_examples(mode)
        self._indices = np.arange(n)
        self._unused = self._indices.copy()

    @property
    def images(self):
        return self._parent.data[f"images_{self._mode}"]

    @property
    def labels(self):
        return self._parent.data[f"masks_{self._mode}"]

    def next_batch(self, batch_size: int):
        rng = self._parent.rng
        if len(self._unused) < batch_size:
            self._unused = self._indices
        picks = rng.choice(self._unused, batch_size, replace=False)
        self._unused = np.setdiff1d(self._unused, picks)
        items = [self._parent.get(int(i), self._mode) for i in np.sort(picks)]
        return (
            np.stack([it[0] for it in items]),
            np.stack([it[1] for it in items]),
        )

    def iterate_batches(self, batch_size: int, shuffle: bool = True):
        idx = self._indices.copy()
        if shuffle:
            self._parent.rng.shuffle(idx)
        for b in range(0, len(idx), batch_size):
            items = [
                self._parent.get(int(i), self._mode)
                for i in np.sort(idx[b : b + batch_size])
            ]
            yield (
                np.stack([it[0] for it in items]),
                np.stack([it[1] for it in items]),
            )


class BratsData:
    """Volume-level access with lazy HDF5 reads and evaluation one-hot,
    the TPU twin of the torch BratsDataset (reference bratsDataset.py:9-141).
    Augmentation runs on device (unet_zoo_tpu.data.augment.augment_batch_3d),
    not here.
    """

    def __init__(
        self,
        data_file: h5py.File,
        random_crop: Optional[Tuple[int, int, int]] = None,
        seed: Optional[int] = None,
    ):
        self.data = data_file
        self.random_crop = random_crop
        self.rng = np.random.default_rng(seed)
        self.train = _BratsSplit(self, "train")
        self.validation = _BratsSplit(self, "validation")
        self.test = _BratsSplit(self, "test")

    def num_examples(self, mode: str = "train") -> int:
        return self.data[f"images_{mode}"].shape[0]

    def get(self, index: int, mode: str = "train", onehot: bool = True):
        """Returns (image (D,H,W,4) float32, labels (D,H,W,3) one-hot or
        (D,H,W) raw uint8, pid)."""
        image = np.asarray(self.data[f"images_{mode}"][index], dtype=np.float32)
        labels = np.asarray(self.data[f"masks_{mode}"][index])
        pid = int(self.data[f"pids_{mode}"][index])
        if onehot:
            labels = to_evaluation_onehot(labels)
        if self.random_crop is not None:
            cx, cy, cz = self.random_crop
            sx = self.rng.integers(0, image.shape[0] - cx + 1)
            sy = self.rng.integers(0, image.shape[1] - cy + 1)
            sz = self.rng.integers(0, image.shape[2] - cz + 1)
            image = image[sx : sx + cx, sy : sy + cy, sz : sz + cz]
            labels = labels[sx : sx + cx, sy : sy + cy, sz : sz + cz]
        return image, labels, pid

    def offsets(self, index: int, mode: str = "validation"):
        """(crop_lo, crop_hi, original_shape) for `reassemble_to_original`,
        or None when the cache was built without keep_offsets. lo comes from
        the reference-named xOffsets/yOffsets/zOffsets datasets
        (reference brats18_validation_data_loader.py:39-51)."""
        if f"cropHi_{mode}" not in self.data:
            return None
        lo = np.asarray(
            [self.data[f"{n}_{mode}"][index]
             for n in ("xOffsets", "yOffsets", "zOffsets")],
            dtype=np.int64,
        )
        hi = np.asarray(self.data[f"cropHi_{mode}"][index], dtype=np.int64)
        shape = np.asarray(self.data[f"origShape_{mode}"][index], dtype=np.int64)
        return lo, hi, shape

    def batch_iterator(self, batch_size: int, mode: str = "train", shuffle=True):
        """Yield (B, D, H, W, 4) image and (B, D, H, W, 3) one-hot batches."""
        n = self.num_examples(mode)
        idx = np.arange(n)
        if shuffle:
            self.rng.shuffle(idx)
        for b in range(0, n, batch_size):
            items = [self.get(int(i), mode) for i in idx[b : b + batch_size]]
            yield (
                np.stack([it[0] for it in items]),
                np.stack([it[1] for it in items]),
                [it[2] for it in items],
            )

    @classmethod
    def from_config(cls, sys_config, exp_config) -> "BratsData":
        f = load_and_maybe_process_data(
            input_folder=sys_config.brats_root,
            preprocessing_folder=sys_config.preproc_folder,
            size=tuple(getattr(exp_config, "image_size", (128, 128, 128))[:3]),
        )
        return cls(
            f,
            random_crop=getattr(exp_config, "random_crop", None),
            seed=getattr(exp_config, "data_seed", None),
        )
