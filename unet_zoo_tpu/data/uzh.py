"""UZH prostate MR dataset: NIfTI -> HDF5 cache -> BatchProviders.

Capability twin of reference data/uzh_prostate_data_loader.py:23-302 and
data/uzh_prostate_data.py:10-75 (plus the .mat variant, data/uzh_data.py:73-118).

Preprocessing semantics preserved:
* 6 expert annotations per case (reference uzh_prostate_data_loader.py:57);
* patient-id-mod split: id%5==0 -> test, id%4==0 -> validation, else train
  (reference :81-86); case 9 skipped (:66-68);
* per-slice linear rescale of the image (order 1) / nearest for masks
  (order 0) from the native pixel size to `target_resolution`, then centre
  crop-or-pad to `size` (reference :165-186);
* image normalized per volume to zero mean / unit std before slicing
  (reference :157 via utils.normalise_image);
* label 3 (seminal vesicles) removed -> 0 (reference :189);
* HDF5 datasets images_/masks_{train,validation,test} with the annotator
  axis LAST: (N, H, W, 6).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional, Sequence, Tuple

import h5py
import numpy as np
from scipy.ndimage import zoom as _zoom

from unet_zoo_tpu.data.batch_provider import BatchProvider
from unet_zoo_tpu.utils.nii import load_nii

log = logging.getLogger(__name__)

EXPERT_LIST = (
    "Readings_AH",
    "Readings_EK",
    "Readings_KC",
    "Readings_KS",
    "Readings_OD",
    "Readings_UM",
)


def crop_or_pad_slice_to_size(sl: np.ndarray, nx: int, ny: int) -> np.ndarray:
    """Centre crop-or-zero-pad the leading two axes
    (reference uzh_prostate_data_loader.py:24-49)."""
    x, y = sl.shape[:2]
    x_s, y_s = (x - nx) // 2, (y - ny) // 2
    x_c, y_c = (nx - x) // 2, (ny - y) // 2
    if x >= nx and y >= ny:
        return sl[x_s : x_s + nx, y_s : y_s + ny, ...]
    out_shape = (nx, ny) + sl.shape[2:]
    out = np.zeros(out_shape, dtype=sl.dtype)
    if x < nx and y >= ny:
        out[x_c : x_c + x, :, ...] = sl[:, y_s : y_s + ny, ...]
    elif x >= nx and y < ny:
        out[:, y_c : y_c + y, ...] = sl[x_s : x_s + nx, :, ...]
    else:
        out[x_c : x_c + x, y_c : y_c + y, ...] = sl
    return out


def normalise_image(image: np.ndarray) -> np.ndarray:
    """Zero mean / unit std (reference utils.py:106-112)."""
    img = image.astype(np.float32)
    return (img - img.mean()) / max(float(img.std()), 1e-8)


def _rescale_slice(sl: np.ndarray, scale_vector, order: int) -> np.ndarray:
    """skimage.transform.rescale twin via scipy zoom (preserve_range)."""
    factors = tuple(scale_vector) + (1.0,) * (sl.ndim - len(scale_vector))
    return _zoom(sl, factors, order=order)


def split_for_patient(patient_id: int) -> str:
    """Reference uzh_prostate_data_loader.py:81-86."""
    if patient_id % 5 == 0:
        return "test"
    if patient_id % 4 == 0:
        return "validation"
    return "train"


def prepare_data(
    input_image_folder: str,
    input_mask_folder: str,
    output_file: str,
    size: Tuple[int, int],
    target_resolution: Tuple[float, float],
):
    """Build the HDF5 cache from raw NIfTI folders
    (reference uzh_prostate_data_loader.py:51-247). Expects per-case folders
    `888<id>/t2_tse_tra.nii.gz` and per-expert mask folders."""
    nx, ny = size
    slices = {"train": ([], []), "validation": ([], []), "test": ([], [])}
    pids = {"train": [], "validation": [], "test": []}

    for folder in sorted(os.listdir(input_image_folder)):
        folder_path = os.path.join(input_image_folder, folder)
        if not (os.path.isdir(folder_path) and folder.startswith("888")):
            continue
        patient_id = int(folder[3:])
        if patient_id == 9:  # wrong-dimension annotation (reference :66-68)
            log.warning("skipping case 9 (bad annotation dims)")
            continue
        tt = split_for_patient(patient_id)

        img, _, header = load_nii(os.path.join(folder_path, "t2_tse_tra.nii.gz"))
        masks = []
        for exp in EXPERT_LIST:
            pat = os.path.join(
                input_mask_folder, exp, f"*{str(patient_id).zfill(4)}_*.nii.gz"
            )
            files = glob.glob(pat)
            assert len(files) == 1, f"glob {pat} matched {len(files)} files"
            masks.append(load_nii(files[0])[0])
        masks_arr = np.asarray(masks).transpose((1, 2, 3, 0))  # (X, Y, Z, expert)

        img = normalise_image(img)
        pixdim = header.structarr["pixdim"]
        scale_vector = [
            pixdim[1] / target_resolution[0],
            pixdim[2] / target_resolution[1],
        ]

        for zz in range(img.shape[2]):
            sl = _rescale_slice(np.squeeze(img[:, :, zz]), scale_vector, order=1)
            ms = _rescale_slice(np.squeeze(masks_arr[:, :, zz, :]), scale_vector, order=0)
            sl = crop_or_pad_slice_to_size(sl, nx, ny)
            ms = crop_or_pad_slice_to_size(ms, nx, ny)
            ms[ms == 3] = 0  # remove seminal vesicles (reference :189)
            slices[tt][0].append(sl.astype(np.float32))
            slices[tt][1].append(ms.astype(np.uint8))
            pids[tt].append(patient_id)

    with h5py.File(output_file, "w") as f:
        for tt in slices:
            f.create_dataset(f"images_{tt}", data=np.asarray(slices[tt][0]))
            f.create_dataset(f"masks_{tt}", data=np.asarray(slices[tt][1]))
            f.create_dataset(
                f"patient_id_{tt}", data=np.asarray(pids[tt], dtype=np.uint8)
            )
    log.info("wrote UZH prostate cache to %s", output_file)


def load_and_maybe_process_data(
    input_image_folder: str,
    input_mask_folder: str,
    preprocessing_folder: str,
    size: Tuple[int, int],
    target_resolution: Tuple[float, float],
    force_overwrite: bool = False,
) -> h5py.File:
    os.makedirs(preprocessing_folder, exist_ok=True)
    name = "data_uzh_prostate_%s_%s.hdf5" % (
        "x".join(str(i) for i in size),
        "x".join(str(i) for i in target_resolution),
    )
    path = os.path.join(preprocessing_folder, name)
    if not os.path.exists(path) or force_overwrite:
        prepare_data(
            input_image_folder, input_mask_folder, path, size, target_resolution
        )
    return h5py.File(path, "r")


class UZHProstateData:
    """Train/validation/test BatchProviders over the UZH cache
    (reference data/uzh_prostate_data.py:10-75)."""

    NUM_LABELS_PER_SUBJECT = len(EXPERT_LIST)

    def __init__(
        self,
        data_file: h5py.File,
        annotator_range: Optional[Sequence[int]] = None,
        resize_to=None,
        seed: Optional[int] = None,
        loader: str = "h5py",
        batch_size: Optional[int] = None,
    ):
        """``loader="native"`` serves the train split through the C++ mmap
        store (native/store.py train_provider_from_h5) — see LIDCData."""
        self.data = data_file
        ar = (
            list(annotator_range)
            if annotator_range is not None
            else list(range(self.NUM_LABELS_PER_SUBJECT))
        )
        rng = np.random.default_rng(seed)

        def provider(tt):
            imgs = self.data[f"images_{tt}"]
            msks = self.data[f"masks_{tt}"]
            return BatchProvider(
                imgs,
                msks,
                np.arange(imgs.shape[0]),
                add_dummy_dimension=True,
                num_labels_per_subject=self.NUM_LABELS_PER_SUBJECT,
                annotator_range=ar,
                resize_to=resize_to,
                rng=rng,
            )

        if loader == "native":
            from unet_zoo_tpu.native.store import train_provider_from_h5

            if resize_to:
                raise ValueError("loader='native' does not support resize_to")
            if batch_size is None:
                raise ValueError("loader='native' requires batch_size")
            self.train = train_provider_from_h5(
                self.data,
                batch_size,
                images="images_train",
                labels="masks_train",
                add_dummy_dimension=True,
                num_labels_per_subject=self.NUM_LABELS_PER_SUBJECT,
                annotator_range=ar,
                rng=rng,
            )
        else:
            self.train = provider("train")
        self.validation = provider("validation")
        self.test = provider("test")
        self.test.images = self.data["images_test"]
        self.test.labels = self.data["masks_test"]
        self.validation.images = self.data["images_validation"]
        self.validation.labels = self.data["masks_validation"]

    @classmethod
    def from_config(cls, sys_config, exp_config) -> "UZHProstateData":
        f = load_and_maybe_process_data(
            input_image_folder=sys_config.uzh_input_image_folder,
            input_mask_folder=sys_config.uzh_input_mask_folder,
            preprocessing_folder=sys_config.uzh_preproc_folder,
            size=tuple(exp_config.image_size[:2]),
            target_resolution=tuple(exp_config.target_resolution),
        )
        return cls(
            f,
            annotator_range=getattr(exp_config, "annotator_range", None),
            seed=getattr(exp_config, "data_seed", None),
            loader=getattr(exp_config, "loader", "h5py"),
            batch_size=getattr(exp_config, "batch_size", None),
        )


class UZHMatData:
    """The scipy.io `.mat` variant (reference data/uzh_data.py:73-118):
    a single `prostate_original` array; the last 150 slices become
    validation (100) and test (50)."""

    NUM_LABELS_PER_SUBJECT = len(EXPERT_LIST)

    def __init__(
        self,
        mat_path: str,
        annotator_range: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
    ):
        from scipy.io import loadmat

        mat = loadmat(mat_path)
        images = np.asarray(mat["images"], dtype=np.float32)
        labels = np.asarray(mat["labels"], dtype=np.uint8)
        n = images.shape[0]
        idx_train = np.arange(0, n - 150)
        idx_val = np.arange(n - 150, n - 50)
        idx_test = np.arange(n - 50, n)
        ar = (
            list(annotator_range)
            if annotator_range is not None
            else list(range(self.NUM_LABELS_PER_SUBJECT))
        )
        rng = np.random.default_rng(seed)

        def provider(idx):
            return BatchProvider(
                images,
                labels,
                idx,
                add_dummy_dimension=True,
                num_labels_per_subject=labels.shape[-1] if labels.ndim == 4 else 1,
                annotator_range=ar,
                rng=rng,
            )

        self.train = provider(idx_train)
        self.validation = provider(idx_val)
        self.test = provider(idx_test)
        self.test.images = images[idx_test]
        self.test.labels = labels[idx_test]
        self.validation.images = images[idx_val]
        self.validation.labels = labels[idx_val]
