"""LIDC-IDRI lung-nodule dataset: pickle -> HDF5 cache -> BatchProviders.

Capability twin of reference data/lidc_data_loader.py:16-136 and
data/lidc_data.py:9-53. The raw input is the public LIDC crops pickle
(dict: key -> {'image': 128x128 float, 'masks': 4x128x128, 'series_uid'}).

Preprocessing semantics preserved:
* subject-level split by series_uid: 80/20 test, then 80/20 of the
  remainder for val => 64/16/20 (reference lidc_data_loader.py:72-73);
* images stored as float with a -0.5 offset (reference :92);
* labels transposed to (H, W, 4 graders) uint8 (reference :94-97);
* HDF5 groups train/val/test each with 'images'/'labels'/'uids'.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Optional, Sequence

import h5py
import numpy as np
from sklearn.model_selection import train_test_split

from unet_zoo_tpu.data.batch_provider import BatchProvider

log = logging.getLogger(__name__)


def prepare_data(input_file: str, output_file: str, seed: Optional[int] = None):
    """Build the HDF5 cache from the raw LIDC pickle
    (reference data/lidc_data_loader.py:46-106)."""
    with open(input_file, "rb") as f:
        data = pickle.load(f)

    series_uid = [v["series_uid"] for v in data.values()]
    unique_subjects = np.unique(series_uid)

    split_ids = {}
    train_and_val, split_ids["test"] = train_test_split(
        unique_subjects, test_size=0.2, random_state=seed
    )
    split_ids["train"], split_ids["val"] = train_test_split(
        train_and_val, test_size=0.2, random_state=seed
    )
    subset_of = {}
    for tt, ids in split_ids.items():
        for sid in ids:
            subset_of[sid] = tt

    images = {tt: [] for tt in split_ids}
    labels = {tt: [] for tt in split_ids}
    uids = {tt: [] for tt in split_ids}
    for value in data.values():
        tt = subset_of[value["series_uid"]]
        images[tt].append(value["image"].astype(np.float64) - 0.5)
        lbl = np.asarray(value["masks"]).transpose((1, 2, 0))  # (H, W, graders)
        labels[tt].append(lbl)
        uids[tt].append(hash(value["series_uid"]))

    with h5py.File(output_file, "w") as f:
        for tt in split_ids:
            g = f.create_group(tt)
            g.create_dataset("uids", data=np.asarray(uids[tt], dtype=np.int64))
            g.create_dataset("labels", data=np.asarray(labels[tt], dtype=np.uint8))
            g.create_dataset("images", data=np.asarray(images[tt], dtype=np.float64))
    log.info("wrote LIDC cache to %s", output_file)


def load_and_maybe_process_data(
    input_file: str, preprocessing_folder: str, force_overwrite: bool = False
) -> h5py.File:
    """Lazy cache build (reference data/lidc_data_loader.py:109-136)."""
    os.makedirs(preprocessing_folder, exist_ok=True)
    path = os.path.join(preprocessing_folder, "data_lidc.hdf5")
    if not os.path.exists(path) or force_overwrite:
        prepare_data(input_file, path)
    return h5py.File(path, "r")


class LIDCData:
    """Train/validation/test BatchProviders over the LIDC cache
    (reference data/lidc_data.py:9-53).

    `annotator_range` defaults to all 4 graders (reference
    data/lidc_data.py:31-32 backward-compat patch).
    """

    NUM_LABELS_PER_SUBJECT = 4

    def __init__(
        self,
        data_file: h5py.File,
        annotator_range: Optional[Sequence[int]] = None,
        resize_to=None,
        seed: Optional[int] = None,
        loader: str = "h5py",
        batch_size: Optional[int] = None,
    ):
        """``loader="native"`` serves the TRAIN split through the C++ mmap
        store (native/store.py): same sampling semantics and RNG stream as
        the h5py provider (bit-identical batches at equal seed, pinned by
        tests/test_native.py), records gathered one batch ahead on a thread
        pool instead of the reference's blocking h5py read
        (data/batch_provider.py:58-59). Requires ``batch_size`` (the
        prefetch pipeline is fixed-size); val/test stay h5py — eval reads
        raw arrays."""
        self.data = data_file
        ar = (
            list(annotator_range)
            if annotator_range is not None
            else list(range(self.NUM_LABELS_PER_SUBJECT))
        )
        rng = np.random.default_rng(seed)

        def provider(tt):
            d = self.data[tt]
            return BatchProvider(
                d["images"],
                d["labels"],
                np.arange(d["images"].shape[0]),
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
                images="train/images",
                labels="train/labels",
                add_dummy_dimension=True,
                num_labels_per_subject=self.NUM_LABELS_PER_SUBJECT,
                annotator_range=ar,
                rng=rng,
            )
        else:
            self.train = provider("train")
        self.validation = provider("val")
        self.test = provider("test")
        # raw array access for eval-all-graders (reference lidc_data.py:49-53)
        self.test.images = self.data["test"]["images"]
        self.test.labels = self.data["test"]["labels"]
        self.validation.images = self.data["val"]["images"]
        self.validation.labels = self.data["val"]["labels"]

    @classmethod
    def from_config(cls, sys_config, exp_config) -> "LIDCData":
        f = load_and_maybe_process_data(
            input_file=sys_config.data_root,
            preprocessing_folder=sys_config.preproc_folder,
        )
        return cls(
            f,
            annotator_range=getattr(exp_config, "annotator_range", None),
            resize_to=getattr(exp_config, "resize_to", None),
            seed=getattr(exp_config, "data_seed", None),
            loader=getattr(exp_config, "loader", "h5py"),
            batch_size=getattr(exp_config, "batch_size", None),
        )
