"""Host-side minibatch sampling over HDF5/ndarray datasets.

Capability twin of the reference BatchProvider
(reference data/batch_provider.py:12-137) with the TPU split of labor:
the host does *only* index sampling, HDF5 reads, annotator selection and
layout (cheap, IO-bound); normalization and augmentation run on device
inside the jitted step (see unet_zoo_tpu.data.augment) so the input
pipeline cannot bottleneck the chip.

Semantics preserved from the reference:
* sampling WITHOUT replacement across batches — every example is seen
  before any repeats (reference batch_provider.py:43-57);
* batch indices sorted ascending for h5py fancy indexing (:55-57);
* a random annotator chosen per example among `annotator_range`
  (reference batch_provider.py:131-137);
* `iterate_batches` epoch iterator incl. the ragged final batch (:69-96);
* optional nearest-neighbor `resize_to` zoom (:99-103, scipy order=0);
* channel dim appended for single-channel data — but channel-LAST (NHWC,
  the TPU layout) where the reference inserts channel-first (:127-128).

Behavioral quirk decision: the reference computes `normalise_images` and
DISCARDS the result (reference batch_provider.py:117-118 — no assignment),
so images pass through unnormalized. We default `normalise=False` to match;
`normalise=True` enables the per-image zero-mean/unit-std the reference
intended.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
from scipy.ndimage import zoom


def resize_batch(imgs: np.ndarray, target_size: Sequence[int]) -> np.ndarray:
    """Nearest-neighbor batch resize (reference data/batch_provider.py:12-16)."""
    factors = (1.0,) + tuple(
        float(t) / s for t, s in zip(target_size, imgs.shape[1 : 1 + len(target_size)])
    )
    factors = factors + (1.0,) * (imgs.ndim - len(factors))
    return zoom(imgs, factors, order=0)


def normalise_images(imgs: np.ndarray) -> np.ndarray:
    """Per-image zero-mean / unit-std (reference utils.py:115-127)."""
    out = np.empty_like(imgs, dtype=np.float32)
    for i in range(imgs.shape[0]):
        img = imgs[i].astype(np.float32)
        std = img.std()
        out[i] = (img - img.mean()) / max(std, 1e-8)
    return out


class BatchProvider:
    """Random without-replacement minibatches over (X, y) arrays or h5py
    datasets.

    Parameters mirror the reference's kwargs (data/batch_provider.py:23-41).
    `rng` makes sampling reproducible (the reference uses the global
    np.random state).
    """

    def __init__(
        self,
        X,
        y,
        indices: np.ndarray,
        add_dummy_dimension: bool = False,
        num_labels_per_subject: int = 1,
        annotator_range: Optional[Sequence[int]] = None,
        resize_to: Optional[Sequence[int]] = None,
        normalise: bool = False,
        rescale_range: Optional[Sequence[float]] = None,
        rescale_rgb: bool = False,
        rng: Optional[np.random.Generator] = None,
    ):
        self.X = X
        self.y = y
        self.indices = np.asarray(indices)
        self.unused_indices = self.indices.copy()
        self.add_dummy_dimension = add_dummy_dimension
        self.num_labels_per_subject = num_labels_per_subject
        self.annotator_range = (
            list(annotator_range)
            if annotator_range is not None
            else list(range(num_labels_per_subject))
        )
        self.resize_to = resize_to
        # reference: normalise unless rescale_range given (batch_provider.py:41)
        self.normalise = normalise and rescale_range is None
        self.rescale_range = rescale_range
        self.rescale_rgb = rescale_rgb
        self.rng = rng if rng is not None else np.random.default_rng()

    # -- reference API -------------------------------------------------

    def next_batch(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """One random batch, sampled without replacement across calls
        (reference data/batch_provider.py:43-67)."""
        if len(self.unused_indices) < batch_size:
            self.unused_indices = self.indices
        batch_indices = self.rng.choice(self.unused_indices, batch_size, replace=False)
        self.unused_indices = np.setdiff1d(self.unused_indices, batch_indices)
        batch_indices = np.sort(batch_indices)  # h5py requires increasing order
        return self._load(batch_indices)

    def iterate_batches(
        self, batch_size: int, shuffle: bool = True
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Epoch iterator (reference data/batch_provider.py:69-96)."""
        idx = self.indices.copy()
        if shuffle:
            self.rng.shuffle(idx)
        for b in range(0, len(idx), batch_size):
            yield self._load(np.sort(idx[b : b + batch_size]))

    # -- internals -----------------------------------------------------

    def _load(self, batch_indices: np.ndarray):
        X_batch = self.X[batch_indices, ...]
        y_batch = self.y[batch_indices, ...]
        if self.num_labels_per_subject > 1:
            y_batch = self._select_random_label(y_batch)
        return self._post_process(
            np.asarray(X_batch, dtype=np.float32), np.asarray(y_batch)
        )

    def _select_random_label(self, labels: np.ndarray) -> np.ndarray:
        """Pick one annotator per example (reference batch_provider.py:131-137).
        Annotator axis is LAST (LIDC stores labels HxWx4, lidc_data_loader.py:94-97)."""
        picks = self.rng.choice(self.annotator_range, size=labels.shape[0])
        return np.stack(
            [labels[i, ..., a] for i, a in enumerate(picks)], axis=0
        )

    def _post_process(self, X_batch, y_batch):
        if self.resize_to:
            X_batch = resize_batch(X_batch, self.resize_to)
            if y_batch.ndim > 1:
                y_batch = resize_batch(y_batch, self.resize_to)
        if self.normalise:
            X_batch = normalise_images(X_batch)
        if self.rescale_rgb:
            # uint8 RGB -> [-1, 1] (reference batch_provider.py:120-121)
            X_batch = X_batch.astype(np.float32) / 127.5 - 1.0
        if self.rescale_range is not None:
            # map to [lo, hi] per image (reference batch_provider.py:123-124)
            from unet_zoo_tpu.utils.postprocess import map_image_to_intensity_range

            lo, hi = self.rescale_range
            X_batch = np.stack(
                [
                    map_image_to_intensity_range(X_batch[i], lo, hi)
                    for i in range(X_batch.shape[0])
                ]
            )
        if self.add_dummy_dimension:
            X_batch = np.expand_dims(X_batch, axis=-1)  # NHWC (TPU layout)
        return X_batch, y_batch.astype(np.int32)
