"""Post-processing / intensity utilities.

Twins of the reference BratsProcessing helpers
(reference data/BratsProcessing/utils.py:19-251) and misc image utils
(reference utils.py:104-127, 279-334), without the skimage dependency
(connected components via scipy.ndimage.label).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def map_image_to_intensity_range(
    image: np.ndarray, min_o: float, max_o: float, percentiles: float = 0.0
) -> np.ndarray:
    """Linearly map intensities to [min_o, max_o], optionally clipping
    the given percentile tails (reference BratsProcessing/utils.py:106-126)."""
    img = image.astype(np.float32)
    if percentiles > 0:
        min_i = np.percentile(img, percentiles)
        max_i = np.percentile(img, 100 - percentiles)
    else:
        min_i, max_i = img.min(), img.max()
    img = np.clip(img, min_i, max_i)
    rng = max(max_i - min_i, 1e-8)
    return (img - min_i) / rng * (max_o - min_o) + min_o


def normalise_image(image: np.ndarray) -> np.ndarray:
    """Zero mean / unit std (reference utils.py:106-112)."""
    img = image.astype(np.float32)
    return (img - img.mean()) / max(float(img.std()), 1e-8)


def normalise_images(images: np.ndarray) -> np.ndarray:
    """Per-image normalization over a batch (reference utils.py:115-127)."""
    return np.stack([normalise_image(images[i]) for i in range(images.shape[0])])


def keep_largest_connected_components(mask: np.ndarray) -> np.ndarray:
    """Keep, per foreground label, only its largest connected component
    (reference BratsProcessing/utils.py:128-149)."""
    out = np.zeros_like(mask)
    for lbl in np.unique(mask):
        if lbl == 0:
            continue
        binary = mask == lbl
        labeled, n = ndimage.label(binary)
        if n == 0:
            continue
        sizes = ndimage.sum(binary, labeled, range(1, n + 1))
        largest = 1 + int(np.argmax(sizes))
        out[labeled == largest] = lbl
    return out


def convert_to_onehot(labels: np.ndarray, nlabels: int) -> np.ndarray:
    """Integer label map -> channel-LAST one-hot (reference utils.py:279-284,
    which is HWC; the torch CHW variants at :289-311 are layout-specific and
    unnecessary in an NHWC framework)."""
    return np.eye(nlabels, dtype=np.float32)[labels.astype(np.int64)]


def l2_regularisation(params) -> float:
    """Sum of 2-NORMS (not squared) of all leaves — the reference's exact
    convention (reference utils.py:93-101)."""
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sqrt(jnp.sum(jnp.square(w.astype(jnp.float32))))
        for w in jax.tree_util.tree_leaves(params)
    )


def convert_to_uint8(image: np.ndarray) -> np.ndarray:
    """Min-max map to [0, 255] uint8 (reference
    data/BratsProcessing/utils.py:164-167)."""
    image = image - image.min()
    image = 255.0 * np.divide(image.astype(np.float32), image.max())
    return image.astype(np.uint8)


def norm_l2(a: np.ndarray, v: np.ndarray) -> float:
    """Debug helper faithfully mirroring reference
    data/BratsProcessing/utils.py:101-110 (including its unusual
    normalize-then-RMS-combine formula)."""
    a = a.flatten()
    v = v.flatten()
    a = (a - np.mean(a)) / (np.std(a) * len(a))
    v = (v - np.mean(v)) / np.std(v)
    return float(np.mean(np.sqrt(a**2 + v**2)))


def tile_batch_for_display(batch: np.ndarray) -> np.ndarray:
    """(B, H, W[, 1]) -> (H, B*W) horizontal strip, the layout the
    reference's matplotlib debug viewer builds (utils.py:250-268
    ``show_tensor``; display itself is left to the caller —
    ``plt.imshow(tile_batch_for_display(x), cmap='Greys_r')``)."""
    batch = np.asarray(batch)
    if batch.ndim == 4:  # drop a trailing channel dim (NHWC, C=1)
        batch = batch.reshape(batch.shape[0], batch.shape[1], batch.shape[2])
    return np.concatenate(list(batch), axis=1)
