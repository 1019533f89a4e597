"""Host-side (cv2) augmentation — the reference's exact pipeline, threaded.

TPU gathers make arbitrary-coordinate warps expensive on device (measured:
augmentation dominates the train step). This module provides the
alternative: the reference's cv2 augmentation chain
(reference data/batch_provider.py:140-272, utils.py:12-66) executed on the
host in a thread pool (cv2 releases the GIL), designed to run inside a
prefetching loader so it overlaps with device compute entirely.

Select per experiment with ``augment_on="host"`` (default "device").
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import numpy as np

from unet_zoo_tpu.data.augment import AugmentOptions

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def host_augmentation_available() -> bool:
    return cv2 is not None


def _rotate(img, angle, interp):
    rows, cols = img.shape[:2]
    m = cv2.getRotationMatrix2D((cols / 2, rows / 2), angle, 1)
    return cv2.warpAffine(img, m, (cols, rows), flags=interp)


def _warp_onehot(lbl, warp_fn, nlabels):
    """Bilinear interpolation of the one-hot encoding then argmax
    (reference utils.py:24-37 for <= 4 labels)."""
    oh = np.eye(nlabels, dtype=np.float32)[lbl.astype(np.int64)]
    warped = warp_fn(oh)
    if warped.ndim == 2:  # cv2 squeezes single channel
        warped = warped[..., None]
    return np.argmax(warped, axis=-1).astype(lbl.dtype)


def _augment_one(img, lbl, opts: AugmentOptions, seed: int):
    rng = np.random.default_rng(seed)
    img = np.ascontiguousarray(img.astype(np.float32))
    lbl = np.ascontiguousarray(lbl)
    n_y, n_x = img.shape[:2]
    use_onehot = opts.label_interp == "onehot_linear" and opts.nlabels <= 4
    lbl_interp = cv2.INTER_NEAREST

    if rng.integers(0, opts.augment_every_nth) == 0:
        if opts.do_rotations:
            angle = rng.uniform(-opts.rot_degrees, opts.rot_degrees)
            img = _rotate(img, angle, cv2.INTER_LINEAR)
            if use_onehot:
                lbl = _warp_onehot(
                    lbl, lambda oh: _rotate(oh, angle, cv2.INTER_LINEAR),
                    opts.nlabels,
                )
            else:
                lbl = _rotate(lbl, angle, lbl_interp)

        if opts.do_scaleaug:
            # square side r ~ U{n-offset..n}, uniform corner
            # (reference batch_provider.py:213-222)
            r = int(rng.integers(n_y - opts.offset, n_y + 1))
            p_x = int(rng.integers(0, n_x - r + 1))
            p_y = int(rng.integers(0, n_y - r + 1))
            crop = img[p_y : p_y + r, p_x : p_x + r]
            img = cv2.resize(crop, (n_x, n_y), interpolation=cv2.INTER_LINEAR)
            lcrop = lbl[p_y : p_y + r, p_x : p_x + r]
            if use_onehot:
                lbl = _warp_onehot(
                    lcrop,
                    lambda oh: cv2.resize(oh, (n_x, n_y), interpolation=cv2.INTER_LINEAR),
                    opts.nlabels,
                )
            else:
                lbl = cv2.resize(lcrop, (n_x, n_y), interpolation=lbl_interp)

        if opts.do_elasticaug:
            # 3x3 N(0, sigma) coarse grids, bicubic upsample, remap
            # (reference batch_provider.py:230-242)
            dx = cv2.resize(
                rng.normal(0, opts.elastic_sigma, (3, 3)).astype(np.float32),
                (n_x, n_y), interpolation=cv2.INTER_CUBIC,
            )
            dy = cv2.resize(
                rng.normal(0, opts.elastic_sigma, (3, 3)).astype(np.float32),
                (n_x, n_y), interpolation=cv2.INTER_CUBIC,
            )
            gx, gy = np.meshgrid(
                np.arange(n_x, dtype=np.float32), np.arange(n_y, dtype=np.float32)
            )
            mx, my = gx + dx, gy + dy
            img = cv2.remap(img, mx, my, interpolation=cv2.INTER_LINEAR)
            if use_onehot:
                lbl = _warp_onehot(
                    lbl,
                    lambda oh: cv2.remap(oh, mx, my, interpolation=cv2.INTER_LINEAR),
                    opts.nlabels,
                )
            else:
                lbl = cv2.remap(lbl, mx, my, interpolation=lbl_interp)

    p_flip = max(2, opts.augment_every_nth)
    if opts.do_fliplr and rng.integers(0, p_flip) == 0:
        img, lbl = np.fliplr(img), np.fliplr(lbl)
    if opts.do_flipud and rng.integers(0, p_flip) == 0:
        img, lbl = np.flipud(img), np.flipud(lbl)
    return np.ascontiguousarray(img), np.ascontiguousarray(lbl)


_POOL: Optional[ThreadPoolExecutor] = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=8)
    return _POOL


def augment_batch_host(
    images: np.ndarray,
    labels: np.ndarray,
    opts: AugmentOptions,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """images: (B, H, W) or (B, H, W, 1) float; labels: (B, H, W) int.
    Per-image cv2 augmentation on a thread pool (cv2 releases the GIL)."""
    assert cv2 is not None, "cv2 unavailable; use device augmentation"
    squeeze = images.ndim == 4
    imgs = images[..., 0] if squeeze else images
    seed_root = int(rng.integers(0, 2**31)) if rng is not None else 0
    results = list(
        _pool().map(
            lambda i: _augment_one(imgs[i], labels[i], opts, seed_root + i),
            range(imgs.shape[0]),
        )
    )
    out_i = np.stack([r[0] for r in results])
    out_l = np.stack([r[1] for r in results])
    if squeeze:
        out_i = out_i[..., None]
    return out_i.astype(images.dtype), out_l.astype(labels.dtype)


class PrefetchingLoader:
    """Wrap any provider: a background thread keeps `depth` augmented
    batches ready, so host augmentation overlaps device compute.

    Producer exceptions (cv2 failure, h5py read error, …) are pushed onto
    the queue and re-raised in the consumer's ``next_batch`` — the training
    loop never blocks forever on a dead producer."""

    def __init__(self, provider, batch_size: int,
                 opts: Optional[AugmentOptions] = None,
                 rng: Optional[np.random.Generator] = None, depth: int = 2):
        import queue
        import threading

        self.provider = provider
        self.batch_size = batch_size
        self.opts = opts
        self.rng = rng if rng is not None else np.random.default_rng()
        self._queue_mod = queue
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                x, y = self.provider.next_batch(self.batch_size)
                if self.opts is not None:
                    x, y = augment_batch_host(x, y, self.opts, self.rng)
                item = ("batch", (x, y))
            except BaseException as exc:  # surface to the consumer
                item = ("error", exc)
            # bounded retry loop: give up as soon as close() is called
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=1.0)
                    break
                except self._queue_mod.Full:
                    continue
            if item[0] == "error":
                return  # stop producing after surfacing the failure

    def next_batch(self, batch_size: Optional[int] = None):
        assert batch_size is None or batch_size == self.batch_size
        while True:
            try:
                kind, payload = self._q.get(timeout=5.0)
            except self._queue_mod.Empty:
                if not self._thread.is_alive():
                    raise RuntimeError(
                        "prefetch producer thread died without a batch"
                    )
                continue
            if kind == "error":
                raise payload
            return payload

    def close(self):
        self._stop.set()
        # drain so a producer blocked in put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)
