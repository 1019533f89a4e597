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

from unet_zoo_tpu.data.augment import Augment3DOptions, AugmentOptions

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


# ---------------------------------------------------------------------------
# 3D (BraTS) chain — the reference's augment3DImage executed on the host
# ---------------------------------------------------------------------------


def _keep_shape(fn, arr):
    """cv2 squeezes trailing singleton channel dims; restore them."""
    out = fn(arr)
    if out.ndim < arr.ndim:
        out = out[..., None]
    return out


def _augment_one_3d_host(img, lbl, opts: Augment3DOptions, seed: int):
    """One (D, H, W, C) volume + (D, H, W, L) soft one-hot labels — the
    reference's slice-wise cv2 chain with shared per-volume parameters
    (reference BratsProcessing/augmentation.py:12-105: rotate BORDER_REPLICATE,
    scale via per-slice resize + centre pad(background)/crop, 3x3-coarse
    elastic warp BORDER_REFLECT, per-channel intensity shift, 3-axis flips).

    Labels follow the soft scheme (augmentation.py nnAug=False: linear
    interpolation of the one-hot channels, zero background —
    bratsDataset.py:46-47), matching the device path's convention."""
    rng = np.random.default_rng(seed)
    img = np.ascontiguousarray(img, dtype=np.float32).copy()
    squeeze_lbl = lbl.ndim == 3  # int labels without channel dim
    lblf = (
        lbl[..., None].astype(np.float32)
        if squeeze_lbl
        else np.ascontiguousarray(lbl, dtype=np.float32)
    ).copy()
    depth, n_h, n_w = img.shape[:3]
    default_img = img[0, 0, 0, :].copy()  # reference defaultPerChannel
    lbl_interp = cv2.INTER_NEAREST if squeeze_lbl else cv2.INTER_LINEAR

    if opts.do_rotate:
        angle = rng.uniform(-opts.rot_degrees, opts.rot_degrees)
        m = cv2.getRotationMatrix2D((n_w / 2, n_h / 2), angle, 1)

        def rot(sl, interp):
            return cv2.warpAffine(
                sl, m, (n_w, n_h), flags=interp,
                borderMode=cv2.BORDER_REPLICATE,
            )

        for z in range(depth):
            img[z] = _keep_shape(lambda s: rot(s, cv2.INTER_LINEAR), img[z])
            lblf[z] = _keep_shape(lambda s: rot(s, lbl_interp), lblf[z])

    if opts.do_scale:
        scale = rng.uniform(1.0 / opts.scale_factor, opts.scale_factor)
        m_h, m_w = round(n_h * scale), round(n_w * scale)

        def rescale(sl, interp, background):
            scaled = _keep_shape(
                lambda s: cv2.resize(s, (m_w, m_h), interpolation=interp), sl
            )
            if scale < 1:  # centre pad with the background value
                out = np.ones((n_h, n_w, sl.shape[-1]), np.float32) * background
                oy, ox = (n_h - m_h) // 2, (n_w - m_w) // 2
                out[oy : oy + m_h, ox : ox + m_w] = scaled
                return out
            oy, ox = (m_h - n_h) // 2, (m_w - n_w) // 2
            return scaled[oy : oy + n_h, ox : ox + n_w]

        for z in range(depth):
            img[z] = rescale(img[z], cv2.INTER_LINEAR, default_img)
            lblf[z] = rescale(lblf[z], lbl_interp, 0.0)

    if opts.do_elastic:
        dx = cv2.resize(
            rng.normal(0, opts.elastic_sigma, (3, 3)).astype(np.float32),
            (n_w, n_h), interpolation=cv2.INTER_CUBIC,
        )
        dy = cv2.resize(
            rng.normal(0, opts.elastic_sigma, (3, 3)).astype(np.float32),
            (n_w, n_h), interpolation=cv2.INTER_CUBIC,
        )
        gx, gy = np.meshgrid(
            np.arange(n_w, dtype=np.float32), np.arange(n_h, dtype=np.float32)
        )
        mx, my = gx + dx, gy + dy

        def warp(sl, interp):
            return cv2.remap(
                sl, mx, my, interpolation=interp,
                borderMode=cv2.BORDER_REFLECT,
            )

        for z in range(depth):
            img[z] = _keep_shape(lambda s: warp(s, cv2.INTER_LINEAR), img[z])
            lblf[z] = _keep_shape(lambda s: warp(s, lbl_interp), lblf[z])

    if opts.do_intensity_shift:
        img += rng.uniform(
            -opts.max_intensity_shift, opts.max_intensity_shift,
            img.shape[-1],
        ).astype(np.float32)

    if opts.do_flip:
        for ax in range(3):
            if rng.random() < 0.5:
                img = np.flip(img, axis=ax)
                lblf = np.flip(lblf, axis=ax)

    out_lbl = lblf[..., 0].astype(lbl.dtype) if squeeze_lbl else lblf
    return np.ascontiguousarray(img), np.ascontiguousarray(out_lbl)


def augment_batch_host_3d(
    images: np.ndarray,
    labels: np.ndarray,
    opts: Augment3DOptions,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """images: (B, D, H, W, C); labels: (B, D, H, W, L) one-hot float or
    (B, D, H, W) int. Per-volume cv2 chain on the thread pool."""
    assert cv2 is not None, "cv2 unavailable; use device augmentation"
    seed_root = int(rng.integers(0, 2**31)) if rng is not None else 0
    results = list(
        _pool().map(
            lambda i: _augment_one_3d_host(
                images[i], labels[i], opts, seed_root + i
            ),
            range(images.shape[0]),
        )
    )
    return (
        np.stack([r[0] for r in results]).astype(images.dtype),
        np.stack([r[1] for r in results]).astype(labels.dtype),
    )


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
                 opts=None,
                 rng: Optional[np.random.Generator] = None, depth: int = 2):
        """``opts``: AugmentOptions (2D chain) or Augment3DOptions (BraTS
        slice-wise chain) — dispatched per batch in the producer thread."""
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
                if isinstance(self.opts, Augment3DOptions):
                    x, y = augment_batch_host_3d(x, y, self.opts, self.rng)
                elif self.opts is not None:
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
