"""On-device batched data augmentation.

The reference augments on the host with a per-image python/cv2 loop
(reference data/batch_provider.py:140-272 for 2D; reference
data/BratsProcessing/augmentation.py:12-126 for 3D) — the dominant input
cost at TPU throughputs. Here the whole pipeline is one jittable device
program: per-image random rotation, scale-crop, coarse-grid elastic warp
and flips are *composed into a single sampling grid* and applied with one
bilinear gather, vmapped over the batch. One gather instead of a chain of
cv2 warps is both faster and loses less information to repeated
interpolation.

Conventions mirrored from the reference:
* rotation angle ~ U(-rot_degrees, +rot_degrees) about the image centre
  (reference batch_provider.py:199-201);
* scale-crop: square side r ~ U{n-offset..n}, top-left corner uniform,
  crop then resize back to full size (reference batch_provider.py:213-222);
* elastic: 3x3 N(0, sigma) displacement grids bicubic-upsampled to full
  resolution, added to the sample coordinates (reference
  batch_provider.py:230-242, the classic U-Net deformation);
* flips with probability 1/max(2, augment_every_nth) each
  (reference batch_provider.py:253-265);
* the rotation/scale/elastic group is gated per image by a
  1-in-`augment_every_nth` coin flip (reference batch_provider.py:194-196);
* labels with <= 4 classes are warped by bilinear interpolation of their
  one-hot encoding followed by argmax (reference utils.py:24-37
  `rotate_image_as_onehot` etc.); more classes fall back to nearest.

Known deliberate difference: the reference warps sequentially
(rotate -> crop -> warp, re-interpolating each time, with cv2 half-pixel
conventions); we compose the coordinate maps and interpolate once.
Distributionally the augmentations match; pixel values differ at
interpolation level.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentOptions:
    """2D augmentation switches (reference experiment files'
    `augmentation_options` dicts, e.g. models/experiments/phiseg_7_5_12.py:31-39)."""

    do_rotations: bool = False
    rot_degrees: float = 10.0
    do_scaleaug: bool = False
    offset: int = 30
    do_elasticaug: bool = False
    elastic_sigma: float = 10.0
    do_fliplr: bool = False
    do_flipud: bool = False
    augment_every_nth: int = 2
    nlabels: int = 2
    label_interp: str = "onehot_linear"  # or "nearest"
    # MXU precision of the warp matmuls: "high" (bf16_3x, ~2^-21 relative
    # error on warped pixels, A/B-measured bs64 train step 1779 -> 1861
    # img/s, tools/bench_step_variants.py `comboHIGH`) or "highest"
    # (bf16_6x, exact f32). Identity pass-through (gate off) and flips are
    # bit-exact under EITHER setting — they bypass the matmuls entirely
    # (structural select/jnp.flip, see _augment_one_2d).
    warp_precision: str = "high"

    @classmethod
    def from_dict(cls, d: Optional[dict], nlabels: int) -> "AugmentOptions":
        """Build from a reference-style options dict.

        Accepts both the config spelling (`do_flip_lr`) and the spelling the
        reference BatchProvider reads (`do_fliplr`). NOTE the reference reads
        only `do_fliplr`/`do_flipud` (batch_provider.py:171-172) while every
        experiment file writes `do_flip_lr`/`do_flip_ud` — flips were
        silently OFF in the reference. We honor both spellings (fix);
        parity runs simply pass the exact reference dict.
        """
        if d is None:
            return cls(nlabels=nlabels)
        return cls(
            do_rotations=d.get("do_rotations", False),
            rot_degrees=d.get("rot_degrees", 10.0),
            do_scaleaug=d.get("do_scaleaug", False),
            offset=d.get("offset", 30),
            do_elasticaug=d.get("do_elasticaug", False),
            elastic_sigma=d.get("sigma", 10.0),
            do_fliplr=d.get("do_fliplr", d.get("do_flip_lr", False)),
            do_flipud=d.get("do_flipud", d.get("do_flip_ud", False)),
            augment_every_nth=d.get("augment_every_nth", 2),
            nlabels=d.get("nlabels", nlabels),
            warp_precision=d.get("warp_precision", "high"),
        )


@dataclasses.dataclass(frozen=True)
class Augment3DOptions:
    """3D (BraTS) augmentation switches (reference
    models/experiments/phiseg_brats.py + BratsProcessing/augmentation.py:12)."""

    do_rotate: bool = True
    rot_degrees: float = 20.0
    do_scale: bool = True
    scale_factor: float = 1.1
    do_elastic: bool = True
    elastic_sigma: float = 10.0
    do_flip: bool = True
    do_intensity_shift: bool = True
    max_intensity_shift: float = 0.1
    nlabels: int = 3
    onehot_labels: bool = True  # labels arrive one-hot (WT/TC/ET channels)


# ---------------------------------------------------------------------------
# coordinate-map builders (all return dst->src maps in (row, col) pixel space)
# ---------------------------------------------------------------------------


def _elastic_field(key, shape: Tuple[int, int], sigma: float):
    """3x3 N(0, sigma) coarse grids, bicubic-upsampled to `shape` — one per
    coordinate axis (reference batch_provider.py:230-240)."""
    coarse = sigma * jax.random.normal(key, (2, 3, 3))
    return jax.image.resize(coarse, (2,) + tuple(shape), method="cubic")


def _apply_elastic(coords, d):
    """coords: (2, H, W) dst coords; d: (2, H, W) displacement at dst."""
    # dense_image_warp samples src = dst + d (reference utils.py:39-66)
    return coords + d


def _apply_scale_crop(coords, r, off_rc, n_hw):
    """Crop [off, off+r) square then resize back to full size.

    cv2.resize半-pixel mapping: src = (dst + 0.5) * r/n - 0.5, then shift by
    the crop offset (reference batch_provider.py:213-222).
    """
    nh, nw = n_hw
    scale = r.astype(jnp.float32)
    rows = (coords[0] + 0.5) * (scale / nh) - 0.5 + off_rc[0]
    cols = (coords[1] + 0.5) * (scale / nw) - 0.5 + off_rc[1]
    return jnp.stack([rows, cols])


def _apply_rotation(coords, angle_deg, n_hw):
    """Inverse-rotate dst coords about the image centre (y-down, cv2
    convention: positive angle = counter-clockwise on screen)."""
    nh, nw = n_hw
    cy, cx = (nh - 1) / 2.0, (nw - 1) / 2.0
    t = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(t), jnp.sin(t)
    ry, rx = coords[0] - cy, coords[1] - cx
    # y-down: CCW rotation of the image = [c, -s; s, c] applied to (x, y);
    # the dst->src map is its inverse (transpose).
    src_x = c * rx - s * ry
    src_y = s * rx + c * ry
    return jnp.stack([src_y + cy, src_x + cx])


def _base_grid(n_hw):
    nh, nw = n_hw
    rows, cols = jnp.meshgrid(
        jnp.arange(nh, dtype=jnp.float32),
        jnp.arange(nw, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([rows, cols])


def _gather_bilinear(img_hwc, coords):
    """Sample (H, W, C) at float coords (2, H', W'), bilinear, zero padding
    (cv2 default constant border)."""
    fn = partial(
        jax.scipy.ndimage.map_coordinates, order=1, mode="constant", cval=0.0
    )
    return jax.vmap(fn, in_axes=(2, None), out_axes=2)(img_hwc, list(coords))


def _tap_weights(c, n):
    """(P,) float coords -> (n, P) bilinear tap-weight matrix: column p
    holds (1-frac) at row floor(c_p) and frac at row floor(c_p)+1, zero
    elsewhere. Out-of-range taps match no row and so contribute 0 — exactly
    map_coordinates' mode="constant", cval=0.

    Built TRANSPOSED — (n, P), contracted with flipped einsum subscripts in
    `_gather_bilinear_mm` — because the (P, n) orientation landed in the
    wrong layout for the warp dots and cost ~2.65 ms/step of data-formatting
    copies (A/B-measured round 4, tools/bench_step_variants.py `tapT`; part
    of the combo that took the bs64 train step 1630 -> 1779 img/s)."""
    lo = jnp.floor(c)[None, :]
    frac = (c - jnp.floor(c))[None, :]
    idx = jnp.arange(n, dtype=c.dtype)[:, None]
    return jnp.where(idx == lo, 1.0 - frac, 0.0) + jnp.where(
        idx == lo + 1, frac, 0.0
    )


_WARP_PRECISION = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _gather_bilinear_mm(img_hwc, coords, precision=jax.lax.Precision.HIGHEST):
    """Bilinear warp as two MXU matmuls instead of a 4-tap gather.

    out[p, c] = sum_{h,w} Wy[p, h] * img[h, w, c] * Wx[p, w], with Wy/Wx the
    one-hot-with-fraction tap matrices of `_tap_weights`. TPU gathers move
    one element per cycle per core; this form rides the systolic array and
    is ~an order of magnitude faster at 128² (the device-augmentation cost
    VERDICT r2 flagged at ~35 ms/step bs64).

    ``precision``: HIGHEST (bf16_6x) reproduces f32 exactly; HIGH (bf16_3x)
    carries ~2^-21 relative error on interpolated pixels but halves the MXU
    passes of the warp — the augmentation phase is fusion-compute-bound, and
    the A/B-measured bs64 train step goes 1779 -> 1861 img/s
    (tools/bench_step_variants.py `comboHIGH`). Callers that need bit-exact
    pass-through must select around the warp, not through it (see
    _augment_one_2d's gate/flip structure).
    """
    H, W, C = img_hwc.shape
    ph, pw = coords[0].shape
    wy = _tap_weights(coords[0].reshape(-1), H)  # (H, P)
    wx = _tap_weights(coords[1].reshape(-1), W)  # (W, P)
    t = jnp.einsum(
        "hp,hwc->pwc",
        wy,
        img_hwc.astype(jnp.float32),
        precision=precision,
    )
    out = jnp.einsum("pwc,wp->pc", t, wx, precision=precision)
    return out.reshape(ph, pw, C)


def _gather_nearest(img_hw, coords):
    return jax.scipy.ndimage.map_coordinates(
        img_hw, list(coords), order=0, mode="constant", cval=0
    )


def _warp_label(lbl_hw, coords, nlabels: int, interp: str, precision):
    if interp == "onehot_linear" and nlabels <= 4:
        oh = jax.nn.one_hot(lbl_hw.astype(jnp.int32), nlabels, dtype=jnp.float32)
        warped = _gather_bilinear_mm(oh, coords, precision)
        return jnp.argmax(warped, axis=-1).astype(lbl_hw.dtype)
    return _gather_nearest(lbl_hw, coords).astype(lbl_hw.dtype)


# ---------------------------------------------------------------------------
# 2D batch augmentation
# ---------------------------------------------------------------------------


def _augment_one_2d(key, img_hwc, lbl_hw, opts: AugmentOptions):
    """One (H, W, C) image + (H, W) label.

    Structure (round 5): the rot/scale/elastic group is composed into one
    coordinate grid and warped via MXU matmuls; the warped result is then
    SELECTED per image against the untouched input on the gate coin, and
    flips are applied afterwards as exact mirrors (jnp.flip + where, the
    same structure the 3D path uses). This makes gate-off pass-through and
    flips bit-exact regardless of the warp matmul precision — which lets
    the warp default to Precision.HIGH (see AugmentOptions.warp_precision)
    where the old fold-flips-into-coords form needed HIGHEST to keep the
    exactness tests. Flip-after-warp is arithmetically identical to the
    folded form for rotation/scale (a mirror permutes output pixels;
    each output pixel's interpolation arithmetic is unchanged) — but NOT
    for elastic+flip draws at a fixed key: the folded form sampled the
    random displacement field at unmirrored destination coords, this form
    effectively samples it at mirrored ones. Same distribution (the field
    is i.i.d.-smoothed noise), different realization — and flips-after-
    the-whole-chain is what the reference does (batch_provider.py:253-265),
    so the per-seed change is a parity improvement, not a regression."""
    nh, nw = img_hwc.shape[0], img_hwc.shape[1]
    (k_gate, k_rot, k_r, k_py, k_px, k_el, k_lr, k_ud) = jax.random.split(key, 8)

    gate = (
        jax.random.randint(k_gate, (), 0, opts.augment_every_nth) == 0
    ).astype(jnp.float32)

    img_out, lbl_out = img_hwc, lbl_hw
    if opts.do_rotations or opts.do_scaleaug or opts.do_elasticaug:
        coords = _base_grid((nh, nw))

        if opts.do_elasticaug:
            d = gate * _elastic_field(k_el, (nh, nw), opts.elastic_sigma)
            coords = _apply_elastic(coords, d)

        if opts.do_scaleaug:
            # r ~ U{n-offset .. n} inclusive (np.random.random_integers
            # semantics)
            r = jax.random.randint(k_r, (), nh - opts.offset, nh + 1)
            off_r = jax.random.randint(k_py, (), 0, nh - r + 1)
            off_c = jax.random.randint(k_px, (), 0, nw - r + 1)
            r = jnp.where(gate > 0, r, nh)
            off_r = jnp.where(gate > 0, off_r, 0)
            off_c = jnp.where(gate > 0, off_c, 0)
            coords = _apply_scale_crop(coords, r, (off_r, off_c), (nh, nw))

        if opts.do_rotations:
            angle = gate * jax.random.uniform(
                k_rot, (), minval=-opts.rot_degrees, maxval=opts.rot_degrees
            )
            coords = _apply_rotation(coords, angle, (nh, nw))

        precision = _WARP_PRECISION[opts.warp_precision]
        if opts.label_interp == "onehot_linear" and opts.nlabels <= 4:
            # pack image + one-hot label channels into ONE warp pass (image
            # and label share the exact same sample coordinates), computed as
            # MXU matmuls (_gather_bilinear_mm) — TPU element gathers were
            # the augmentation bottleneck (~35 ms/step at bs64, VERDICT r2)
            oh = jax.nn.one_hot(
                lbl_hw.astype(jnp.int32), opts.nlabels, dtype=jnp.float32
            )
            stacked = jnp.concatenate([img_hwc.astype(jnp.float32), oh], axis=-1)
            warped = _gather_bilinear_mm(stacked, coords, precision)
            w_img = warped[..., : img_hwc.shape[-1]].astype(img_hwc.dtype)
            w_lbl = jnp.argmax(warped[..., img_hwc.shape[-1] :], axis=-1).astype(
                lbl_hw.dtype
            )
        else:
            w_img = _gather_bilinear_mm(img_hwc, coords, precision).astype(
                img_hwc.dtype
            )
            w_lbl = _warp_label(
                lbl_hw, coords, opts.nlabels, opts.label_interp, precision
            )
        # gate-off images pass through BIT-EXACT (the warp at identity
        # coords is only ~exact at HIGH precision; selecting around it is
        # exact at any precision and matches reference semantics — untouched
        # images stay untouched, batch_provider.py:194-196)
        img_out = jnp.where(gate > 0, w_img, img_out)
        lbl_out = jnp.where(gate > 0, w_lbl, lbl_out)

    # flips are applied LAST in the reference; each has its own
    # 1/max(2, every_nth) coin (batch_provider.py:253-265). Exact mirrors
    # (jnp.flip) rather than coord folds: lossless at any warp precision.
    p_flip = max(2, opts.augment_every_nth)
    if opts.do_fliplr:
        flip = jax.random.randint(k_lr, (), 0, p_flip) == 0
        img_out = jnp.where(flip, jnp.flip(img_out, axis=1), img_out)
        lbl_out = jnp.where(flip, jnp.flip(lbl_out, axis=1), lbl_out)
    if opts.do_flipud:
        flip = jax.random.randint(k_ud, (), 0, p_flip) == 0
        img_out = jnp.where(flip, jnp.flip(img_out, axis=0), img_out)
        lbl_out = jnp.where(flip, jnp.flip(lbl_out, axis=0), lbl_out)
    return img_out, lbl_out


@partial(jax.jit, static_argnames=("opts",))
def augment_batch_2d(key, images, labels, opts: AugmentOptions):
    """Augment a batch on device.

    images: (B, H, W, C) float; labels: (B, H, W) int.
    Returns arrays of identical shapes/dtypes.
    """
    if not (
        opts.do_rotations
        or opts.do_scaleaug
        or opts.do_elasticaug
        or opts.do_fliplr
        or opts.do_flipud
    ):
        return images, labels
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one_2d, in_axes=(0, 0, 0, None))(
        keys, images, labels, opts
    )


# ---------------------------------------------------------------------------
# 3D (BraTS) batch augmentation
# ---------------------------------------------------------------------------


def _augment_one_3d(key, img_dhwc, lbl_dhwc, opts: Augment3DOptions):
    """One (D, H, W, C) volume. The reference transforms slice-wise along the
    last spatial axis with shared per-volume params
    (BratsProcessing/augmentation.py:44-80); here the shared 2D coordinate
    grid is applied to every slice in one vmapped gather.

    Note on axes: the reference stores volumes (X, Y, Z, C) and slices along
    Z; we store (D, H, W, C) with D the slice axis, so the in-plane axes are
    (H, W).
    """
    nh, nw = img_dhwc.shape[1], img_dhwc.shape[2]
    (k_rot, k_sc, k_el, k_int, k_f0, k_f1, k_f2) = jax.random.split(key, 7)

    coords = _base_grid((nh, nw))

    if opts.do_elastic:
        d = _elastic_field(k_el, (nh, nw), opts.elastic_sigma)
        coords = _apply_elastic(coords, d)

    if opts.do_scale:
        # scale ~ U(1/f, f); scaled size m = round(n*scale); crop or pad back
        # (BratsProcessing/augmentation.py:52-62). As a dst->src map:
        # src = (dst + delta + 0.5) * n/m - 0.5, delta = (m - n)//2.
        scale = jax.random.uniform(
            k_sc, (), minval=1.0 / opts.scale_factor, maxval=opts.scale_factor
        )
        mh = jnp.round(nh * scale)
        mw = jnp.round(nw * scale)
        dh = (mh - nh) // 2
        dw = (mw - nw) // 2
        rows = (coords[0] + dh + 0.5) * (nh / mh) - 0.5
        cols = (coords[1] + dw + 0.5) * (nw / mw) - 0.5
        coords = jnp.stack([rows, cols])

    if opts.do_rotate:
        angle = jax.random.uniform(
            k_rot, (), minval=-opts.rot_degrees, maxval=opts.rot_degrees
        )
        coords = _apply_rotation(coords, angle, (nh, nw))

    img_out = jax.vmap(_gather_bilinear, in_axes=(0, None))(img_dhwc, coords)
    if opts.onehot_labels:
        lbl_out = jax.vmap(_gather_bilinear, in_axes=(0, None))(
            lbl_dhwc.astype(jnp.float32), coords
        ).astype(lbl_dhwc.dtype)
    else:
        warp = lambda s: _gather_nearest(s, coords)
        lbl_out = jax.vmap(jax.vmap(warp, in_axes=2, out_axes=2))(lbl_dhwc)

    if opts.do_intensity_shift:
        shift = jax.random.uniform(
            k_int,
            (img_dhwc.shape[-1],),
            minval=-opts.max_intensity_shift,
            maxval=opts.max_intensity_shift,
        )
        img_out = img_out + shift

    if opts.do_flip:
        for ax, k in ((0, k_f0), (1, k_f1), (2, k_f2)):
            flip = jax.random.bernoulli(k)
            img_out = jnp.where(flip, jnp.flip(img_out, axis=ax), img_out)
            lbl_out = jnp.where(flip, jnp.flip(lbl_out, axis=ax), lbl_out)

    return img_out, lbl_out


@partial(jax.jit, static_argnames=("opts",))
def augment_batch_3d(key, images, labels, opts: Augment3DOptions):
    """images: (B, D, H, W, C); labels: (B, D, H, W, C') one-hot or
    (B, D, H, W) int."""
    keys = jax.random.split(key, images.shape[0])
    lbl = labels if labels.ndim == images.ndim else labels[..., None]
    img_out, lbl_out = jax.vmap(_augment_one_3d, in_axes=(0, 0, 0, None))(
        keys, images, lbl, opts
    )
    if labels.ndim != images.ndim:
        lbl_out = lbl_out[..., 0]
    return img_out, lbl_out
