"""Data layer tests: provider semantics, on-device augmentation, dataset
preproc round-trips over synthetic raw inputs, NIfTI I/O."""

import os

import h5py
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_zoo_tpu.data import (
    AugmentOptions,
    Augment3DOptions,
    BatchProvider,
    augment_batch_2d,
    augment_batch_3d,
    synthetic,
)
from unet_zoo_tpu.data.lidc import LIDCData, prepare_data as lidc_prepare
from unet_zoo_tpu.data.brats import (
    BratsData,
    crop_or_pad_volume,
    normalise_image as brats_normalise,
    to_evaluation_onehot,
)
from unet_zoo_tpu.data.uzh import UZHProstateData, crop_or_pad_slice_to_size
from unet_zoo_tpu.utils.nii import load_nii, save_nii


# ---------------------------------------------------------------------------
# BatchProvider
# ---------------------------------------------------------------------------


def _provider(n=20, size=16, graders=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, size, size)).astype(np.float32)
    y = rng.integers(0, 2, (n, size, size, graders)).astype(np.uint8)
    return BatchProvider(
        X,
        y,
        np.arange(n),
        add_dummy_dimension=True,
        num_labels_per_subject=graders,
        rng=np.random.default_rng(seed),
    ), X


def test_next_batch_shapes_nhwc():
    bp, _ = _provider()
    xb, yb = bp.next_batch(4)
    assert xb.shape == (4, 16, 16, 1)  # channel-LAST
    assert yb.shape == (4, 16, 16)
    assert xb.dtype == np.float32 and yb.dtype == np.int32


def test_without_replacement_covers_all():
    """Every index is sampled once before any repeats
    (reference batch_provider.py:43-57 semantics)."""
    n = 20
    rng = np.random.default_rng(1)
    X = np.arange(n, dtype=np.float32)[:, None, None].repeat(4, 1).repeat(4, 2)
    y = np.zeros((n, 4, 4), dtype=np.uint8)
    bp = BatchProvider(X, y, np.arange(n), rng=rng)
    seen = []
    for _ in range(5):
        xb, _ = bp.next_batch(4)
        seen.extend(xb[:, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(n))


def test_annotator_range_restricts_choice():
    n, size = 10, 8
    y = np.zeros((n, size, size, 4), dtype=np.uint8)
    y[..., 2] = 7  # only annotator 2 has nonzero labels
    X = np.zeros((n, size, size), dtype=np.float32)
    bp = BatchProvider(
        X, y, np.arange(n), num_labels_per_subject=4, annotator_range=[2],
        rng=np.random.default_rng(0),
    )
    _, yb = bp.next_batch(5)
    assert (yb == 7).all()


def test_iterate_batches_covers_epoch_with_ragged_tail():
    bp, _ = _provider(n=10)
    sizes = [xb.shape[0] for xb, _ in bp.iterate_batches(4)]
    assert sizes == [4, 4, 2]


def test_resize_to():
    bp, _ = _provider(size=16)
    bp.resize_to = (8, 8)
    xb, yb = bp.next_batch(2)
    assert xb.shape == (2, 8, 8, 1) and yb.shape == (2, 8, 8)


# ---------------------------------------------------------------------------
# on-device augmentation
# ---------------------------------------------------------------------------


def _batch2d(b=4, size=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.standard_normal((b, size, size, 1)), dtype=jnp.float32)
    lbls = jnp.asarray(rng.integers(0, 2, (b, size, size)), dtype=jnp.int32)
    return imgs, lbls


def test_augment_noop_options_identity():
    imgs, lbls = _batch2d()
    opts = AugmentOptions()
    out_i, out_l = augment_batch_2d(jax.random.PRNGKey(0), imgs, lbls, opts)
    np.testing.assert_array_equal(out_i, imgs)
    np.testing.assert_array_equal(out_l, lbls)


def test_augment_shapes_and_label_values_preserved():
    imgs, lbls = _batch2d()
    opts = AugmentOptions(
        do_rotations=True, do_scaleaug=True, do_elasticaug=True,
        do_fliplr=True, do_flipud=True, augment_every_nth=1, nlabels=2,
    )
    out_i, out_l = augment_batch_2d(jax.random.PRNGKey(0), imgs, lbls, opts)
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
    assert set(np.unique(out_l)).issubset({0, 1})


def test_augment_gate_never_fires_is_identity_up_to_flips():
    """augment_every_nth only gates rot/scale/elastic; with flips off and a
    huge every_nth the gate almost surely stays closed -> BIT-exact identity
    (gate-off images select around the warp, independent of warp_precision;
    round-5 structure in _augment_one_2d)."""
    imgs, lbls = _batch2d(b=2)
    opts = AugmentOptions(
        do_rotations=True, do_scaleaug=True, do_elasticaug=True,
        augment_every_nth=10_000, nlabels=2,
    )
    out_i, out_l = augment_batch_2d(jax.random.PRNGKey(3), imgs, lbls, opts)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
    np.testing.assert_array_equal(out_l, lbls)


def test_augment_fliplr_exact():
    """A flip must be an exact mirror (no interpolation loss)."""
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((64, 8, 8, 1)), dtype=jnp.float32)
    lbls = jnp.asarray(rng.integers(0, 2, (64, 8, 8)), dtype=jnp.int32)
    opts = AugmentOptions(do_fliplr=True, augment_every_nth=2, nlabels=2)
    out_i, out_l = augment_batch_2d(jax.random.PRNGKey(0), imgs, lbls, opts)
    flipped = np.asarray(jnp.flip(imgs, axis=2))
    out_np = np.asarray(out_i)
    matches_orig = np.isclose(out_np, np.asarray(imgs), atol=1e-5).all(axis=(1, 2, 3))
    matches_flip = np.isclose(out_np, flipped, atol=1e-5).all(axis=(1, 2, 3))
    assert (matches_orig | matches_flip).all()
    assert matches_flip.any() and matches_orig.any()  # both outcomes occur


def test_augment_rotation_moves_mass_not_shape():
    imgs, lbls = _batch2d(b=8, size=32)
    opts = AugmentOptions(do_rotations=True, rot_degrees=45.0,
                          augment_every_nth=1, nlabels=2)
    out_i, _ = augment_batch_2d(jax.random.PRNGKey(1), imgs, lbls, opts)
    assert out_i.shape == imgs.shape
    assert not np.allclose(np.asarray(out_i), np.asarray(imgs))


def test_augment_warp_precision_high_matches_highest():
    """warp_precision="high" (bf16_3x warp dots, the default — A/B-measured
    +4.6% on the bs64 train step, tools/bench_step_variants.py comboHIGH)
    must track the exact-f32 "highest" within its documented ~2^-21
    relative error on warped pixels, and labels must agree away from
    interpolation ties."""
    imgs, lbls = _batch2d(b=4, size=32, seed=5)
    kw = dict(do_rotations=True, do_scaleaug=True, do_elasticaug=True,
              augment_every_nth=1, nlabels=2)
    hi_i, hi_l = augment_batch_2d(
        jax.random.PRNGKey(7), imgs, lbls, AugmentOptions(**kw)
    )
    ex_i, ex_l = augment_batch_2d(
        jax.random.PRNGKey(7), imgs, lbls,
        AugmentOptions(warp_precision="highest", **kw),
    )
    # same RNG stream -> same geometry; only matmul rounding differs
    np.testing.assert_allclose(np.asarray(hi_i), np.asarray(ex_i), atol=5e-4)
    assert np.mean(np.asarray(hi_l) != np.asarray(ex_l)) < 0.01


def test_augment3d_shapes():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 4)), dtype=jnp.float32)
    lbls = jnp.asarray(
        rng.integers(0, 2, (2, 8, 16, 16, 3)).astype(np.float32)
    )
    opts = Augment3DOptions()
    out_i, out_l = augment_batch_3d(jax.random.PRNGKey(0), imgs, lbls, opts)
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape


def test_augment3d_intensity_shift_bounded():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)), dtype=jnp.float32)
    lbls = jnp.zeros((1, 4, 8, 8, 3), dtype=jnp.float32)
    opts = Augment3DOptions(
        do_rotate=False, do_scale=False, do_elastic=False, do_flip=False,
        do_intensity_shift=True, max_intensity_shift=0.1,
    )
    out_i, _ = augment_batch_3d(jax.random.PRNGKey(0), imgs, lbls, opts)
    diff = np.asarray(out_i - imgs)
    assert np.abs(diff).max() <= 0.1 + 1e-6
    # shift is constant per channel
    for c in range(4):
        assert np.allclose(diff[..., c], diff[0, 0, 0, 0, c], atol=1e-6)


# ---------------------------------------------------------------------------
# datasets over synthetic raw inputs
# ---------------------------------------------------------------------------


def test_lidc_pickle_to_cache_roundtrip(tmp_path):
    raw = synthetic.make_lidc_pickle(
        str(tmp_path / "raw.pckl"), num_cases=20, num_subjects=5, size=32
    )
    cache = str(tmp_path / "data_lidc.hdf5")
    lidc_prepare(raw, cache, seed=0)
    with h5py.File(cache, "r") as f:
        total = sum(f[tt]["images"].shape[0] for tt in ("train", "val", "test"))
        assert total == 20
        assert f["train"]["labels"].shape[1:] == (32, 32, 4)
        assert f["train"]["labels"].dtype == np.uint8
        # -0.5 offset applied
        assert f["train"]["images"][:].min() < 0

    data = LIDCData(h5py.File(cache, "r"), seed=0)
    xb, yb = data.train.next_batch(4)
    assert xb.shape == (4, 32, 32, 1) and yb.shape == (4, 32, 32)
    assert data.test.labels.shape[-1] == 4


def test_lidc_split_is_subject_level(tmp_path):
    raw = synthetic.make_lidc_pickle(
        str(tmp_path / "raw.pckl"), num_cases=40, num_subjects=10, size=16
    )
    cache = str(tmp_path / "cache.hdf5")
    lidc_prepare(raw, cache, seed=0)
    with h5py.File(cache, "r") as f:
        uid_sets = [set(f[tt]["uids"][:].tolist()) for tt in ("train", "val", "test")]
    assert not (uid_sets[0] & uid_sets[1])
    assert not (uid_sets[0] & uid_sets[2])
    assert not (uid_sets[1] & uid_sets[2])


def test_uzh_cache_provider(tmp_path):
    cache = synthetic.make_uzh_cache(str(tmp_path / "uzh.hdf5"), size=32)
    data = UZHProstateData(h5py.File(cache, "r"), seed=0)
    xb, yb = data.train.next_batch(4)
    assert xb.shape == (4, 32, 32, 1) and yb.shape == (4, 32, 32)


def test_uzh_crop_or_pad():
    sl = np.ones((10, 20))
    out = crop_or_pad_slice_to_size(sl, 16, 16)
    assert out.shape == (16, 16)
    assert out.sum() == 10 * 16  # rows padded, cols cropped
    multi = crop_or_pad_slice_to_size(np.ones((10, 20, 6)), 16, 16)
    assert multi.shape == (16, 16, 6)


def test_brats_cache_and_onehot(tmp_path):
    cache = synthetic.make_brats_cache(str(tmp_path / "brats.hdf5"), size=(16, 16, 16))
    data = BratsData(h5py.File(cache, "r"), seed=0)
    img, lbl, pid = data.get(0, "train")
    assert img.shape == (16, 16, 16, 4)
    assert lbl.shape == (16, 16, 16, 3)
    for xb, yb, pids in data.batch_iterator(2, "train"):
        assert xb.shape[1:] == (16, 16, 16, 4)
        assert yb.shape[1:] == (16, 16, 16, 3)
        break


def test_brats_evaluation_onehot_semantics():
    lbl = np.array([[0, 1, 2, 4]], dtype=np.uint8)
    oh = to_evaluation_onehot(lbl)
    # WT: label != 0
    np.testing.assert_array_equal(oh[0, :, 0], [0, 1, 1, 1])
    # TC: label != 0 and != 2
    np.testing.assert_array_equal(oh[0, :, 1], [0, 1, 0, 1])
    # ET: label == 4
    np.testing.assert_array_equal(oh[0, :, 2], [0, 0, 0, 1])


def test_brats_normalise_preserves_zeros():
    img = np.zeros((4, 4, 4, 2), dtype=np.float32)
    img[1:3, 1:3, 1:3, :] = np.random.default_rng(0).uniform(1, 5, (2, 2, 2, 2))
    out = brats_normalise(img)
    assert (out[img == 0] == 0).all()
    nz = out[img != 0]
    assert abs(nz.mean()) < 1e-5


def test_crop_or_pad_volume():
    vol = np.ones((10, 20, 6, 2), dtype=np.float32)
    out = crop_or_pad_volume(vol, (16, 16, 16), channels=2)
    assert out.shape == (16, 16, 16, 2)
    assert out.sum() == 10 * 16 * 6 * 2


# ---------------------------------------------------------------------------
# NIfTI I/O
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_nii_roundtrip(tmp_path, gz, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        vol = rng.standard_normal((5, 7, 3)).astype(dtype)
    else:
        vol = rng.integers(0, 100, (5, 7, 3)).astype(dtype)
    path = str(tmp_path / ("x.nii" + (".gz" if gz else "")))
    save_nii(path, vol)
    data, affine, header = load_nii(path)
    np.testing.assert_array_equal(data, vol)
    assert header.structarr["pixdim"][1] == 1.0


# ---------------------------------------------------------------------------
# host-side (cv2) augmentation
# ---------------------------------------------------------------------------


def test_host_augmentation_matches_semantics():
    from unet_zoo_tpu.data.augment_host import (
        augment_batch_host,
        host_augmentation_available,
    )

    if not host_augmentation_available():
        pytest.skip("cv2 unavailable")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((6, 32, 32, 1)).astype(np.float32)
    lbls = rng.integers(0, 2, (6, 32, 32)).astype(np.int32)
    opts = AugmentOptions(
        do_rotations=True, do_scaleaug=True, do_elasticaug=True,
        do_fliplr=True, do_flipud=True, augment_every_nth=1, nlabels=2,
    )
    out_i, out_l = augment_batch_host(imgs, lbls, opts, np.random.default_rng(1))
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
    assert set(np.unique(out_l)).issubset({0, 1})
    assert not np.allclose(out_i, imgs)  # something actually happened


def test_host_3d_augmentation_semantics():
    """Reference augment3DImage chain on the host (slice-wise cv2 with
    shared per-volume params, BratsProcessing/augmentation.py:12-105)."""
    from unet_zoo_tpu.data.augment import Augment3DOptions
    from unet_zoo_tpu.data.augment_host import (
        augment_batch_host_3d,
        host_augmentation_available,
    )

    if not host_augmentation_available():
        pytest.skip("cv2 unavailable")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 8, 16, 16, 4)).astype(np.float32)
    lbls = (rng.uniform(size=(2, 8, 16, 16, 3)) > 0.5).astype(np.float32)
    opts = Augment3DOptions(
        do_rotate=True, do_scale=True, do_elastic=True, do_flip=True,
        do_intensity_shift=True,
    )
    out_i, out_l = augment_batch_host_3d(imgs, lbls, opts, np.random.default_rng(1))
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
    assert np.isfinite(out_i).all()
    # soft one-hot labels stay within [0, 1] under linear warps
    assert out_l.min() >= 0.0 and out_l.max() <= 1.0 + 1e-6
    assert not np.allclose(out_i, imgs)

    # intensity shift alone: per-channel constant offset, identical geometry
    shift_only = Augment3DOptions(
        do_rotate=False, do_scale=False, do_elastic=False, do_flip=False,
        do_intensity_shift=True,
    )
    s_i, s_l = augment_batch_host_3d(imgs, lbls, shift_only, np.random.default_rng(2))
    np.testing.assert_array_equal(s_l, lbls)
    delta = s_i - imgs
    for b in range(2):
        for c in range(4):
            d = delta[b, ..., c]
            assert np.allclose(d, d.flat[0], atol=1e-6)
            assert abs(d.flat[0]) <= 0.1 + 1e-6


def test_host_3d_int_labels_nearest():
    from unet_zoo_tpu.data.augment import Augment3DOptions
    from unet_zoo_tpu.data.augment_host import (
        augment_batch_host_3d,
        host_augmentation_available,
    )

    if not host_augmentation_available():
        pytest.skip("cv2 unavailable")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 6, 12, 12, 1)).astype(np.float32)
    lbls = rng.integers(0, 3, (2, 6, 12, 12)).astype(np.int32)
    opts = Augment3DOptions(
        do_rotate=True, do_scale=True, do_elastic=True, do_flip=True,
        do_intensity_shift=False, onehot_labels=False,
    )
    out_i, out_l = augment_batch_host_3d(imgs, lbls, opts, np.random.default_rng(3))
    assert out_l.shape == lbls.shape and out_l.dtype == lbls.dtype
    assert set(np.unique(out_l)).issubset({0, 1, 2})


def test_prefetching_loader_over_provider():
    from unet_zoo_tpu.data.augment_host import (
        PrefetchingLoader,
        host_augmentation_available,
    )

    if not host_augmentation_available():
        pytest.skip("cv2 unavailable")
    bp, _ = _provider(n=20, size=16)
    loader = PrefetchingLoader(
        bp, batch_size=4,
        opts=AugmentOptions(do_fliplr=True, nlabels=2),
        rng=np.random.default_rng(0),
    )
    for _ in range(5):
        xb, yb = loader.next_batch()
        assert xb.shape == (4, 16, 16, 1) and yb.shape == (4, 16, 16)
    loader.close()


def test_trainer_host_augmentation_path(tmp_path):
    from unet_zoo_tpu.data import synthetic
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    data = synthetic.synthetic_lidc(str(tmp_path), num_per_split=(8, 2, 2), size=32)
    cfg = ExperimentConfig(
        experiment_name="hostaug", model="unet", filter_channels=(4, 8),
        n_classes=2, batch_size=2, image_size=(32, 32), iterations=3,
        augment_on="host",
        augmentation_options=AugmentOptions(do_rotations=True, do_fliplr=True, nlabels=2),
        validation_frequency=10**9, logging_frequency=10**9,
    )
    tr = Trainer(cfg, log_dir=str(tmp_path / "h"), tensorboard=False)
    aux = tr.train(data, validate=False)
    assert np.isfinite(float(aux["loss"]))
    assert int(tr.state.step) == 3


def test_matmul_warp_matches_gather():
    """The MXU tap-weight-matmul warp (_gather_bilinear_mm) is numerically
    the same bilinear resample as the map_coordinates 4-tap gather it
    replaced (round-3 device-augmentation rewrite), including the
    zero-padding border convention, at arbitrary float coords."""
    from unet_zoo_tpu.data.augment import _gather_bilinear, _gather_bilinear_mm

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((24, 20, 3)).astype(np.float32))
    # in-range, out-of-range (border), and exact-integer (flip/identity) coords
    coords = jnp.asarray(
        np.stack([
            rng.uniform(-2.0, 25.5, (24, 20)),
            rng.uniform(-2.0, 21.5, (24, 20)),
        ]).astype(np.float32)
    )
    ref = _gather_bilinear(img, coords)
    got = _gather_bilinear_mm(img, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    ident = jnp.stack(
        jnp.meshgrid(jnp.arange(24.0), jnp.arange(20.0), indexing="ij")
    )
    np.testing.assert_allclose(
        np.asarray(_gather_bilinear_mm(img, ident)), np.asarray(img), atol=0
    )
