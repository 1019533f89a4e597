"""Golden-value tests for the on-device metric suite.

Includes an independent numpy re-derivation of the reference GED/NCC math
as the oracle, plus the self-consistency properties the reference's own
test checked (NCC(gt,gt)=1, test/test_scores.py:31-50) and ones it left as
stubs (GED, Dice — test/test_scores.py:53-58).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_zoo_tpu import metrics


def np_iou_dist(m1, m2, nlabels, label_range):
    vals = []
    for lbl in label_range:
        a = (m1 == lbl).astype(np.int64)
        b = (m2 == lbl).astype(np.int64)
        if a.sum() == 0 and b.sum() == 0:
            vals.append(1.0)
        elif (a.sum() == 0) != (b.sum() == 0):
            vals.append(0.0)
        else:
            inter = np.logical_and(a, b).sum()
            union = np.logical_or(a, b).sum()
            vals.append(inter / union)
    return 1 - sum(vals) / nlabels


def np_ged(samples, gts, nlabels, label_range):
    N, M = len(samples), len(gts)
    d_sy = sum(np_iou_dist(samples[i], gts[j], nlabels, label_range)
               for i in range(N) for j in range(M))
    d_ss = sum(np_iou_dist(samples[i], samples[j], nlabels, label_range)
               for i in range(N) for j in range(N))
    d_yy = sum(np_iou_dist(gts[i], gts[j], nlabels, label_range)
               for i in range(M) for j in range(M))
    return 2 / (N * M) * d_sy - d_ss / N**2 - d_yy / M**2


class TestGED:
    def test_identical_sets_zero(self, rng):
        m = (rng.rand(4, 16, 16) > 0.5).astype(np.int32)
        got = metrics.generalised_energy_distance(
            jnp.asarray(m), jnp.asarray(m), nlabels=1, label_range=[1]
        )
        np.testing.assert_allclose(float(got), 0.0, atol=1e-6)

    def test_matches_numpy_reference_math(self, rng):
        samples = (rng.rand(5, 8, 8) * 2).astype(np.int32)  # labels 0/1
        gts = (rng.rand(3, 8, 8) * 2).astype(np.int32)
        want = np_ged(samples, gts, 1, [1])
        got = metrics.generalised_energy_distance(
            jnp.asarray(samples), jnp.asarray(gts), nlabels=1, label_range=[1]
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5)

    def test_multilabel(self, rng):
        samples = (rng.rand(4, 8, 8) * 3).astype(np.int32)
        gts = (rng.rand(4, 8, 8) * 3).astype(np.int32)
        want = np_ged(samples, gts, 2, [1, 2])
        got = metrics.generalised_energy_distance(
            jnp.asarray(samples), jnp.asarray(gts), nlabels=2, label_range=[1, 2]
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5)

    def test_empty_mask_conventions(self):
        empty = np.zeros((1, 4, 4), np.int32)
        full = np.ones((1, 4, 4), np.int32)
        # one empty, one full: d_sy = 1 - 0/1 = 1; d_ss = d_yy = 0
        got = metrics.generalised_energy_distance(
            jnp.asarray(empty), jnp.asarray(full), nlabels=1, label_range=[1]
        )
        np.testing.assert_allclose(float(got), 2.0, atol=1e-6)

    def test_jittable(self, rng):
        samples = jnp.asarray((rng.rand(6, 8, 8) > 0.5).astype(np.int32))
        gts = jnp.asarray((rng.rand(4, 8, 8) > 0.5).astype(np.int32))
        f = jax.jit(
            lambda s, g: metrics.generalised_energy_distance(s, g, 1, [1])
        )
        assert np.isfinite(float(f(samples, gts)))


class TestNCC:
    def test_self_consistency_is_one(self, rng):
        """reference test_scores.py:31-50 spirit: feeding the GT set as the
        sample set gives NCC ~ 1. Exact equality holds when the
        disagreement maps coincide — e.g. a two-mask set {A, B}: then
        E_ss == E_sy_j pointwise (both = 0.5·CE on the A△B region)."""
        a = (rng.rand(16, 16) > 0.5).astype(np.int32)
        b = a.copy()
        b[:4] = 1 - b[:4]  # disagree on a band
        gt = np.stack([a, b])
        onehot = np.stack([(gt == 0), (gt == 1)], axis=-1).astype(np.float32)
        got = metrics.variance_ncc_dist(jnp.asarray(onehot), jnp.asarray(onehot))
        np.testing.assert_allclose(float(got), 1.0, atol=1e-4)

    def test_matches_numpy_reference_math(self, rng):
        def np_pwx(samp, gt, eps=1e-8):
            return -np.sum(gt * np.log(samp + eps), axis=-1)

        N, M, H, W, C = 5, 3, 8, 8, 2
        raw = rng.rand(N, H, W, C) + 1e-3
        samples = raw / raw.sum(-1, keepdims=True)
        gt_lbl = (rng.rand(M, H, W) > 0.5).astype(np.int32)
        gts = np.stack([(gt_lbl == 0), (gt_lbl == 1)], -1).astype(np.float32)

        mean_seg = samples.mean(0)
        e_ss = np.mean([np_pwx(samples[i], mean_seg) for i in range(N)], axis=0)
        e_sy = np.stack(
            [np.mean([np_pwx(samples[i], gts[j]) for i in range(N)], 0) for j in range(M)]
        )

        def np_ncc(a, v):
            a, v = a.flatten(), v.flatten()
            a = (a - a.mean()) / (a.std() * len(a))
            v = (v - v.mean()) / v.std()
            return np.correlate(a, v)[0]

        want = np.mean([np_ncc(e_ss, e_sy[j]) for j in range(M)])
        got = metrics.variance_ncc_dist(jnp.asarray(samples), jnp.asarray(gts))
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    @pytest.mark.parametrize("C", [2, 3])
    def test_class_first_variant_matches(self, rng, C):
        """variance_ncc_dist_class_first (the TPU lane-padding-free layout
        used by Trainer._eval_image_fn) computes the same scalar as the
        channel-last form."""
        N, M, H, W = 6, 4, 8, 8
        raw = rng.rand(N, H, W, C) + 1e-3
        samples = raw / raw.sum(-1, keepdims=True)
        gt_lbl = rng.randint(0, C, size=(M, H, W))
        gts = np.stack([(gt_lbl == c) for c in range(C)], -1).astype(np.float32)

        want = metrics.variance_ncc_dist(jnp.asarray(samples), jnp.asarray(gts))
        got = metrics.variance_ncc_dist_class_first(
            jnp.asarray(np.moveaxis(samples, -1, 0)),
            jnp.asarray(np.moveaxis(gts, -1, 0)),
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestDice:
    def test_perfect(self, rng):
        m = (rng.rand(8, 8) > 0.5).astype(np.int32)
        d = metrics.dice_per_label(jnp.asarray(m), jnp.asarray(m), 2)
        np.testing.assert_allclose(np.asarray(d), [1.0, 1.0], atol=1e-6)

    def test_empty_conventions(self):
        a = np.zeros((4, 4), np.int32)
        b = np.ones((4, 4), np.int32)
        d = metrics.dice_per_label(jnp.asarray(a), jnp.asarray(b), 2)
        # label 0: a full, b empty -> 0; label 1: a empty, b full -> 0
        np.testing.assert_allclose(np.asarray(d), [0.0, 0.0], atol=1e-6)
        d2 = metrics.dice_per_label(jnp.asarray(a), jnp.asarray(a), 2)
        np.testing.assert_allclose(np.asarray(d2), [1.0, 1.0], atol=1e-6)

    def test_half_overlap(self):
        a = np.zeros((4, 4), np.int32); a[:, :2] = 1
        b = np.zeros((4, 4), np.int32); b[:2, :] = 1
        d = metrics.dice_binary(jnp.asarray(a == 1), jnp.asarray(b == 1))
        np.testing.assert_allclose(float(d), 0.5, atol=1e-6)


class TestBrats:
    def test_soft_dice_perfect(self, rng):
        t = (rng.rand(2, 4, 4, 4) > 0.5).astype(np.float32)
        d = metrics.soft_dice(jnp.asarray(t), jnp.asarray(t), smoothing=0)
        np.testing.assert_allclose(float(d), 1.0, atol=1e-6)

    def test_dice_loss_range(self, rng):
        p = rng.rand(1, 4, 4, 4, 3).astype(np.float32)
        t = (rng.rand(1, 4, 4, 4, 3) > 0.5).astype(np.float32)
        loss = metrics.brats_dice_loss(jnp.asarray(p), jnp.asarray(t))
        assert 0 <= float(loss) <= 3 / 5

    def test_sensitivity_specificity(self):
        pred = jnp.asarray(np.array([[0.9, 0.1], [0.8, 0.2]], np.float32))
        target = jnp.asarray(np.array([[1, 0], [0, 0]], np.float32))
        # TP=1 of 1 positives; TN: pred<=0.5 at 3 negatives? pred>0.5 at (1,0) -> FP
        np.testing.assert_allclose(float(metrics.sensitivity(pred, target)), 1.0)
        np.testing.assert_allclose(float(metrics.specificity(pred, target)), 2 / 3, rtol=1e-6)

    def test_hd95_identical_zero(self, rng):
        m = np.zeros((16, 16, 16), np.float32)
        m[4:12, 4:12, 4:12] = 1
        assert metrics.hd95(m, m) == 0.0

    def test_hd95_shifted(self):
        a = np.zeros((16, 16), np.float32); a[4:8, 4:8] = 1
        b = np.zeros((16, 16), np.float32); b[6:10, 4:8] = 1
        v = metrics.hd95(a, b)
        assert 1.0 <= v <= 3.0

    def test_hd95_empty(self):
        a = np.zeros((8, 8), np.float32)
        b = np.ones((8, 8), np.float32)
        assert metrics.hd95(a, b) == -1.0
