"""Shape, loss, gradient, and sampling tests for all model families.

Mirrors the reference's runtime shape asserts (models/phiseg.py:294-300,
models/unet.py:71) as real tests, plus convergence smoke tests the
reference never had.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from unet_zoo_tpu.models import UNet, ProbUNet, PHiSeg
from unet_zoo_tpu.models.phiseg import REV_DEPTHS_3D

B, H, W = 2, 32, 32
FILTERS_4 = (8, 16, 16, 16)
FILTERS_6 = (4, 8, 8, 8, 8, 8)  # 6 resolutions for 32x32 (coarsest 1x1)


def _data(seed=0, hw=(H, W), channels=1):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, *hw, channels).astype(np.float32)
    y = (rng.rand(B, *hw) > 0.7).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


class TestUNet:
    def test_forward_shape(self):
        x, y = _data()
        m = UNet(num_classes=2, num_filters=FILTERS_4)
        vs = m.init(jax.random.PRNGKey(0), x, train=True)
        out = m.apply(vs, x, train=True)
        assert out.shape == (B, H, W, 2)

    def test_loss_and_grad(self):
        x, y = _data()
        m = UNet(num_classes=2, num_filters=FILTERS_4)
        vs = m.init(jax.random.PRNGKey(0), x, train=True)

        def lf(p):
            logits = m.apply({"params": p}, x, train=True)
            return m.loss(logits, y)[0]

        loss, g = jax.value_and_grad(lf)(vs["params"])
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g))

    def test_odd_sizes(self):
        """ceil-mode pooling shape arithmetic on non-power-of-two inputs
        (the reference's 192² UZH configs exercise this)."""
        x, _ = _data(hw=(48, 48))
        m = UNet(num_classes=2, num_filters=(4, 8, 8, 8, 8))  # 48→24→12→6→3
        vs = m.init(jax.random.PRNGKey(0), x, train=True)
        out = m.apply(vs, x, train=True)
        assert out.shape == (B, 48, 48, 2)

    def test_reversible_mode(self):
        x, y = _data()
        m = UNet(num_classes=2, num_filters=FILTERS_4, reversible_mode="reversible")
        vs = m.init(jax.random.PRNGKey(0), x, train=True)

        def lf(p):
            logits, _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, train=True,
                mutable=["batch_stats"],
            )
            return m.loss(logits, y)[0]

        loss, g = jax.value_and_grad(lf)(vs["params"])
        assert np.isfinite(float(loss))

    def test_unet_learns(self):
        """A few Adam steps reduce CE on a fixed batch."""
        x, y = _data()
        m = UNet(num_classes=2, num_filters=(4, 8))
        vs = m.init(jax.random.PRNGKey(0), x, train=True)
        params = vs["params"]
        tx = optax.adam(1e-3)
        st = tx.init(params)

        @jax.jit
        def step(params, st):
            def lf(p):
                return m.loss(m.apply({"params": p}, x, train=True), y)[0]

            loss, g = jax.value_and_grad(lf)(params)
            upd, st = tx.update(g, st)
            return optax.apply_updates(params, upd), st, loss

        first = None
        for i in range(60):
            params, st, loss = step(params, st)
            first = first if first is not None else float(loss)
        assert float(loss) < first * 0.9


class TestProbUNet:
    def _model(self, **kw):
        return ProbUNet(num_classes=2, num_filters=FILTERS_4, latent_dim=3, **kw)

    def test_forward_train(self):
        x, y = _data()
        m = self._model()
        vs = m.init({"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, x, y, train=True)
        out, _ = m.apply(vs, x, y, train=True, rngs={"z": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
        assert out["recon"].shape == (B, H, W, 2)
        assert out["prior_mu"].shape == (B, 3)
        assert out["post_sigma"].shape == (B, 3)
        assert np.all(np.asarray(out["post_sigma"]) > 0)

    def test_loss_grad(self):
        x, y = _data()
        m = self._model()
        vs = m.init({"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, x, y, train=True)

        def lf(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, y, train=True,
                rngs={"z": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )
            return m.apply({"params": p}, out, y, p, method=ProbUNet.loss)[0]

        loss, g = jax.value_and_grad(lf)(vs["params"])
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(t)).all() for t in leaves)

    def test_sample_shapes_and_diversity(self):
        x, y = _data()
        m = self._model()
        vs = m.init({"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, x, y, train=True)
        s = m.apply(vs, x, 5, method=ProbUNet.sample, rngs={"z": jax.random.PRNGKey(7)})
        assert s.shape == (B, 5, H, W, 2)
        # different z → different logits
        assert not np.allclose(np.asarray(s[:, 0]), np.asarray(s[:, 1]))

    def test_kl_parity_quirk(self):
        from unet_zoo_tpu.models.prob_unet import kl_two_gauss_diag

        mu0 = jnp.array([[0.5, -0.2]])
        s0 = jnp.array([[1.2, 0.8]])
        mu1 = jnp.array([[0.0, 0.1]])
        s1 = jnp.array([[1.0, 1.5]])
        # corrected form equals the closed-form diag KL
        want = 0.5 * np.sum(
            (np.asarray(s0) ** 2 + (np.asarray(mu1) - np.asarray(mu0)) ** 2)
            / np.asarray(s1) ** 2
            + 2 * np.log(np.asarray(s1))
            - 2 * np.log(np.asarray(s0))
            - 1
        )
        got = kl_two_gauss_diag(mu0, s0, mu1, s1, parity=False)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)
        # parity form differs (the reference quirk)
        got_q = kl_two_gauss_diag(mu0, s0, mu1, s1, parity=True)
        assert not np.isclose(float(got_q), want)


class TestPHiSeg:
    def _model(self, **kw):
        kw.setdefault("num_filters", FILTERS_6)
        kw.setdefault("latent_levels", 4)
        kw.setdefault("image_size", (H, W))
        return PHiSeg(num_classes=2, **kw)

    def _init(self, m, x, y):
        return m.init(
            {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, x, y, train=True
        )

    def test_forward_train_shapes(self):
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)
        out, _ = m.apply(vs, x, y, train=True, rngs={"z": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
        L = 4
        assert len(out["s_list"]) == L
        for s in out["s_list"]:
            assert s.shape == (B, H, W, 2)
        # latent spatial sizes: level lvl has H / 2^(lvl + lvl_diff)
        lvl_diff = len(FILTERS_6) - L
        for lvl in range(L):
            expect = H // 2 ** (lvl + lvl_diff)
            assert out["post_z"][lvl].shape == (B, expect, expect, 2), lvl
            assert out["prior_mu"][lvl].shape == (B, expect, expect, 2)

    def test_loss_grad(self):
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)

        def lf(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, y, train=True,
                rngs={"z": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )
            return m.apply({"params": p}, out, y, method=PHiSeg.loss)[0]

        loss, g = jax.value_and_grad(lf)(vs["params"])
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g))

    def test_eval_decodes_prior(self):
        """Eval forward must decode the prior z (reference phiseg.py:421-424):
        two different z rngs → different s_list."""
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)
        o1 = m.apply(vs, x, y, train=False, rngs={"z": jax.random.PRNGKey(3)})
        o2 = m.apply(vs, x, y, train=False, rngs={"z": jax.random.PRNGKey(4)})
        assert not np.allclose(np.asarray(o1["s_list"][0]), np.asarray(o2["s_list"][0]))

    def test_train_uses_teacher_forcing(self):
        """In training the prior's up-path consumes posterior z, so prior mu
        depends on the posterior path (teacher forcing, phiseg.py:417-419)."""
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)
        out, _ = m.apply(vs, x, y, train=True, rngs={"z": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
        # teacher forcing replaces prior z by posterior z
        for lvl in range(4):
            np.testing.assert_array_equal(
                np.asarray(out["prior_z"][lvl]), np.asarray(out["post_z"][lvl])
            )

    def test_sample(self):
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)
        s = m.apply(vs, x, 3, method=PHiSeg.sample, rngs={"z": jax.random.PRNGKey(5)})
        assert s.shape == (B, 3, H, W, 2)
        assert not np.allclose(np.asarray(s[:, 0]), np.asarray(s[:, 1]))

    def test_sample_matches_full_forward_distribution(self):
        """trunk-once sampling must equal running the full prior per sample:
        same rng → same z path → same logits."""
        x, y = _data()
        m = self._model()
        vs = self._init(m, x, y)
        out = m.apply(vs, x, train=False, rngs={"z": jax.random.PRNGKey(9)})
        full = m.accumulate_output(out["s_list"])
        assert full.shape == (B, H, W, 2)

    def test_accumulate_output(self):
        s_list = [jnp.ones((1, 2, 2, 2)) * i for i in range(3)]
        acc = PHiSeg.accumulate_output(s_list)
        np.testing.assert_allclose(np.asarray(acc), 3.0)
        soft = PHiSeg.accumulate_output(s_list, use_softmax=True)
        np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, rtol=1e-6)

    def test_residual_loss_levels(self):
        """Residual CE is applied to cumulative sums: with all-zero logits at
        every level each term is identical -> total = L * term."""
        m = self._model()
        y = jnp.zeros((1, H, W), jnp.int32)
        s_list = [jnp.zeros((1, H, W, 2)) for _ in range(4)]
        total = m.residual_multinoulli(s_list, y)
        term = float(jnp.log(2.0) * H * W)
        np.testing.assert_allclose(float(total), 4 * term, rtol=1e-5)

    def test_3d(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 2).astype(np.float32))
        y_onehot = jax.nn.one_hot(
            jnp.asarray((np.random.RandomState(1).rand(1, 16, 16, 16) > 0.5).astype(np.int32)), 3
        )
        m = PHiSeg(
            num_classes=3, num_filters=(4, 8, 8), latent_levels=2,
            image_size=(16, 16, 16), rev_depths=REV_DEPTHS_3D,
        )
        vs = m.init({"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)},
                    x, y_onehot, train=True)
        out, _ = m.apply(vs, x, y_onehot, train=True, rngs={"z": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
        assert out["s_list"][0].shape == (1, 16, 16, 16, 3)
        loss, aux = m.apply({"params": vs["params"]}, out, y_onehot, method=PHiSeg.loss)
        assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# odd / non-power-of-two pyramids (capability superset: the reference's fixed
# scale_factor=2 upsampling asserts out on these, phiseg.py:66-70)
# ---------------------------------------------------------------------------


def test_phiseg_odd_resolution_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from unet_zoo_tpu.models.phiseg import PHiSeg

    model = PHiSeg(
        num_classes=2, num_filters=(2, 2, 2, 2, 2, 2, 2), latent_levels=5,
        image_size=(56, 56),  # chain 56,28,14,7,4,2,1 — odd at level 3
    )
    x = jnp.zeros((1, 56, 56, 1), jnp.float32)
    y = jnp.zeros((1, 56, 56), jnp.int32)
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "z": k}, x, y, train=True)
    out, _ = model.apply(variables, x, y, train=True, rngs={"z": k},
                         mutable=["batch_stats"])
    assert out["s_list"][0].shape == (1, 56, 56, 2)
    loss, aux = model.loss(out, y)
    assert np.isfinite(float(loss))


def test_unet_odd_nonsquare_forward():
    import jax
    import jax.numpy as jnp
    from unet_zoo_tpu.models.unet import UNet

    model = UNet(num_classes=2, num_filters=(4, 8, 8))
    x = jnp.zeros((2, 36, 28, 1), jnp.float32)  # 36->18->9 (odd), 28->14->7
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 36, 28, 2)
