"""Parity tests for the op library against torch (CPU) golden values.

torch is used ONLY as a numerical oracle in tests; the framework itself is
pure JAX.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from unet_zoo_tpu import ops


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 5, 7, 2)])
    def test_bilinear_x2_matches_torch(self, rng, align, shape):
        x = rng.randn(*shape).astype(np.float32)
        got = ops.upsample_linear(jnp.asarray(x), 2, align_corners=align)
        want = F.interpolate(
            torch.tensor(to_nchw(x)), scale_factor=2, mode="bilinear", align_corners=align
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)

    @pytest.mark.parametrize("align", [True, False])
    def test_trilinear_x2_matches_torch(self, rng, align):
        x = rng.randn(1, 4, 6, 4, 2).astype(np.float32)
        got = ops.upsample_linear(jnp.asarray(x), 2, align_corners=align)
        want = F.interpolate(
            torch.tensor(np.moveaxis(x, -1, 1)), scale_factor=2,
            mode="trilinear", align_corners=align,
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5)

    @pytest.mark.parametrize("out", [(128, 128), (50, 30)])
    def test_nearest_matches_torch(self, rng, out):
        x = rng.randn(2, 8, 8, 4).astype(np.float32)
        got = ops.upsample_nearest(jnp.asarray(x), out)
        want = F.interpolate(torch.tensor(to_nchw(x)), size=out, mode="nearest").numpy()
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=0)

    def test_downsize_linear(self, rng):
        x = rng.randn(1, 9, 9, 1).astype(np.float32)
        got = ops.resize_linear(jnp.asarray(x), (3, 3), align_corners=True)
        want = F.interpolate(
            torch.tensor(to_nchw(x)), size=(3, 3), mode="bilinear", align_corners=True
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)

    @pytest.mark.parametrize("align", [True, False])
    def test_grad_matches_torch(self, rng, align):
        """The custom_vjp backward (pre-transposed cotangent einsum,
        ops/resize.py:_axis_contraction) against torch autograd — external
        oracle for the hand-written bwd, same rationale as the pool grad
        test."""
        x = rng.randn(2, 9, 7, 3).astype(np.float32)
        got = np.asarray(
            jax.grad(
                lambda x: jnp.sum(
                    ops.resize_linear(x, (17, 13), align_corners=align) ** 2
                )
            )(jnp.asarray(x))
        )
        tx = torch.tensor(to_nchw(x), requires_grad=True)
        y = F.interpolate(tx, size=(17, 13), mode="bilinear", align_corners=align)
        (y**2).sum().backward()
        want = to_nhwc(tx.grad.numpy())
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestAvgPool:
    @pytest.mark.parametrize("hw", [(8, 8), (7, 7), (3, 3), (9, 5)])
    def test_matches_torch_ceil_mode(self, rng, hw):
        x = rng.randn(2, *hw, 3).astype(np.float32)
        got = ops.avg_pool_ceil(jnp.asarray(x))
        want = torch.nn.AvgPool2d(2, 2, 0, ceil_mode=True)(torch.tensor(to_nchw(x))).numpy()
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)

    def test_3d_matches_torch(self, rng):
        x = rng.randn(1, 5, 6, 7, 2).astype(np.float32)
        got = ops.avg_pool_ceil(jnp.asarray(x))
        want = torch.nn.AvgPool3d(2, 2, 0, ceil_mode=True)(
            torch.tensor(np.moveaxis(x, -1, 1))
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-6)

    @pytest.mark.parametrize(
        "shape", [(2, 8, 8, 3), (2, 7, 7, 3), (2, 9, 5, 3), (1, 5, 6, 7, 2)]
    )
    def test_grad_matches_torch(self, rng, shape):
        """The hand-written custom_vjp backward (pre-transposed per-axis
        matmuls, ops/pool.py) against torch autograd of the same ceil-mode
        pool. This needs an EXTERNAL oracle: the DP-vs-single-device grad
        tests compare two programs that share the same bwd, so a broken
        einsum there would pass the whole suite while corrupting every
        model's training gradients."""
        x = rng.randn(*shape).astype(np.float32)
        got = np.asarray(
            jax.grad(lambda x: jnp.sum(ops.avg_pool_ceil(x) ** 2))(jnp.asarray(x))
        )
        tx = torch.tensor(np.moveaxis(x, -1, 1), requires_grad=True)
        pool_cls = torch.nn.AvgPool2d if len(shape) == 4 else torch.nn.AvgPool3d
        (pool_cls(2, 2, 0, ceil_mode=True)(tx) ** 2).sum().backward()
        want = np.moveaxis(tx.grad.numpy(), 1, -1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConvBNAct:
    def test_conv_bn_relu_matches_torch(self, rng):
        """Transplant torch weights into the flax module; compare train-mode out."""
        x = rng.randn(4, 8, 8, 3).astype(np.float32)
        tmod = torch.nn.Sequential(
            torch.nn.Conv2d(3, 16, 3, padding=1),
            torch.nn.BatchNorm2d(16, eps=1e-3, momentum=0.01),
            torch.nn.ReLU(),
        )
        tmod.train()
        with torch.no_grad():
            want = tmod(torch.tensor(to_nchw(x))).numpy()

        mod = ops.ConvBNAct(features=16)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        # torch conv weight OIHW -> HWIO
        w = tmod[0].weight.detach().numpy().transpose(2, 3, 1, 0)
        params = {
            "conv": {"kernel": w, "bias": tmod[0].bias.detach().numpy()},
            "bn": {
                "scale": tmod[1].weight.detach().numpy(),
                "bias": tmod[1].bias.detach().numpy(),
            },
        }
        got, new_state = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-4)
        # running stats must match torch EMA update
        np.testing.assert_allclose(
            np.asarray(new_state["batch_stats"]["bn"]["mean"]),
            tmod[1].running_mean.numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state["batch_stats"]["bn"]["var"]),
            tmod[1].running_var.numpy(),
            rtol=1e-4,
        )

    def test_eval_uses_running_stats(self, rng):
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        mod = ops.ConvBNAct(features=8)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        y_eval = mod.apply(variables, jnp.asarray(x), train=False)
        # with fresh stats (mean 0, var 1) eval BN is just scale/shift of conv out
        assert np.isfinite(np.asarray(y_eval)).all()

    def test_kernel1_padding0(self, rng):
        x = rng.randn(1, 5, 5, 2).astype(np.float32)
        mod = ops.Conv(features=4, kernel_size=1)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = mod.apply(variables, jnp.asarray(x))
        assert y.shape == (1, 5, 5, 4)

    def test_bias_grad_free_under_bn(self, rng):
        """Conv bias grads under train-mode BN are EXACTLY zero (skipped on
        purpose: BN's backward makes them ~0 float noise anyway — measured
        3e-6 relative — and computing them cost 2.4 ms/step of whole-
        cotangent reduces in the PHiSeg train step). All other grads must
        be bitwise identical to full autodiff."""
        from unet_zoo_tpu.ops.conv import Conv
        from unet_zoo_tpu.ops.norm import BatchNorm
        import flax.linen as nn

        x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32))
        mod = ops.ConvBNAct(features=16)
        vs = mod.init(jax.random.PRNGKey(0), x, train=True)

        class Ref(nn.Module):  # same unit WITHOUT the stop_gradient
            @nn.compact
            def __call__(self, x, train=True):
                y = Conv(16, 3, 1, grad_free_bias=False, name="conv")(x)
                y = BatchNorm(name="bn")(y, use_running_average=not train)
                return nn.relu(y)

        def loss(m, p):
            y, _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(y * y)

        g_now = jax.grad(lambda p: loss(mod, p))(vs["params"])
        g_ref = jax.grad(lambda p: loss(Ref(), p))(vs["params"])
        assert float(jnp.abs(g_now["conv"]["bias"]).max()) == 0.0
        # the skipped quantity truly was noise-scale
        bias_rel = float(jnp.abs(g_ref["conv"]["bias"]).max()) / float(
            jnp.abs(g_ref["conv"]["kernel"]).max()
        )
        assert bias_rel < 1e-4, bias_rel
        for path in (("conv", "kernel"), ("bn", "scale"), ("bn", "bias")):
            a, b = g_now[path[0]][path[1]], g_ref[path[0]][path[1]]
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInit:
    def test_kaiming_std(self):
        k = ops.kaiming_normal_fan_in(jax.random.PRNGKey(0), (3, 3, 64, 64))
        fan_in = 3 * 3 * 64
        np.testing.assert_allclose(np.asarray(k).std(), np.sqrt(2 / fan_in), rtol=0.05)

    def test_truncated_normal_bounds(self):
        b = ops.truncated_normal_std(1e-3)(jax.random.PRNGKey(0), (10000,))
        assert np.abs(np.asarray(b)).max() <= 2e-3 + 1e-9

    def test_orthogonal(self):
        k = ops.orthogonal_kernel(jax.random.PRNGKey(0), (1, 1, 16, 8))
        m = np.asarray(k).reshape(16, 8)
        np.testing.assert_allclose(m.T @ m, np.eye(8), atol=1e-5)


class TestReversible:
    def _run(self, mode, rng):
        x = rng.randn(2, 8, 8, 4).astype(np.float32)
        mod = ops.ReversibleSequence(features=8, depth=2, mode=mode)
        variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), train=True)

        def loss_fn(params, x):
            y = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(y**2)

        val, grads = jax.value_and_grad(loss_fn)(variables["params"], jnp.asarray(x))
        return val, grads

    def test_reversible_grads_match_plain(self, rng):
        """The custom_vjp inverse-reconstruction gradients must equal autodiff."""
        v_plain, g_plain = self._run("plain", np.random.RandomState(3))
        v_rev, g_rev = self._run("reversible", np.random.RandomState(3))
        np.testing.assert_allclose(float(v_plain), float(v_rev), rtol=1e-5)
        flat_p = jax.tree_util.tree_leaves(g_plain)
        flat_r = jax.tree_util.tree_leaves(g_rev)
        for a, b in zip(flat_p, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)

    def test_remat_grads_match_plain(self, rng):
        v_plain, g_plain = self._run("plain", np.random.RandomState(3))
        v_rm, g_rm = self._run("remat", np.random.RandomState(3))
        np.testing.assert_allclose(float(v_plain), float(v_rm), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_rm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_channel_matching_conv(self, rng):
        x = rng.randn(1, 4, 4, 3).astype(np.float32)
        mod = ops.ReversibleSequence(features=8, depth=1)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        y = mod.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])[0]
        assert y.shape == (1, 4, 4, 8)

    def test_eval_mode_runs(self, rng):
        x = rng.randn(1, 4, 4, 8).astype(np.float32)
        mod = ops.ReversibleSequence(features=8, depth=2)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        y = mod.apply(variables, jnp.asarray(x), train=False)
        assert y.shape == x.shape
