"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import jax.experimental.pallas as pl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def wrapper(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", wrapper)
    yield


def _ref_chain(x, ks, bs):
    for k, b in zip(ks, bs):
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x + b)
    return x


@pytest.mark.parametrize(
    "shape,chans",
    [
        ((2, 16, 16, 4), [(4, 8), (8, 8), (8, 8)]),  # U-Net block shape
        ((1, 8, 8, 2), [(2, 4)]),  # single conv
        ((3, 20, 12, 4), [(4, 4), (4, 6)]),  # non-square, 2 stages
        ((1, 33, 17, 3), [(3, 5), (5, 5), (5, 2)]),  # odd sizes, ragged chunks
    ],
)
def test_fused_conv_chain_matches_xla(shape, chans):
    from unet_zoo_tpu.ops.pallas import fused_conv_chain

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ks = [
        jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2, jnp.float32)
        for ci, co in chans
    ]
    bs = [
        jnp.asarray(rng.standard_normal((co,)), jnp.float32) for _, co in chans
    ]
    ref = _ref_chain(x, ks, bs)
    out = fused_conv_chain(x, ks, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_conv_chain_zero_border_semantics():
    """The halo ring between stages must behave as zero padding — a
    constant-input image exposes any leakage at the borders."""
    from unet_zoo_tpu.ops.pallas import fused_conv_chain

    x = jnp.ones((1, 12, 12, 3), jnp.float32)
    ks = [jnp.ones((3, 3, 3, 4)) * 0.1, jnp.ones((3, 3, 4, 4)) * 0.1]
    bs = [jnp.zeros((4,)), jnp.zeros((4,))]
    ref = _ref_chain(x, ks, bs)
    out = fused_conv_chain(x, ks, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
