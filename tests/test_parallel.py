"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.data import synthetic
from unet_zoo_tpu.experiments import ExperimentConfig
from unet_zoo_tpu.parallel import make_mesh, shard_batch
from unet_zoo_tpu.training import Trainer


def _cfg(model="phiseg", **kw):
    base = dict(
        experiment_name=f"par_{model}",
        model=model,
        filter_channels=(4, 8, 8, 8, 8) if model == "phiseg" else (4, 8, 8),
        latent_levels=3,
        n_classes=2,
        batch_size=8,
        image_size=(32, 32),
        validation_samples=2,
        num_validation_images=1,
    )
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def lidc32(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lidc_par")
    return synthetic.synthetic_lidc(str(tmp), num_per_split=(8, 2, 2), size=32)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should fake 8 CPU devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "space": 1}
    mesh2 = make_mesh(8, space=2)
    assert mesh2.shape == {"data": 4, "space": 2}


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(8)
    x = jnp.zeros((8, 16, 16, 1))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec[0] == "data"


@pytest.mark.parametrize("space", [1, 2])
def test_dp_train_step_runs(space, lidc32, tmp_path):
    mesh = make_mesh(8, space=space)
    cfg = _cfg("phiseg")
    tr = Trainer(cfg, log_dir=str(tmp_path / f"dp{space}"), mesh=mesh)
    x, y = lidc32.train.next_batch(8)
    losses = []
    for _ in range(3):
        tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()


def test_dp_matches_single_device(lidc32, tmp_path):
    """The sharded step computes the same loss/update as the single-device
    step (GSPMD all-reduce == serial batch gradient)."""
    cfg = _cfg("unet", augmentation_options=None)
    x, y = lidc32.train.next_batch(8)
    x, y = jnp.asarray(x), jnp.asarray(y)

    tr1 = Trainer(cfg, log_dir=str(tmp_path / "s"), seed=0)
    tr8 = Trainer(cfg, log_dir=str(tmp_path / "m"), seed=0, mesh=make_mesh(8))
    s1, aux1 = tr1._train_step(tr1.state, x, y)
    s8, aux8 = tr8._train_step(tr8.state, x, y)
    assert float(aux1["loss"]) == pytest.approx(float(aux8["loss"]), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_spatial_sharding_conv_correctness():
    """Conv under space-sharding must equal unsharded conv (halo exchange)."""
    from unet_zoo_tpu import ops
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, space=4)
    conv = ops.Conv(8, kernel_size=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 4)),
                    jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(conv.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
