#!/usr/bin/env python
"""Trained-model quality parity: reference PyTorch PHiSeg vs unet_zoo_tpu.

BASELINE.json's quality bar: "GED and Dice within 1% of the PyTorch
reference at 100 posterior samples". Round-1 proved *math* parity (weight
transplant, loss equality — tests/test_reference_parity.py); this script
proves *training outcome* parity:

1. one synthetic LIDC cache (data/synthetic.py) is shared by both sides;
2. the reference PHISeg (loaded from /root/reference with stubbed deps)
   trains with its own loop semantics (train_model.py:100-134: Adam
   lr 1e-3 wd 1e-5 coupled-L2, random-annotator batches, CE+KL loss);
3. our PHiSeg trains through the real Trainer on the same cache, same
   hyperparameters, same iteration budget, augmentation off on both;
4. both models are evaluated with the SAME metric code (ours — itself
   parity-tested against reference utils.py:148-247 in
   tests/test_reference_parity.py): GED / NCC / per-label Dice at
   ``--samples`` posterior samples over the shared test split, following
   the reference protocol (train_model.py:364-366,446-447).

Writes PARITY_QUALITY.md. Run on CPU (torch is CPU-only in this image):
    JAX_PLATFORMS=cpu python tools/quality_parity.py --iterations 800
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent XLA compile cache (remote TPU compiles run 1-17 min; the
# content-addressed cache makes repeat invocations skip them; env form so
# subprocess children inherit it)
os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# reference import scaffolding (same stubs as tests/test_reference_parity.py)
# ---------------------------------------------------------------------------


def load_reference():
    import torch
    import torch.nn as tnn

    class _RevBlock(tnn.Module):
        def __init__(self, f, g):
            super().__init__()
            self.f_func, self.g_func = f, g

        def forward(self, x):
            x1, x2 = torch.chunk(x, 2, dim=1)
            y1 = x1 + self.f_func(x2)
            y2 = x2 + self.g_func(y1)
            return torch.cat([y1, y2], dim=1)

    class _RevSeq(tnn.Module):
        def __init__(self, blocks):
            super().__init__()
            self.reversible_blocks = blocks

        def forward(self, x):
            for b in self.reversible_blocks:
                x = b(x)
            return x

    def stub(name, **attrs):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
        return sys.modules[name]

    rv_attrs = dict(ReversibleBlock=_RevBlock, ReversibleSequence=_RevSeq)
    rv = stub("revtorch", **rv_attrs)
    rv.revtorch = stub("revtorch.revtorch", **rv_attrs)
    medpy = stub("medpy")
    medpy.metric = stub("medpy.metric", jc=lambda *a, **k: 0.0)
    stub("nibabel", load=None, save=None, Nifti1Image=None)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return types.SimpleNamespace(
        phiseg=importlib.import_module("models.phiseg"),
        prob_unet=importlib.import_module("models.probabilistic_unet"),
        torch=torch,
    )


# ---------------------------------------------------------------------------
# shared data
# ---------------------------------------------------------------------------


def build_data(workdir: str, size: int, splits, seed: int):
    import h5py

    from unet_zoo_tpu.data.lidc import LIDCData
    from unet_zoo_tpu.data.synthetic import make_lidc_cache

    tag = "x".join(str(s) for s in splits)
    path = os.path.join(workdir, f"parity_lidc_{size}_{tag}.hdf5")
    if not os.path.exists(path):
        make_lidc_cache(path, num_per_split=splits, size=size, seed=seed)
    return LIDCData(h5py.File(path, "r"), seed=seed), path


# ---------------------------------------------------------------------------
# reference training (mirrors train_model.py:94-134 without validation)
# ---------------------------------------------------------------------------


def build_ref_net(ref, cfg, seed):
    torch = ref.torch
    torch.manual_seed(seed)
    if cfg.model == "prob_unet":
        return ref.prob_unet.ProbabilisticUnet(
            input_channels=1,
            num_classes=cfg.n_classes,
            num_filters=list(cfg.filters),
            latent_dim=cfg.latent_dim,
            no_convs_fcomb=cfg.no_convs_fcomb,
            beta=cfg.beta,
        )
    return ref.phiseg.PHISeg(
        input_channels=1,
        num_classes=cfg.n_classes,
        num_filters=list(cfg.filters),
        latent_levels=cfg.latent_levels,
        image_size=(1, cfg.size, cfg.size),  # reference conv.: (C, H, W)
    )


def train_reference(ref, data, cfg, log, seed, net=None, ckpt_path=None):
    torch = ref.torch
    if net is None:
        net = build_ref_net(ref, cfg, seed)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=1e-5)
    start_it = 0
    if ckpt_path is not None and os.path.exists(ckpt_path):
        saved = torch.load(ckpt_path, weights_only=False)
        net.load_state_dict(saved["net"])
        opt.load_state_dict(saved["opt"])
        if "rng" in saved:  # keep the z-stream identical across resumes
            torch.set_rng_state(saved["rng"])
        start_it = saved["iteration"]
        # fast-forward the data stream so the batch sequence stays identical
        for _ in range(start_it):
            data.train.next_batch(cfg.batch)
        log(f"[torch] resumed {ckpt_path} at iter {start_it}")
    t0 = time.time()
    for it in range(start_it + 1, cfg.iterations + 1):
        x_b, s_b = data.train.next_batch(cfg.batch)  # (B,H,W,1), (B,H,W)
        patch = torch.tensor(
            np.ascontiguousarray(x_b.transpose(0, 3, 1, 2)), dtype=torch.float32
        )
        mask = torch.tensor(s_b, dtype=torch.float32).unsqueeze(1)
        net.forward(patch, mask, training=True)
        loss = net.loss(mask)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if it % 100 == 0 or it == 1:
            log(f"[torch] iter {it}/{cfg.iterations} loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)")
        if ckpt_path is not None and it % 100 == 0:
            torch.save(
                {"net": net.state_dict(), "opt": opt.state_dict(),
                 "iteration": it, "rng": torch.get_rng_state()},
                ckpt_path,
            )
    net.eval()
    return net


def sample_reference(ref, net, x, n, model="phiseg", chunk=25):
    """n prior samples for one image, reference validate/test protocol
    (train_model.py:177-186: batch-repeat, forward(training=False),
    accumulate_output softmax). Returns (n, H, W, C) softmax probs.
    Sampling is chunked so 100-sample eval at 128^2 reference widths fits
    in host RAM."""
    torch = ref.torch
    outs = []
    with torch.no_grad():
        base = torch.tensor(
            np.ascontiguousarray(x.transpose(2, 0, 1))[None], dtype=torch.float32
        )
        done = 0
        while done < n:
            k = min(chunk, n - done)
            patch = base.repeat(k, 1, 1, 1)
            dummy_mask = torch.zeros(
                (k, 1, x.shape[0], x.shape[1]), dtype=torch.float32
            )
            net.forward(patch, dummy_mask, training=False)
            if model == "prob_unet":
                out = net.sample(testing=True)  # prior z -> Fcomb
            else:
                out = net.s_out_list
            probs = net.accumulate_output(out, use_softmax=True)
            outs.append(probs.numpy().transpose(0, 2, 3, 1))
            done += k
    return np.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# our training
# ---------------------------------------------------------------------------


def make_ours_trainer(cfg, workdir, seed, tag="ours"):
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    kw = (
        dict(latent_dim=cfg.latent_dim, no_convs_fcomb=cfg.no_convs_fcomb,
             beta=cfg.beta, latent_levels=1)
        if cfg.model == "prob_unet"
        else dict(latent_levels=cfg.latent_levels)
    )
    exp = ExperimentConfig(
        experiment_name=f"parity_{tag}_s{seed}",
        model=cfg.model,
        filter_channels=cfg.filters,
        n_classes=cfg.n_classes,
        batch_size=cfg.batch,
        image_size=(cfg.size, cfg.size),
        iterations=cfg.iterations,
        augmentation_options=None,
        validation_frequency=10**9,
        logging_frequency=100,
        seed=seed,
        **kw,
    )
    return Trainer(
        exp, log_dir=os.path.join(workdir, f"{tag}_s{seed}"), tensorboard=False
    )


def train_ours(data, cfg, workdir, log, seed, tr=None):
    if tr is None:
        tr = make_ours_trainer(cfg, workdir, seed)
    t0 = time.time()
    tr.train(data, validate=False)
    log(f"[ours] {cfg.iterations} iters in {time.time()-t0:.0f}s")
    return tr


def sample_ours(tr, x, n, seed):
    import jax
    import jax.numpy as jnp

    logits = tr.model.apply(
        jax.device_put(tr.state.variables),
        jnp.asarray(x)[None],
        n,
        train=False,
        method=tr.model.sample,
        rngs={"z": jax.random.PRNGKey(seed)},
    )
    probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
    return np.asarray(probs)


# ---------------------------------------------------------------------------
# shared evaluation (our on-device metrics for BOTH sides)
# ---------------------------------------------------------------------------


def evaluate(samples_fn, data, cfg, n_samples, log, tag):
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu import metrics as M

    geds, nccs, dices = [], [], []
    rng = np.random.default_rng(123)  # same annotator picks for both sides
    n_test = data.test.images.shape[0]
    for ii in range(n_test):
        x = np.asarray(data.test.images[ii], dtype=np.float32)[..., None]
        y_all = np.asarray(data.test.labels[ii])  # (H, W, A)
        probs = samples_fn(x, ii)  # (n, H, W, C) softmax
        pred_labels = jnp.argmax(jnp.asarray(probs), axis=-1)
        y_all_t = jnp.asarray(np.moveaxis(y_all, -1, 0), jnp.int32)
        ged = M.generalised_energy_distance(
            pred_labels, y_all_t, nlabels=cfg.n_classes - 1,
            label_range=tuple(range(1, cfg.n_classes)),
        )
        gt_onehot = jax.nn.one_hot(y_all_t, cfg.n_classes, dtype=jnp.float32)
        ncc = M.variance_ncc_dist(jnp.asarray(probs), gt_onehot)
        mean_pred = jnp.argmax(jnp.mean(jnp.asarray(probs), axis=0), axis=-1)
        a = rng.integers(0, y_all.shape[-1])
        dice = M.dice_per_label(
            mean_pred, jnp.asarray(y_all[..., a], jnp.int32), cfg.n_classes
        )
        geds.append(float(ged))
        nccs.append(float(ncc))
        dices.append(np.asarray(dice))
        log(f"[{tag}] test image {ii}: GED {geds[-1]:.4f} NCC {nccs[-1]:.4f}")
    dices = np.stack(dices)
    return {
        "ged": float(np.mean(geds)),
        "ged_std": float(np.std(geds)),
        "ncc": float(np.mean(nccs)),
        "dice_fg": float(dices[:, 1:].mean()),
        "dice": float(dices.mean()),
        "n_images": n_test,
    }


METRICS = ("ged", "ncc", "dice_fg", "dice")


# ---------------------------------------------------------------------------
# paired-init protocol (round-3: resolves the BASELINE "within 1%" bar)
# ---------------------------------------------------------------------------


def run_paired(ref, cfg, log):
    """Train both frameworks from the IDENTICAL initialization (torch's,
    transplanted via tools/transplant.py) on the IDENTICAL batch/annotator
    sequence (same-seeded provider), and compare per-pair — init variance,
    the dominant noise source in the unpaired protocol, cancels exactly.

    The residual per-pair difference is the z-sampling RNG stream plus
    framework numerics; ``--noise-floor N`` quantifies that scale by
    retraining the torch net itself from the SAME init and batches with a
    different torch RNG seed: the ours-vs-torch pair diff is parity-level
    iff it is comparable to the torch-vs-torch(z-reseeded) diff.

    Stages (torch is hours on this 1-core host, ours is minutes):
      --stage torch  train + eval torch side (+ noise floors), persist json
      --stage ours   train + eval our side, combine, write the report
      --stage all    both.
    """
    import copy

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from transplant import (
        install_into_trainer,
        transplant_phiseg,
        transplant_prob_unet,
    )

    torch = ref.torch
    splits = (48, 8, cfg.n_test)
    state_path = os.path.join(cfg.workdir, f"paired_{cfg.model}_state.json")
    state = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    def persist():
        # Merge-on-write: a torch stage (hours) and an ours stage (minutes)
        # may run CONCURRENTLY against the same workdir, each persisting from
        # its own in-memory snapshot — a plain dump would erase whatever the
        # other process completed since this one loaded. Re-read, overlay our
        # entries per-key (we are never stale for keys we computed), adopt
        # the other writer's new keys, and replace atomically.
        disk = {}
        if os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    disk = json.load(f)
            except Exception:
                disk = {}
        for sk, ent in state.items():
            disk.setdefault(sk, {}).update(ent)
        for sk, ent in disk.items():
            mine = state.setdefault(sk, {})
            for k, v in ent.items():
                mine.setdefault(k, v)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(disk, f, indent=2)
        os.replace(tmp, state_path)

    # --stage report regenerates the artifact from the persisted state
    # alone (no torch-net builds, no data builds, no training) — the safe
    # way to refresh the report while other stages may still be running,
    # or when the TPU is unreachable (a --stage ours rerun would TRAIN any
    # missing ours_floor entries).
    for seed in ([] if cfg.stage == "report" else range(cfg.seeds)):
        skey = str(seed)
        ent = state.setdefault(skey, {})
        data, path = build_data(cfg.workdir, cfg.size, splits, seed)
        log(f"[pair {seed}] cache {path}")
        net = build_ref_net(ref, cfg, seed)
        init_sd = copy.deepcopy(net.state_dict())
        init_path = os.path.join(cfg.workdir, f"paired_{cfg.model}_init_s{seed}.pt")
        if not os.path.exists(init_path):
            torch.save(init_sd, init_path)
        else:  # resume across invocations: reuse the persisted init exactly
            init_sd = torch.load(init_path, weights_only=False)
            net.load_state_dict(init_sd)

        if cfg.stage in ("all", "torch"):
            if "ref" not in ent:
                torch.manual_seed(10_000 + seed)  # training z-stream
                net = train_reference(
                    ref, data, cfg, log, seed, net=net,
                    ckpt_path=os.path.join(
                        cfg.workdir, f"paired_{cfg.model}_ref_s{seed}.pt"
                    ),
                )
                ent["ref"] = evaluate(
                    lambda x, ii: sample_reference(
                        ref, net, x, cfg.samples, cfg.model
                    ),
                    data, cfg, cfg.samples, log, f"torch_s{seed}",
                )
                persist()
            for nf in range(cfg.noise_floor):
                key = f"floor{nf}"
                if key in ent:
                    continue
                data_f, _ = build_data(cfg.workdir, cfg.size, splits, seed)
                net_f = build_ref_net(ref, cfg, seed)
                net_f.load_state_dict(
                    torch.load(init_path, weights_only=False)
                )
                torch.manual_seed(20_000 + 1000 * nf + seed)  # reseeded z only
                net_f = train_reference(
                    ref, data_f, cfg, log, seed, net=net_f,
                    ckpt_path=os.path.join(
                        cfg.workdir, f"paired_{cfg.model}_floor{nf}_s{seed}.pt"
                    ),
                )
                ent[key] = evaluate(
                    lambda x, ii: sample_reference(
                        ref, net_f, x, cfg.samples, cfg.model
                    ),
                    data_f, cfg, cfg.samples, log, f"floor{nf}_s{seed}",
                )
                persist()
                del net_f

        if cfg.stage in ("all", "ours"):
            # transplant the INIT weights — net may hold the trained state
            # after an in-pass torch stage (train_reference mutates it)
            net_init = build_ref_net(ref, cfg, seed)
            net_init.load_state_dict(torch.load(init_path, weights_only=False))

            def _fresh_transplanted(tag, trainer_seed):
                tr = make_ours_trainer(cfg, cfg.workdir, trainer_seed, tag=tag)
                variables = jax.device_get(tr.state.variables)
                if cfg.model == "prob_unet":
                    params, stats = transplant_prob_unet(
                        net_init, variables, cfg.filters
                    )
                else:
                    params, stats = transplant_phiseg(
                        net_init, variables, cfg.latent_levels, cfg.filters
                    )
                install_into_trainer(tr, params, stats)
                return tr

            if "ours" not in ent:
                data_o, _ = build_data(cfg.workdir, cfg.size, splits, seed)
                tr = _fresh_transplanted("paired_ours", seed)
                tr = train_ours(data_o, cfg, cfg.workdir, log, seed, tr=tr)
                ent["ours"] = evaluate(
                    lambda x, ii: sample_ours(
                        tr, x, cfg.samples, seed=1000 * (seed + 1) + ii
                    ),
                    data_o, cfg, cfg.samples, log, f"ours_s{seed}",
                )
                # platform is a property of the RUN (report regenerations
                # must not relabel it with their own --ours-platform)
                ent["ours_platform"] = cfg.ours_platform
                persist()
                del tr

            # ours-side z-noise floor: OUR framework retrained from the same
            # init/batches with only the jax z-stream (and eval z) reseeded —
            # the cheap (minutes-on-TPU) twin of the torch --noise-floor
            for nf in range(cfg.ours_noise_floor):
                key = f"ours_floor{nf}"
                if key in ent:
                    continue
                data_f, _ = build_data(cfg.workdir, cfg.size, splits, seed)
                tr_f = _fresh_transplanted(
                    "paired_ours_floor", seed + 7000 * (nf + 1)
                )
                tr_f = train_ours(data_f, cfg, cfg.workdir, log, seed, tr=tr_f)
                ent[key] = evaluate(
                    lambda x, ii: sample_ours(
                        tr_f, x, cfg.samples,
                        seed=9000 * (nf + 1) + 1000 * (seed + 1) + ii,
                    ),
                    data_f, cfg, cfg.samples, log, f"ours_floor{nf}_s{seed}",
                )
                persist()
                del tr_f
            del net_init
        del net

    if cfg.stage == "torch":
        log("torch stage complete; rerun with --stage ours to finish")
        return

    # ---- report ----
    # Derive pairs and floor runs from the persisted state, not the cfg
    # ranges: --stage report must reflect exactly what completed, and a
    # lower --seeds/--noise-floor on the regenerating invocation must not
    # hide finished runs.
    if cfg.stage == "report" and os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    seed_ids = sorted(int(s) for s in state)
    pairs = [state[str(s)] for s in seed_ids
             if "ref" in state[str(s)] and "ours" in state[str(s)]]
    if not pairs:
        log("no completed pairs yet")
        return
    diffs = {k: [p["ours"][k] - p["ref"][k] for p in pairs] for k in METRICS}
    rel = {k: [d / abs(p["ref"][k]) for d, p in zip(diffs[k], pairs)]
           for k in METRICS}
    floor_rel = {k: [] for k in METRICS}
    ours_floor_rel = {k: [] for k in METRICS}
    for s in seed_ids:
        ent = state[str(s)]
        for fkey in sorted(ent):
            fl = ent[fkey]
            if fkey.startswith("ours_floor") and "ours" in ent:
                for k in METRICS:
                    ours_floor_rel[k].append(
                        (fl[k] - ent["ours"][k]) / abs(ent["ours"][k])
                    )
            elif fkey.startswith("floor") and "ref" in ent:
                for k in METRICS:
                    floor_rel[k].append(
                        (fl[k] - ent["ref"][k]) / abs(ent["ref"][k])
                    )
    report = {
        "config": {
            "model": cfg.model, "iterations": cfg.iterations,
            "size": cfg.size, "batch": cfg.batch, "samples": cfg.samples,
            "pairs": len(pairs), "n_test": cfg.n_test,
            "filters": cfg.filters,
            # counts of COMPLETED floor runs found in the state (across
            # all seeds), not the requested --noise-floor values
            "noise_floor_runs": len(floor_rel[METRICS[0]]),
            "ours_noise_floor_runs": len(ours_floor_rel[METRICS[0]]),
            "ours_platform": ",".join(sorted({
                state[str(s)].get("ours_platform", cfg.ours_platform)
                for s in seed_ids if "ours" in state[str(s)]
            })),
        },
        "pairs": pairs,
        "pair_rel_diff_mean": {k: float(np.mean(rel[k])) for k in METRICS},
        "pair_rel_diff_std": {k: float(np.std(rel[k])) for k in METRICS},
        "z_noise_floor_rel": {
            k: [float(v) for v in floor_rel[k]] for k in METRICS
        },
        "z_noise_floor_rel_ours": {
            k: [float(v) for v in ours_floor_rel[k]] for k in METRICS
        },
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(cfg.workdir, f"paired_{cfg.model}_report.json"),
              "w") as f:
        json.dump(report, f, indent=2)

    names = {
        "ged": f"GED @ {cfg.samples} samples",
        "ncc": "variance-NCC",
        "dice_fg": "foreground Dice (mean pred)",
        "dice": "Dice (all labels)",
    }
    rows = ""
    for k in METRICS:
        refs = ", ".join(f"{p['ref'][k]:.4f}" for p in pairs)
        ours = ", ".join(f"{p['ours'][k]:.4f}" for p in pairs)
        fl = (", ".join(f"{v*100:+.2f}%" for v in floor_rel[k])
              if floor_rel[k] else "—")
        ofl = (", ".join(f"{v*100:+.2f}%" for v in ours_floor_rel[k])
               if ours_floor_rel[k] else "—")
        rows += (
            f"| {names[k]} | {refs} | {ours} | "
            f"{np.mean(rel[k])*100:+.2f}% ± {np.std(rel[k])*100:.2f}% | {fl} |"
            f" {ofl} |\n"
        )
    out = cfg.out.replace(".md", "_paired.md")
    # Preserve hand-appended analysis sections (anything from the first
    # "## " heading onward, e.g. the round-3 loss-trajectory table) across
    # regenerations — only the generated header/table is replaced.
    appendix = ""
    if os.path.exists(out):
        prev = open(out).read()
        cutpos = prev.find("\n## ")
        if cutpos != -1:
            appendix = prev[cutpos:]
    with open(out, "w") as f:
        f.write(
            f"# Paired-init trained-model quality parity: {cfg.model}\n\n"
            "Protocol (round-3): the torch reference net is initialized, its\n"
            "INIT weights are transplanted verbatim into our model\n"
            "(`tools/transplant.py`, per-layer conversion pinned by\n"
            "`tests/test_reference_parity.py` bit-parity tests), and both\n"
            "frameworks then train on the IDENTICAL batch + annotator\n"
            "sequence (same-seeded provider over one shared HDF5 cache),\n"
            "same optimizer semantics (coupled-L2 Adam lr 1e-3 wd 1e-5 =\n"
            "reference `train_model.py:49`), augmentation off. Init\n"
            "variance — the dominant noise in the unpaired protocol —\n"
            "cancels exactly; the residual per-pair difference is the\n"
            "z-sampling RNG stream + framework numerics. That residual's\n"
            "own scale is measured directly: the 'z-noise floor' column\n"
            "retrains the REFERENCE from the same init/batches with only\n"
            "the torch RNG reseeded — reference-vs-itself, everything\n"
            "controlled but z noise. The 'ours-vs-ours' floor is the same\n"
            "control run inside OUR framework (reseeded jax z-stream),\n"
            "used where torch retraining is prohibitive on this host.\n\n"
            f"Config: {json.dumps(report['config'])}\n\n"
            "| metric | reference per pair | ours per pair | pair rel. diff "
            "| torch-vs-torch z-noise floor | ours-vs-ours z-noise floor |\n"
            "|---|---|---|---|---|---|\n"
            f"{rows}\n"
            "Eval: GED / variance-NCC / Dice at "
            f"{cfg.samples} posterior samples over the shared {cfg.n_test}-"
            "image test split (reference protocol\n"
            "`train_model.py:364-366,446-447`), same metric code for both\n"
            "sides. Produced by `tools/quality_parity.py --paired`.\n"
            + appendix
        )
    log(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="phiseg", choices=["phiseg", "prob_unet"])
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=3,
                    help="independently trained models per framework")
    ap.add_argument("--n-test", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/quality_parity")
    ap.add_argument("--filters", default="8,16,16,16,16,16,16")
    ap.add_argument("--latent-dim", type=int, default=6)
    ap.add_argument("--no-convs-fcomb", type=int, default=3)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--paired", action="store_true",
                    help="paired-init protocol: transplant the torch init "
                    "into ours, identical batch order, per-pair diffs")
    ap.add_argument("--stage", default="all",
                    choices=["all", "torch", "ours", "report"],
                    help="paired mode only: run just the torch (hours) or "
                    "ours (minutes) half; state persists in --workdir. "
                    "'report' regenerates the artifact from the persisted "
                    "state without training anything")
    ap.add_argument("--noise-floor", type=int, default=0,
                    help="paired mode: extra torch runs from the same init/"
                    "batches with reseeded z, measuring the z-noise scale")
    ap.add_argument("--ours-noise-floor", type=int, default=0,
                    help="paired mode: extra OUR-side runs from the same "
                    "init/batches with reseeded jax z — the cheap "
                    "(minutes-on-TPU) twin of --noise-floor for configs "
                    "where torch retraining is prohibitive")
    ap.add_argument("--ours-platform", default="cpu", choices=["cpu", "tpu"],
                    help="platform for the jax side. cpu = bit-stable "
                    "host run; tpu = the real chip (the shipping "
                    "configuration — hours faster at reference scale)")
    cfg = ap.parse_args()
    cfg.filters = tuple(int(c) for c in cfg.filters.split(","))
    cfg.latent_levels = 5
    cfg.n_classes = 2
    if cfg.out is None:
        suffix = "" if cfg.model == "phiseg" else f"_{cfg.model}"
        cfg.out = os.path.join(REPO, f"PARITY_QUALITY{suffix}.md")
    os.makedirs(cfg.workdir, exist_ok=True)

    def log(msg):
        print(msg, flush=True)

    import jax

    if cfg.ours_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # else: leave the site default (axon = the real TPU chip)

    ref = load_reference()
    if cfg.paired:
        run_paired(ref, cfg, log)
        return
    splits = (48, 8, cfg.n_test)
    seeds = list(range(cfg.seeds))

    res_ref, res_ours = [], []
    for seed in seeds:
        data, path = build_data(cfg.workdir, cfg.size, splits, seed)
        if seed == 0:
            log(f"shared cache: {path}")
        net = train_reference(ref, data, cfg, log, seed)
        res_ref.append(evaluate(
            lambda x, ii: sample_reference(ref, net, x, cfg.samples, cfg.model),
            data, cfg, cfg.samples, log, f"torch_s{seed}",
        ))
        del net
    for seed in seeds:
        data, _ = build_data(cfg.workdir, cfg.size, splits, seed)
        tr = train_ours(data, cfg, cfg.workdir, log, seed)
        res_ours.append(evaluate(
            lambda x, ii: sample_ours(
                tr, x, cfg.samples, seed=1000 * (seed + 1) + ii
            ),
            data, cfg, cfg.samples, log, f"ours_s{seed}",
        ))
        del tr

    def agg(rows):
        return {
            k: (float(np.mean([r[k] for r in rows])),
                float(np.std([r[k] for r in rows])))
            for k in METRICS
        }

    a_ref, a_ours = agg(res_ref), agg(res_ours)
    rel = {k: (a_ours[k][0] - a_ref[k][0]) / abs(a_ref[k][0])
           for k in METRICS}
    # reference's own seed-to-seed spread, as the noise scale for the diff
    spread = {k: a_ref[k][1] / abs(a_ref[k][0]) for k in METRICS}
    report = {
        "config": {
            "iterations": cfg.iterations, "size": cfg.size,
            "batch": cfg.batch, "samples": cfg.samples,
            "seeds": cfg.seeds, "n_test": cfg.n_test,
            "filters": cfg.filters, "latent_levels": cfg.latent_levels,
        },
        "reference_per_seed": res_ref,
        "ours_per_seed": res_ours,
        "reference": a_ref,
        "ours": a_ours,
        "relative_diff": rel,
        "reference_seed_spread_rel": spread,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(cfg.workdir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    names = {
        "ged": f"GED @ {cfg.samples} samples",
        "ncc": "variance-NCC",
        "dice_fg": "foreground Dice (mean pred)",
        "dice": "Dice (all labels)",
    }
    rows = "".join(
        f"| {names[k]} | {a_ref[k][0]:.4f} ± {a_ref[k][1]:.4f} | "
        f"{a_ours[k][0]:.4f} ± {a_ours[k][1]:.4f} | {rel[k]*100:+.2f}% | "
        f"±{spread[k]*100:.2f}% |\n"
        for k in METRICS
    )
    with open(cfg.out, "w") as f:
        f.write(
            f"# Trained-model quality parity: {cfg.model} (reference PyTorch vs unet_zoo_tpu)\n\n"
            f"Protocol: both frameworks train {cfg.model} on the SAME synthetic LIDC\n"
            "cache (`data/synthetic.py` blob dataset, 4 correlated annotators),\n"
            "same hyperparameters (Adam lr 1e-3, coupled-L2 wd 1e-5 — the\n"
            "reference's `train_model.py:49` semantics), same iteration budget,\n"
            f"augmentation off; {cfg.seeds} independently seeded models per\n"
            "framework; evaluated with the SAME metric code (ours,\n"
            "parity-tested element-wise against reference `utils.py:148-247`\n"
            "in `tests/test_reference_parity.py`) at "
            f"{cfg.samples} posterior samples over the shared {cfg.n_test}-image\n"
            "test split — the reference eval protocol\n"
            "(`train_model.py:364-366,446-447`). Values are mean ± std across\n"
            "seeds. Produced by `tools/quality_parity.py`.\n\n"
            f"Config: {json.dumps(report['config'])}\n\n"
            "| metric | reference (torch) | ours (TPU framework) "
            "| rel. diff of means | ref seed spread |\n"
            "|---|---|---|---|---|\n"
            f"{rows}\n"
            "Both frameworks train from their own random initializations, so\n"
            "the relevant comparison is the difference of means against each\n"
            "side's seed-to-seed spread (right column): a diff within the\n"
            "spread is statistically indistinguishable from reseeding the\n"
            "reference itself. The underlying math is transplant-verified\n"
            "element-wise in `tests/test_reference_parity.py` (forward,\n"
            "losses, metrics bit-match the reference at equal weights).\n"
        )
    log(f"wrote {cfg.out}")


if __name__ == "__main__":
    main()
