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
        phiseg=importlib.import_module("models.phiseg"), torch=torch
    )


# ---------------------------------------------------------------------------
# shared data
# ---------------------------------------------------------------------------


def build_data(workdir: str, size: int, splits, seed: int):
    import h5py

    from unet_zoo_tpu.data.lidc import LIDCData
    from unet_zoo_tpu.data.synthetic import make_lidc_cache

    path = os.path.join(workdir, f"parity_lidc_{size}.hdf5")
    if not os.path.exists(path):
        make_lidc_cache(path, num_per_split=splits, size=size, seed=seed)
    return LIDCData(h5py.File(path, "r"), seed=seed), path


# ---------------------------------------------------------------------------
# reference training (mirrors train_model.py:94-134 without validation)
# ---------------------------------------------------------------------------


def train_reference(ref, data, cfg, log):
    torch = ref.torch
    torch.manual_seed(cfg.seed)
    net = ref.phiseg.PHISeg(
        input_channels=1,
        num_classes=cfg.n_classes,
        num_filters=list(cfg.filters),
        latent_levels=cfg.latent_levels,
        image_size=(cfg.size, cfg.size, 1),
    )
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=1e-5)
    t0 = time.time()
    for it in range(1, cfg.iterations + 1):
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
    net.eval()
    return net


def sample_reference(ref, net, x, n):
    """n prior samples for one image, reference validate/test protocol
    (train_model.py:177-186: batch-repeat, forward(training=False),
    accumulate_output softmax). Returns (n, H, W, C) softmax probs."""
    torch = ref.torch
    with torch.no_grad():
        patch = torch.tensor(
            np.ascontiguousarray(x.transpose(2, 0, 1))[None], dtype=torch.float32
        ).repeat(n, 1, 1, 1)
        dummy_mask = torch.zeros(
            (n, 1, x.shape[0], x.shape[1]), dtype=torch.float32
        )
        net.forward(patch, dummy_mask, training=False)
        probs = net.accumulate_output(net.s_out_list, use_softmax=True)
    return probs.numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# our training
# ---------------------------------------------------------------------------


def train_ours(data, cfg, workdir, log):
    from unet_zoo_tpu.experiments import ExperimentConfig
    from unet_zoo_tpu.training import Trainer

    exp = ExperimentConfig(
        experiment_name="parity_ours",
        model="phiseg",
        filter_channels=cfg.filters,
        latent_levels=cfg.latent_levels,
        n_classes=cfg.n_classes,
        batch_size=cfg.batch,
        image_size=(cfg.size, cfg.size),
        iterations=cfg.iterations,
        augmentation_options=None,
        validation_frequency=10**9,
        logging_frequency=100,
        seed=cfg.seed,
    )
    tr = Trainer(exp, log_dir=os.path.join(workdir, "ours"), tensorboard=False)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=800)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/quality_parity")
    ap.add_argument("--filters", default="8,16,16,16,16,16,16")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_QUALITY.md"))
    cfg = ap.parse_args()
    cfg.filters = tuple(int(c) for c in cfg.filters.split(","))
    cfg.latent_levels = 5
    cfg.n_classes = 2
    os.makedirs(cfg.workdir, exist_ok=True)

    def log(msg):
        print(msg, flush=True)

    import jax

    jax.config.update("jax_platforms", "cpu")

    ref = load_reference()
    data_ref, path = build_data(cfg.workdir, cfg.size,
                                (48, 8, 8), cfg.seed)
    data_ours, _ = build_data(cfg.workdir, cfg.size, (48, 8, 8), cfg.seed)

    log(f"shared cache: {path}")
    net = train_reference(ref, data_ref, cfg, log)
    tr = train_ours(data_ours, cfg, cfg.workdir, log)

    res_ref = evaluate(
        lambda x, ii: sample_reference(ref, net, x, cfg.samples),
        data_ref, cfg, cfg.samples, log, "torch",
    )
    res_ours = evaluate(
        lambda x, ii: sample_ours(tr, x, cfg.samples, seed=1000 + ii),
        data_ours, cfg, cfg.samples, log, "ours",
    )

    rel = {
        k: (res_ours[k] - res_ref[k]) / abs(res_ref[k]) if res_ref[k] else 0.0
        for k in ("ged", "ncc", "dice_fg", "dice")
    }
    report = {
        "config": {
            "iterations": cfg.iterations, "size": cfg.size,
            "batch": cfg.batch, "samples": cfg.samples,
            "filters": cfg.filters, "latent_levels": cfg.latent_levels,
        },
        "reference": res_ref,
        "ours": res_ours,
        "relative_diff": rel,
    }
    print(json.dumps(report, indent=2))

    with open(cfg.out, "w") as f:
        f.write(
            "# Trained-model quality parity (reference PyTorch vs unet_zoo_tpu)\n\n"
            "Protocol: both frameworks train PHiSeg on the SAME synthetic LIDC\n"
            "cache (`data/synthetic.py` blob dataset, 4 correlated annotators),\n"
            "same hyperparameters (Adam lr 1e-3, coupled-L2 wd 1e-5 — the\n"
            "reference's `train_model.py:49` semantics), same iteration budget,\n"
            "augmentation off; evaluated with the SAME metric code (ours,\n"
            "parity-tested element-wise against reference `utils.py:148-247`\n"
            "in `tests/test_reference_parity.py`) at "
            f"{cfg.samples} posterior samples over the shared test split —\n"
            "the reference eval protocol (`train_model.py:364-366,446-447`).\n"
            "Produced by `tools/quality_parity.py`.\n\n"
            f"Config: {json.dumps(report['config'])}\n\n"
            "| metric | reference (torch) | ours (TPU framework) | rel. diff |\n"
            "|---|---|---|---|\n"
            f"| GED @ {cfg.samples} samples | {res_ref['ged']:.4f} | "
            f"{res_ours['ged']:.4f} | {rel['ged']*100:+.2f}% |\n"
            f"| variance-NCC | {res_ref['ncc']:.4f} | {res_ours['ncc']:.4f} | "
            f"{rel['ncc']*100:+.2f}% |\n"
            f"| foreground Dice (mean pred) | {res_ref['dice_fg']:.4f} | "
            f"{res_ours['dice_fg']:.4f} | {rel['dice_fg']*100:+.2f}% |\n"
            f"| Dice (all labels) | {res_ref['dice']:.4f} | "
            f"{res_ours['dice']:.4f} | {rel['dice']*100:+.2f}% |\n\n"
            "Both models are trained from their own random initializations, so\n"
            "residual differences reflect seed noise, not math differences (the\n"
            "math itself is transplant-verified element-wise in\n"
            "`tests/test_reference_parity.py`).\n"
        )
    log(f"wrote {cfg.out}")


if __name__ == "__main__":
    main()
