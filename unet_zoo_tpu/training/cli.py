"""Command-line entry points.

Twin of the reference CLIs (reference train_model.py:567-615,
test_model.py:18-56):

    python train.py EXP [--local] [--iterations N] [--log-root DIR]
    python eval.py  EXP [--local] [--checkpoint best_loss]

EXP is a registry name (e.g. phiseg_7_5_12) or a path to a .py file
defining ``config = ExperimentConfig(...)``. The experiment definition is
copied into the log dir for provenance (reference train_model.py:586-590).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import shutil
import sys

from unet_zoo_tpu.experiments.config import (
    ExperimentConfig,
    SystemConfig,
    load_experiment,
)


def setup_logger(log_dir: str) -> logging.Logger:
    """Per-run file + console logging (reference utils.py:336-347)."""
    os.makedirs(log_dir, exist_ok=True)
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(name)s %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, "run.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(sh)
    return root


def _load_sys_config(args) -> SystemConfig:
    """--local mirrors the reference's LOCAL flag choosing the path config
    (reference train_model.py:577-582). Paths come from a json file if
    present, else defaults."""
    path = args.sys_config or (
        "config.local.json" if args.local else "config.json"
    )
    if os.path.exists(path):
        with open(path) as f:
            return SystemConfig(**json.load(f))
    return SystemConfig()


def _build_data(cfg: ExperimentConfig, sys_cfg: SystemConfig):
    from unet_zoo_tpu.data.registry import data_switch

    return data_switch(cfg.data_loader).from_config(sys_cfg, cfg)


def _enable_compile_cache(sys_cfg: SystemConfig) -> None:
    """Point XLA's persistent compilation cache at
    ``sys_cfg.jax_compilation_cache_dir`` (None disables). Re-invoking
    train.py/eval.py on an already-compiled (config, backend) pair then
    skips the 1-17-min cold TPU compiles entirely — the single largest
    fixed cost of the reference UX (one process per train/eval run) on
    this hardware."""
    d = sys_cfg.jax_compilation_cache_dir
    if not d:
        return
    import jax

    d = os.path.expanduser(d)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)


def _add_mesh_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--mesh",
        default=None,
        metavar="SPEC",
        help="device mesh spec 'data=N[,space=K]' (SURVEY.md §7 step 9: "
        "pjit DP over ICI as the default). With >1 visible device and no "
        "spec, all devices form a pure-DP mesh automatically; 'none' forces "
        "single-device",
    )
    p.add_argument(
        "--space",
        type=int,
        default=None,
        metavar="K",
        help="shorthand: shard the image height K-ways (spatial sharding — "
        "the 512² UZH / 128³ BraTS memory lever); data axis takes the "
        "remaining devices",
    )
    p.add_argument(
        "--coordinator",
        default=None,
        metavar="HOST:PORT",
        help="multi-host: jax.distributed coordinator address (pass the "
        "same value on every process, with --num-processes/--process-id)",
    )
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _make_cli_mesh(args, batch_size: int):
    """Resolve the CLI mesh flags to a jax.sharding.Mesh (or None).

    Default policy (SURVEY.md §7 step 9 "mesh + pjit data parallelism as
    default"): more than one visible device and no explicit spec => pure-DP
    mesh over as many of them as divide the global batch (the batch dim
    must split evenly over the "data" axis). The reference's entry point is
    hardwired to one torch.device (reference train_model.py:47); this is
    its multi-chip replacement. Explicit specs are taken literally — an
    indivisible batch then fails loudly in the sharded step."""
    import jax

    from unet_zoo_tpu.parallel.mesh import init_distributed, make_mesh

    if args.coordinator is not None or args.num_processes is not None:
        init_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if args.mesh == "none":
        return None
    data = space = None
    if args.mesh is not None:
        for part in args.mesh.split(","):
            k, sep, v = part.partition("=")
            if not sep or k not in ("data", "space"):
                raise SystemExit(
                    f"--mesh: bad component {part!r} (want data=N[,space=K])"
                )
            if k == "data":
                data = int(v)
            else:
                space = int(v)
    if args.space is not None:
        if space is not None and space != args.space:
            raise SystemExit("--space contradicts --mesh's space=")
        space = args.space
    n_avail = len(jax.devices())
    if data is None and space is None:
        d = min(n_avail, max(batch_size, 1))
        while d > 1 and batch_size % d:
            d -= 1
        return make_mesh(d) if d > 1 else None
    space = space or 1
    n_dev = (data * space) if data is not None else (n_avail // space) * space
    if n_dev > n_avail or n_dev < 1:
        raise SystemExit(
            f"--mesh wants {n_dev} devices but {n_avail} are visible"
        )
    return make_mesh(n_dev, space=space)


def _copy_provenance(exp: str, cfg: ExperimentConfig, log_dir: str):
    os.makedirs(log_dir, exist_ok=True)
    if os.path.exists(exp) and exp.endswith(".py"):
        shutil.copy(exp, log_dir)  # reference train_model.py:590
    with open(os.path.join(log_dir, "experiment.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def train_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train a unet_zoo_tpu experiment")
    p.add_argument("experiment", help="registry name or path to exp .py file")
    p.add_argument("--local", action="store_true", help="use config.local.json")
    p.add_argument("--sys-config", default=None, help="path config json")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--log-root", default=None)
    p.add_argument("--no-validate", action="store_true")
    p.add_argument(
        "--resume",
        nargs="?",
        const="last",
        default=None,
        metavar="CKPT",
        help="resume training from a checkpoint in the log dir (default: "
        "'last'). Restores the FULL state — params, optimizer, scheduler, "
        "step, PRNG — so training continues exactly (the reference can "
        "only reload weights, train_model.py:53-67)",
    )
    _add_mesh_args(p)
    args = p.parse_args(argv)

    cfg = load_experiment(args.experiment)
    sys_cfg = _load_sys_config(args)
    _enable_compile_cache(sys_cfg)
    if args.log_root:
        sys_cfg = dataclasses.replace(sys_cfg, log_root=args.log_root)
    log_dir = os.path.join(sys_cfg.log_root, cfg.log_dir_name, cfg.experiment_name)
    setup_logger(log_dir)
    _copy_provenance(args.experiment, cfg, log_dir)

    from unet_zoo_tpu.training.trainer import Trainer

    trainer = Trainer(
        cfg, sys_cfg, log_dir=log_dir, mesh=_make_cli_mesh(args, cfg.batch_size)
    )
    if args.resume is not None:
        trainer.restore(args.resume)
        logging.getLogger(__name__).info(
            "resumed from '%s' at step %d", args.resume, int(trainer.state.step)
        )
    data = _build_data(cfg, sys_cfg)
    trainer.train(data, iterations=args.iterations, validate=not args.no_validate)
    trainer.save_model("last")  # reference train_model.py:615
    return 0


def eval_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate a trained experiment")
    p.add_argument("experiment")
    p.add_argument("--local", action="store_true")
    p.add_argument("--sys-config", default=None)
    p.add_argument("--log-root", default=None)
    p.add_argument("--checkpoint", default="best_loss")
    p.add_argument("--num-repeats", type=int, default=10)
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--generate-images", action="store_true")
    p.add_argument(
        "--export-predictions",
        action="store_true",
        help="BraTS: write per-case .nii.gz label-map predictions "
        "(largest-CC filtered, reassembled to the original geometry when "
        "the cache carries crop offsets)",
    )
    _add_mesh_args(p)
    args = p.parse_args(argv)

    cfg = load_experiment(args.experiment)
    sys_cfg = _load_sys_config(args)
    _enable_compile_cache(sys_cfg)
    if args.log_root:
        sys_cfg = dataclasses.replace(sys_cfg, log_root=args.log_root)
    log_dir = os.path.join(sys_cfg.log_root, cfg.log_dir_name, cfg.experiment_name)
    setup_logger(log_dir)

    from unet_zoo_tpu.training.trainer import Trainer

    trainer = Trainer(
        cfg, sys_cfg, log_dir=log_dir, mesh=_make_cli_mesh(args, cfg.batch_size)
    )
    data = _build_data(cfg, sys_cfg)
    trainer.test(
        data,
        num_repeats=args.num_repeats,
        num_samples=args.num_samples,
        checkpoint=args.checkpoint,
    )
    if args.generate_images:
        trainer.generate_images(data)
    if args.export_predictions:
        if not (cfg.is_3d and cfg.data_loader == "brats"):
            p.error("--export-predictions is a BraTS (3D) flow")
        trainer.export_predictions(data)
    return 0
