"""Training/validation/test harness.

The TPU twin of the reference's ``UNetModel`` wrapper
(reference train_model.py:27-564): iteration-based train loop, periodic
multi-sample validation with GED / variance-NCC / per-label Dice,
best-per-metric checkpointing, quantitative test sweep with npz artifacts,
and PNG sample generation.

TPU-first design:
* ONE jitted step does augmentation + forward + loss + backward + Adam +
  plateau-LR update on device (the reference round-trips the host for data,
  cv2 augmentation and the scheduler every iteration,
  train_model.py:100-134);
* validation is one device program per image: the model's ``sample`` path
  shares the encoder trunk across the 16 posterior samples and the
  GED/NCC/Dice suite is computed on device (the reference repeats the whole
  net over a 16-image batch and loops medpy on the CPU,
  train_model.py:177-224);
* optimizer: coupled-L2 Adam (add_decayed_weights -> scale_by_adam), the
  exact torch.optim.Adam(lr=1e-3, weight_decay=1e-5) semantics
  (reference train_model.py:49), with ReduceLROnPlateau state threaded
  through the step (reference :50-51,134 steps it per-iteration on train
  loss — reproduced);
* checkpoints carry the FULL state (params/opt/sched/step/rng) via orbax,
  under the reference's naming scheme (validation_ckpt, best_dice,
  best_loss, best_ged, best_ncc, last — train_model.py:144,256-271,615).
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unet_zoo_tpu import metrics as M
from unet_zoo_tpu.data.augment import augment_batch_2d, augment_batch_3d
from unet_zoo_tpu.experiments.config import ExperimentConfig, SystemConfig
from unet_zoo_tpu.models.registry import get_model
from unet_zoo_tpu.training.schedule import plateau_update
from unet_zoo_tpu.training.state import (
    TrainState,
    restore_checkpoint,
    save_checkpoint,
)

log = logging.getLogger(__name__)


def adam_coupled_l2(
    learning_rate,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=wd) parity (reference train_model.py:49):
    the L2 term is COUPLED — added to the gradient before the adaptive
    moments — unlike AdamW's decoupled lr*wd*theta update, so training
    dynamics match the reference exactly."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


class Trainer:
    def __init__(
        self,
        exp_config: ExperimentConfig,
        sys_config: Optional[SystemConfig] = None,
        log_dir: Optional[str] = None,
        seed: Optional[int] = None,
        mesh=None,
        tensorboard: bool = True,
    ):
        """``mesh``: optional jax.sharding.Mesh from
        unet_zoo_tpu.parallel.make_mesh — batch shards over its "data" axis
        (and image height over "space"); params/opt state are replicated and
        XLA inserts the gradient all-reduce (no reference counterpart,
        SURVEY.md §2.4)."""
        exp_config.validate()
        self.cfg = exp_config
        self.sys_config = sys_config or SystemConfig()
        self.log_dir = log_dir or os.path.join(
            self.sys_config.log_root,
            exp_config.log_dir_name,
            exp_config.experiment_name,
        )
        os.makedirs(self.log_dir, exist_ok=True)

        self.model = get_model(exp_config.model, **exp_config.model_kwargs())
        self.family = exp_config.model  # unet | prob_unet | phiseg | phiseg3d

        self.tx = optax.inject_hyperparams(adam_coupled_l2)(
            learning_rate=exp_config.learning_rate,
            weight_decay=exp_config.weight_decay,
        )

        seed = exp_config.seed if seed is None else seed
        root = jax.random.PRNGKey(seed)
        k_params, k_z, k_state = jax.random.split(root, 3)
        x0, y0 = self._dummy_batch()
        init_rngs = {"params": k_params, "z": k_z}
        if self.family == "unet":
            variables = self.model.init(init_rngs, x0, train=True)
        else:
            variables = self.model.init(init_rngs, x0, y0, train=True)
        self.state = TrainState.create(
            variables, self.tx, exp_config.learning_rate, k_state
        )
        self.iteration = 0
        self.best = {
            "dice": -1.0,
            "loss": float("inf"),
            "ged": float("inf"),
            "ncc": -1.0,
        }
        self.seed = seed
        self.host_rng = np.random.default_rng(seed)
        self.mesh = mesh
        # multi-host layout (SURVEY.md §5): every process runs this same
        # Trainer; process 0 owns checkpoints/metrics, batches are global
        # arrays assembled from each process's addressable shards
        self._is_main = jax.process_index() == 0
        self._multiprocess = mesh is not None and jax.process_count() > 1
        if mesh is None:
            self._train_step = jax.jit(self._step_fn, donate_argnums=0)
        else:
            from unet_zoo_tpu.parallel.mesh import (
                batch_spec,
                host_to_global,
                replicated,
                shard_label_spec,
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = replicated(mesh)
            self._batch_spec = batch_spec(mesh, len(exp_config.image_size))
            label_rank = 1 + len(exp_config.image_size) + (
                1 if (exp_config.model == "phiseg3d"
                      and exp_config.data_loader == "brats") else 0
            )
            self._label_spec = shard_label_spec(mesh, label_rank)
            xs = NamedSharding(mesh, self._batch_spec)
            ys = NamedSharding(mesh, self._label_spec)
            if self._multiprocess:
                # device_put can't reach other hosts' devices; build global
                # replicated arrays from the identically-seeded local state
                self.state = jax.tree_util.tree_map(
                    lambda a: host_to_global(mesh, P(), a), self.state
                )
            else:
                self.state = jax.device_put(self.state, repl)
            self._train_step = jax.jit(
                self._step_fn,
                donate_argnums=0,
                in_shardings=(repl, xs, ys),
                out_shardings=(repl, repl),
            )
        self._val_cache: Dict[Any, Any] = {}

        # metrics stream pair (reference SummaryWriter pair,
        # train_model.py:89-91); JSONL always, TB events when available
        from unet_zoo_tpu.utils.summary import MetricsWriter

        self.training_writer = MetricsWriter(
            self.log_dir, "train", tensorboard=tensorboard
        )
        self.validation_writer = MetricsWriter(
            self.log_dir, "validation", tensorboard=tensorboard
        )

        if exp_config.pretrained_model is not None:
            path = os.path.join(self.log_dir, exp_config.pretrained_model)
            if os.path.exists(path):
                log.info("loading pretrained model %s", path)
                self._restore_state(path)
            else:
                # missing-file fallback continues fresh (reference :63-67)
                log.info("pretrained %s not found; training from scratch", path)

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    def _localize_tree(self, tree):
        """Multi-process: map every non-fully-addressable (global) leaf to
        its first local shard as numpy. All Trainer global arrays are fully
        REPLICATED, so the local shard IS the full value; device_get on a
        multi-process array instead tries to touch remote buffers (it even
        spins up a fresh collective context) and deadlocks when the other
        processes aren't participating."""

        def localize(a):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                return np.asarray(a.addressable_data(0))
            return a

        if not self._multiprocess:
            return tree
        return jax.tree_util.tree_map(localize, tree)

    def _restore_state(self, path: str) -> None:
        """restore_checkpoint + (multi-host) re-globalization: orbax hands
        back host-local arrays, which a multi-process jit cannot consume —
        every process restores the same bytes and rebuilds the replicated
        global arrays (template is localized first: device_get on global
        arrays cannot run per-process)."""
        self.state = restore_checkpoint(path, self._localize_tree(self.state))
        if self._multiprocess:
            from jax.sharding import PartitionSpec as P

            from unet_zoo_tpu.parallel.mesh import host_to_global

            self.state = jax.tree_util.tree_map(
                lambda a: host_to_global(self.mesh, P(), a), self.state
            )

    def _dummy_batch(self):
        cfg = self.cfg
        x = jnp.zeros((1, *cfg.image_size, cfg.input_channels), jnp.float32)
        if cfg.model == "phiseg3d" and cfg.data_loader == "brats":
            y = jnp.zeros((1, *cfg.image_size, cfg.n_classes), jnp.float32)
        else:
            y = jnp.zeros((1, *cfg.image_size), jnp.int32)
        return x, y

    # ------------------------------------------------------------------
    # the jitted train step
    # ------------------------------------------------------------------

    def _forward_loss(self, params, batch_stats, x, y, key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if self.family == "unet":
            logits, mut = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            loss, aux = self.model.loss(logits, y)
        else:
            out, mut = self.model.apply(
                variables,
                x,
                y,
                train=True,
                rngs={"z": key},
                mutable=["batch_stats"],
            )
            loss, aux = self.model.loss(out, y, params)
        return loss, (aux, mut.get("batch_stats", {}))

    def _step_fn(self, state: TrainState, x, y):
        # spatial-sharding constraints for the whole step's trace: no-op
        # unless the mesh has a real "space" axis (parallel/space.py)
        from unet_zoo_tpu.parallel.space import space_sharding

        with space_sharding(self.mesh):
            return self._step_fn_inner(state, x, y)

    def _step_fn_inner(self, state: TrainState, x, y):
        cfg = self.cfg
        rng, k_aug, k_z = jax.random.split(state.rng, 3)

        if cfg.augment_on == "device":
            if cfg.augmentation_options is not None and not cfg.is_3d:
                x, y = augment_batch_2d(k_aug, x, y, cfg.augmentation_options)
            elif cfg.augmentation_options_3d is not None and cfg.is_3d:
                x, y = augment_batch_3d(k_aug, x, y, cfg.augmentation_options_3d)

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            self._forward_loss, has_aux=True
        )(state.params, state.batch_stats, x, y, k_z)

        # plateau scheduler on the per-iteration train loss (reference :134)
        sched = plateau_update(
            state.sched,
            loss,
            factor=cfg.lr_plateau_factor,
            patience=cfg.lr_plateau_patience,
            min_lr=cfg.min_lr,
        )
        opt_state = state.opt_state
        hyper = dict(opt_state.hyperparams)
        hyper["learning_rate"] = sched.lr
        opt_state = opt_state._replace(hyperparams=hyper)

        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_bs if new_bs else state.batch_stats,
            opt_state=opt_state,
            sched=sched,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, aux

    # ------------------------------------------------------------------
    # train loop (reference train_model.py:94-136)
    # ------------------------------------------------------------------

    def train(self, data, iterations: Optional[int] = None, validate: bool = True):
        """Run the iteration loop up to ``iterations`` (default
        cfg.iterations) TOTAL steps. The loop counter starts from the
        state's step, so a resumed trainer continues toward the same total
        rather than running a full extra budget."""
        cfg = self.cfg
        n_iter = iterations if iterations is not None else cfg.iterations
        start = int(self.state.step)
        if start >= n_iter:
            log.info("state already at step %d >= %d; nothing to do", start, n_iter)
            return None
        log.info(
            "starting training: filters=%s batch=%d",
            cfg.filter_channels,
            cfg.batch_size,
        )
        train_source = data.train
        loader = None
        host_opts = (
            cfg.augmentation_options_3d if cfg.is_3d else cfg.augmentation_options
        )
        if cfg.augment_on == "host" and host_opts is not None:
            from unet_zoo_tpu.data.augment_host import PrefetchingLoader

            loader = PrefetchingLoader(
                data.train,
                cfg.batch_size,
                opts=host_opts,
                rng=self.host_rng,
            )
            train_source = loader
        last_aux = None
        try:
            for self.iteration in range(start + 1, n_iter + 1):
                x_b, y_b = train_source.next_batch(cfg.batch_size)
                if self._multiprocess:
                    # every process draws the IDENTICAL global batch (same
                    # provider seed); each contributes only its addressable
                    # shards to the global array (parallel/mesh.py
                    # host_to_global) — no cross-host data motion
                    from unet_zoo_tpu.parallel.mesh import host_to_global

                    x_in = host_to_global(self.mesh, self._batch_spec, x_b)
                    y_in = host_to_global(self.mesh, self._label_spec, y_b)
                else:
                    x_in, y_in = jnp.asarray(x_b), jnp.asarray(y_b)
                self.state, aux = self._train_step(self.state, x_in, y_in)
                last_aux = aux
                if validate and self.iteration % cfg.validation_frequency == 0:
                    # multi-host: params are replicated, so process 0
                    # validates alone on its local replica (no collectives
                    # -> no cross-process sync hazard); others keep training
                    # state in lockstep by simply skipping
                    if not self._multiprocess or self._is_main:
                        self.validate(data)
                if self.iteration % cfg.logging_frequency == 0 and self._is_main:
                    log.info(
                        "iteration %d loss %.5f", self.iteration, float(aux["loss"])
                    )
                    self.training_writer.scalars(
                        self.iteration,
                        {
                            "loss": float(aux["loss"]),
                            "kl": float(aux["kl"]),
                            "recon": float(aux["recon"]),
                            "lr": float(self.state.sched.lr),
                        },
                    )
        finally:
            # an exception anywhere above must not leak the producer thread
            if loader is not None:
                loader.close()
        log.info("finished training.")
        return last_aux

    # ------------------------------------------------------------------
    # validation (reference train_model.py:138-275)
    # ------------------------------------------------------------------

    def _local_variables(self):
        """Host-local copy of the model variables (see _localize_tree) —
        validation/eval then run purely locally (no collectives), which
        lets process 0 evaluate alone while the others keep training in
        lockstep."""
        return self._localize_tree(self.state.variables)

    def _eval_variables(self):
        """Device variables for the eval programs. Single-process: the
        state's variables are already on device — hand them to the jitted
        eval directly, no host round-trip per validation (the reference
        logs validation duration as a first-class number,
        train_model.py:157,273; through the remote-TPU tunnel a params
        re-upload per call is the dominant validation overhead).
        Multi-process: localize to this host and re-upload — process 0
        evaluates alone and the global (non-addressable) arrays cannot
        feed a local jit."""
        if not self._multiprocess:
            return self.state.variables
        return jax.device_put(self._local_variables())

    def _eval_rng(self, salt: int = 0):
        """Host RNG for eval-time annotator picks, derived from (seed,
        iteration, salt) only. validate()/test() must NOT consume
        self.host_rng: that generator seeds the host-augmentation loader
        (train:334-341), and under multi-host training only process 0
        validates — consuming the shared stream there would desynchronize
        the 'identical global batch' invariant host_to_global relies on
        after the first validation."""
        return np.random.default_rng([self.seed, self.iteration, salt])

    def _eval_image_fn(self, n_samples: int, n_loss: int = 1):
        """Jitted: (variables, x (1,*S,C), y_all (A,*S), y_chosen (1,*S), key)
        -> scalar metric dict. One device program per validation image.

        ``n_loss``: batch-repeat count for the eval-mode ELBO — the
        reference computes the validation loss on the 16-repeat batch
        arrangement (train_model.py:177-192: the loss is the batch mean
        over validation_samples z-draws of the same image); validate()
        passes cfg.validation_samples to reproduce that. test() keeps 1:
        the reference quantitative sweep (train_model.py:364-447) never
        consumes a loss."""
        cfg = self.cfg
        label_range = tuple(range(1, cfg.n_classes))

        def fn(variables, x, y_all, y_chosen, key):
            probs = self.model.apply(
                variables,
                x,
                n_samples,
                train=False,
                method=self.model.sample,
                rngs={"z": key},
            )  # (1, n, *S, C) logits
            # class axis FIRST for everything downstream: (n, *S, C) with
            # tiny C on the lane dim is tile-padded C->128 (64x traffic at
            # C=2); (C, n, *S) keeps the lanes on the spatial dims. The
            # 100-sample-eval softmax div (6.4 ms) disappears, but ~4.5 ms
            # reappears inside the likelihood-head conv fusions (the padded
            # head output must still be read once to transpose) — net
            # device win ~1.8 ms of 36.8 (measured round 3)
            logits_cf = jnp.moveaxis(probs[0].astype(jnp.float32), -1, 0)
            probs_cf = jax.nn.softmax(logits_cf, axis=0)  # (C, n, *S)
            pred_labels = jnp.argmax(logits_cf, axis=0)  # (n, *S)
            ged = M.generalised_energy_distance(
                pred_labels,
                y_all,
                nlabels=cfg.n_classes - 1,
                label_range=label_range,
            )
            gt_cf = jnp.stack(
                [(y_all == c).astype(jnp.float32) for c in range(cfg.n_classes)]
            )  # (C, A, *S) one-hot, class-first
            ncc = M.variance_ncc_dist_class_first(probs_cf, gt_cf)
            mean_probs_cf = jnp.mean(probs_cf, axis=1)  # (C, *S)
            mean_pred = jnp.argmax(mean_probs_cf, axis=0)
            dice = M.dice_per_label(mean_pred, y_chosen[0], cfg.n_classes)
            # eval-mode loss on the chosen-annotator mask (reference
            # :189-192), on the n_loss-repeat batch arrangement: each row
            # draws its own z, the loss batch-means over them (BN runs on
            # running stats at train=False, so repeats are exact)
            if self.family == "unet":
                logits = self.model.apply(variables, x, train=False)
                loss, aux = self.model.loss(logits, y_chosen)
            else:
                x_rep = jnp.broadcast_to(x, (n_loss,) + x.shape[1:])
                y_rep = jnp.broadcast_to(y_chosen, (n_loss,) + y_chosen.shape[1:])
                out = self.model.apply(
                    variables, x_rep, y_rep, train=False,
                    rngs={"z": jax.random.fold_in(key, 1)},
                )
                loss, aux = self.model.loss(out, y_rep, variables["params"])
            return {
                "ged": ged,
                "ncc": ncc,
                "dice": dice,
                "loss": loss,
                "kl": aux["kl"],
                "recon": aux["recon"],
                # small int maps for TB image panels (reference
                # _create_tensorboard_summary, train_model.py:299-331)
                "mean_pred": mean_pred.astype(jnp.int32),
                "sample0": pred_labels[0].astype(jnp.int32),
            }

        return jax.jit(fn)

    def validate(self, data):
        cfg = self.cfg
        if cfg.is_3d and cfg.data_loader == "brats":
            return self.validate_brats(data)
        t0 = time.time()
        self.save_model("validation_ckpt")
        self._log_memory()

        n_val = (
            data.validation.images.shape[0]
            if cfg.num_validation_images == "all"
            else min(cfg.num_validation_images, data.validation.images.shape[0])
        )
        key = ("eval", cfg.validation_samples, cfg.validation_samples)
        if key not in self._val_cache:
            self._val_cache[key] = self._eval_image_fn(
                cfg.validation_samples, n_loss=cfg.validation_samples
            )
        eval_fn = self._val_cache[key]

        annotators = (
            list(cfg.annotator_range)
            if cfg.annotator_range is not None
            else list(range(cfg.num_labels_per_subject))
        )
        variables = self._eval_variables()
        val_rng = self._eval_rng()
        # Enqueue ALL per-image programs, then fetch once: jit dispatch is
        # async, so the loop costs one upload per image while the device
        # streams through the queue; the old per-image device_get paid
        # 2xRTT x n_images of pure tunnel latency (~26 ms RTT here — the
        # reference logs validation duration as a first-class number,
        # train_model.py:157,273).
        chosen = []
        outs = []
        for ii in range(n_val):
            x = np.asarray(data.validation.images[ii], dtype=np.float32)
            y_all = np.asarray(data.validation.labels[ii])  # (*S, A)
            a = val_rng.choice(annotators)
            chosen.append(a)
            y_chosen = y_all[..., a]
            y_all_t = np.moveaxis(y_all, -1, 0)  # (A, *S)
            outs.append(
                eval_fn(
                    variables,
                    jnp.asarray(x)[None, ..., None],
                    jnp.asarray(y_all_t, dtype=jnp.int32),
                    jnp.asarray(y_chosen, dtype=jnp.int32)[None],
                    jax.random.fold_in(self.state.rng, ii),
                )
            )
        results = jax.device_get(outs)

        # validation image panels: input / GT / mean prediction / one sample
        # (reference _create_tensorboard_summary, train_model.py:299-331 —
        # there the call is commented out at :129; here it's live)
        nlab = max(cfg.n_classes - 1, 1)
        for ii in range(min(n_val, 4)):
            x = np.asarray(data.validation.images[ii], dtype=np.float32)
            lo, hi = float(x.min()), float(x.max())
            panel = [
                (x - lo) / max(hi - lo, 1e-8),
                # the SAME annotator the Dice above was computed against
                # (val_rng.choice), not annotator 0
                np.asarray(data.validation.labels[ii])[..., chosen[ii]] / nlab,
                np.asarray(results[ii]["mean_pred"]) / nlab,
                np.asarray(results[ii]["sample0"]) / nlab,
            ]
            self.validation_writer.image(
                self.iteration, f"panel_{ii}", np.concatenate(panel, axis=1)
            )

        agg = {
            k: float(np.mean([r[k] for r in results]))
            for k in ("ged", "ncc", "loss", "kl", "recon")
        }
        dice_arr = np.stack([r["dice"] for r in results])  # (n, C)
        agg["dice"] = float(dice_arr.mean())
        agg["foreground_dice"] = float(dice_arr[:, 1:].mean())
        per_structure_dice = dice_arr.mean(axis=0)

        log.info(
            "validation @%d: dice %.4f fg-dice %.4f elbo %.4f ged %.4f ncc %.4f"
            " (%.1fs)",
            self.iteration,
            agg["dice"],
            agg["foreground_dice"],
            agg["loss"],
            agg["ged"],
            agg["ncc"],
            time.time() - t0,
        )

        # best-per-metric checkpointing (reference train_model.py:256-271)
        mean_dice = float(per_structure_dice.mean())
        if mean_dice >= self.best["dice"]:
            self.best["dice"] = mean_dice
            self.save_model("best_dice")
        if agg["loss"] <= self.best["loss"]:
            self.best["loss"] = agg["loss"]
            self.save_model("best_loss")
        if agg["ged"] <= self.best["ged"]:
            self.best["ged"] = agg["ged"]
            self.save_model("best_ged")
        if agg["ncc"] >= self.best["ncc"]:
            self.best["ncc"] = agg["ncc"]
            self.save_model("best_ncc")
        self.validation_writer.scalars(self.iteration, agg)
        return agg

    def _eval_volume_fn(self, n_samples: int):
        """BraTS eval: per-region (WT/TC/ET) dice of the mean prediction +
        eval-mode loss. The reference's BraTS trainer is vestigial/broken
        (train_model.py:277-297 calls a nonexistent loss method); this is the
        working equivalent using the bratsUtils metrics
        (reference data/bratsUtils.py:6-93)."""

        def fn(variables, x, y_onehot, key):
            logits = self.model.apply(
                variables,
                x,
                n_samples,
                train=False,
                method=self.model.sample,
                rngs={"z": key},
            )  # (1, n, D, H, W, C)
            probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
            mean_probs = jnp.mean(probs, axis=0)
            nreg = y_onehot.shape[-1]
            dice = jnp.stack(
                [
                    M.dice_binary(mean_probs[..., c] > 0.5, y_onehot[0, ..., c])
                    for c in range(nreg)
                ]
            )
            # full reference metric set (data/bratsUtils.py:6-93)
            sens = jnp.stack(
                [M.sensitivity(mean_probs[..., c], y_onehot[0, ..., c])
                 for c in range(nreg)]
            )
            spec = jnp.stack(
                [M.specificity(mean_probs[..., c], y_onehot[0, ..., c])
                 for c in range(nreg)]
            )
            out = self.model.apply(
                variables, x, y_onehot, train=False, rngs={"z": key}
            )
            loss, aux = self.model.loss(out, y_onehot, variables["params"])
            return {"dice": dice, "sens": sens, "spec": spec,
                    "loss": loss, "kl": aux["kl"], "recon": aux["recon"],
                    "pred_bin": (mean_probs > 0.5)}

        return jax.jit(fn)

    def validate_brats(self, data):
        cfg = self.cfg
        t0 = time.time()
        self.save_model("validation_ckpt")
        self._log_memory()
        n_val = (
            data.validation.images.shape[0]
            if cfg.num_validation_images == "all"
            else min(cfg.num_validation_images, data.validation.images.shape[0])
        )
        key = ("brats", cfg.validation_samples)
        if key not in self._val_cache:
            self._val_cache[key] = self._eval_volume_fn(cfg.validation_samples)
        eval_fn = self._val_cache[key]
        variables = self._eval_variables()
        # Enqueue ALL per-volume programs, then fetch in bounded chunks:
        # jit dispatch is async, so the device streams through the queue
        # while the host runs the HD95 EDT on already-fetched volumes —
        # same pipelining as validate() (the old per-volume device_get
        # paid 2xRTT of tunnel latency per volume AND serialized the host
        # EDT against device compute). Chunking bounds live host copies of
        # the (D, H, W, 3) pred_bin volumes.
        outs = []
        for ii in range(n_val):
            img, lbl, _pid = data.get(ii, "validation")
            outs.append(
                eval_fn(
                    variables,
                    jnp.asarray(img)[None],
                    jnp.asarray(lbl)[None],
                    jax.random.fold_in(self.state.rng, ii),
                )
            )
        results = []
        hd95_rows = []
        chunk = 8
        for base in range(0, n_val, chunk):
            fetched = jax.device_get(outs[base : base + chunk])
            for ii, out in enumerate(fetched, start=base):
                img, lbl, _pid = data.get(ii, "validation")
                # HD95 per region, host-side EDT (eval-only; reference
                # getHd95, data/bratsUtils.py:80-93)
                pred_bin = np.asarray(out["pred_bin"])
                lbl_np = np.asarray(lbl)
                hd95_rows.append(
                    [M.hd95(pred_bin[..., c], lbl_np[..., c])
                     for c in range(lbl_np.shape[-1])]
                )
                if ii < 2:  # mid-depth slice panel: image / GT-WT / pred-WT
                    mid = img.shape[0] // 2
                    x_sl = np.asarray(img[mid, ..., 0], dtype=np.float32)
                    lo, hi = float(x_sl.min()), float(x_sl.max())
                    panel = np.concatenate(
                        [
                            (x_sl - lo) / max(hi - lo, 1e-8),
                            lbl_np[mid, ..., 0].astype(np.float32),
                            pred_bin[mid, ..., 0].astype(np.float32),
                        ],
                        axis=1,
                    )
                    self.validation_writer.image(
                        self.iteration, f"panel_{ii}", panel
                    )
                results.append(out)
        dice_arr = np.stack([r["dice"] for r in results])  # (n, 3) WT/TC/ET
        sens_arr = np.stack([r["sens"] for r in results])
        spec_arr = np.stack([r["spec"] for r in results])
        hd95_arr = np.asarray(hd95_rows)  # (n, 3); -1 where a mask was empty
        hd95_valid = np.ma.masked_equal(hd95_arr, -1.0)
        agg = {
            "loss": float(np.mean([r["loss"] for r in results])),
            "kl": float(np.mean([r["kl"] for r in results])),
            "recon": float(np.mean([r["recon"] for r in results])),
            "dice": float(dice_arr.mean()),
            "dice_wt": float(dice_arr[:, 0].mean()),
            "dice_tc": float(dice_arr[:, 1].mean()),
            "dice_et": float(dice_arr[:, 2].mean()),
            "sensitivity_wt": float(sens_arr[:, 0].mean()),
            "sensitivity_tc": float(sens_arr[:, 1].mean()),
            "sensitivity_et": float(sens_arr[:, 2].mean()),
            "specificity_wt": float(spec_arr[:, 0].mean()),
            "specificity_tc": float(spec_arr[:, 1].mean()),
            "specificity_et": float(spec_arr[:, 2].mean()),
            "hd95_wt": float(np.ma.filled(hd95_valid[:, 0].mean(), -1.0)),
            "hd95_tc": float(np.ma.filled(hd95_valid[:, 1].mean(), -1.0)),
            "hd95_et": float(np.ma.filled(hd95_valid[:, 2].mean(), -1.0)),
        }
        log.info(
            "brats validation @%d: dice WT %.4f TC %.4f ET %.4f "
            "sens WT %.4f spec WT %.4f hd95 WT %.2f loss %.4f (%.1fs)",
            self.iteration, agg["dice_wt"], agg["dice_tc"], agg["dice_et"],
            agg["sensitivity_wt"], agg["specificity_wt"], agg["hd95_wt"],
            agg["loss"], time.time() - t0,
        )
        if agg["dice"] >= self.best["dice"]:
            self.best["dice"] = agg["dice"]
            self.save_model("best_dice")
        if agg["loss"] <= self.best["loss"]:
            self.best["loss"] = agg["loss"]
            self.save_model("best_loss")
        self.validation_writer.scalars(self.iteration, agg)
        return agg

    # ------------------------------------------------------------------
    # test sweep (reference train_model.py:333-475)
    # ------------------------------------------------------------------

    def test(
        self,
        data,
        num_repeats: int = 10,
        num_samples: int = 10,
        checkpoint: Optional[str] = "best_loss",
        save_npz: bool = True,
    ):
        """The quantitative protocol: `num_repeats` sweeps over the test set,
        `num_samples` prior samples each; dumps raw GED/NCC tensors to npz.

        BraTS/3D configs dispatch to `test_brats` (one-hot WT/TC/ET labels,
        4-channel input, per-region dice/sensitivity/specificity/HD95) —
        the reference has no working quantitative BraTS eval at all (its
        BraTS harness is dead code, train_model.py:277-297)."""
        cfg = self.cfg
        if cfg.is_3d and cfg.data_loader == "brats":
            return self.test_brats(
                data,
                num_repeats=num_repeats,
                num_samples=num_samples,
                checkpoint=checkpoint,
                save_npz=save_npz,
            )
        if checkpoint is not None:
            path = os.path.join(self.log_dir, checkpoint)
            if os.path.exists(path):
                self._restore_state(path)
            else:
                raise FileNotFoundError(
                    f"checkpoint '{checkpoint}' not found in {self.log_dir}"
                )
        key = ("eval", num_samples, 1)
        if key not in self._val_cache:
            self._val_cache[key] = self._eval_image_fn(num_samples)
        eval_fn = self._val_cache[key]

        annotators = (
            list(cfg.annotator_range)
            if cfg.annotator_range is not None
            else list(range(cfg.num_labels_per_subject))
        )
        n_images = data.test.images.shape[0]
        variables = self._eval_variables()
        test_rng = self._eval_rng(salt=1)
        ged_mat = np.zeros((num_repeats, n_images))
        ncc_mat = np.zeros((num_repeats, n_images))
        dice_mat = np.zeros((num_repeats, n_images, cfg.n_classes))
        t0 = time.time()
        for rep in range(num_repeats):
            # enqueue the whole repeat, fetch once (same pipelining as
            # validate(): per-image device_get cost 2xRTT x n_images of
            # tunnel latency); per-repeat chunking keeps at most n_images
            # small output dicts live on device
            outs = []
            for ii in range(n_images):
                x = np.asarray(data.test.images[ii], dtype=np.float32)
                y_all = np.asarray(data.test.labels[ii])
                a = test_rng.choice(annotators)
                outs.append(
                    eval_fn(
                        variables,
                        jnp.asarray(x)[None, ..., None],
                        jnp.asarray(np.moveaxis(y_all, -1, 0), dtype=jnp.int32),
                        jnp.asarray(y_all[..., a], dtype=jnp.int32)[None],
                        jax.random.fold_in(self.state.rng, rep * n_images + ii),
                    )
                )
            for ii, out in enumerate(jax.device_get(outs)):
                ged_mat[rep, ii] = out["ged"]
                ncc_mat[rep, ii] = out["ncc"]
                dice_mat[rep, ii] = out["dice"]
        results = {
            "ged": (float(ged_mat.mean()), float(ged_mat.std())),
            "ncc": (float(ncc_mat.mean()), float(ncc_mat.std())),
            "dice": (float(dice_mat.mean()), float(dice_mat.std())),
            "seconds": time.time() - t0,
        }
        log.info(
            "test: GED %.4f±%.4f NCC %.4f±%.4f Dice %.4f±%.4f",
            *results["ged"],
            *results["ncc"],
            *results["dice"],
        )
        if save_npz:
            np.savez(
                os.path.join(self.log_dir, "test_results.npz"),
                ged=ged_mat,
                ncc=ncc_mat,
                dice=dice_mat,
            )
        return results

    def _brats_eval_split(self, data) -> str:
        """The faithful reference split never populates 'test'
        (brats18_data_loader.py:22-29 can only return train/validation), so
        quantitative eval falls back to the validation split when the test
        split is empty."""
        if data.num_examples("test") > 0:
            return "test"
        log.info("BraTS test split is empty; evaluating the validation split")
        return "validation"

    def test_brats(
        self,
        data,
        num_repeats: int = 10,
        num_samples: int = 10,
        checkpoint: Optional[str] = "best_loss",
        save_npz: bool = True,
    ):
        """Quantitative BraTS sweep: `num_repeats` passes over the eval
        split, `num_samples` prior samples each; per-region (WT/TC/ET)
        dice / sensitivity / specificity on device + HD95 on host
        (metric semantics: reference data/bratsUtils.py:6-93), raw tensors
        dumped to brats_test_results.npz."""
        cfg = self.cfg
        if checkpoint is not None:
            path = os.path.join(self.log_dir, checkpoint)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"checkpoint '{checkpoint}' not found in {self.log_dir}"
                )
            self._restore_state(path)
        key = ("brats", num_samples)
        if key not in self._val_cache:
            self._val_cache[key] = self._eval_volume_fn(num_samples)
        eval_fn = self._val_cache[key]
        split = self._brats_eval_split(data)
        n_vols = data.num_examples(split)
        variables = self._eval_variables()
        nreg = cfg.n_classes
        dice = np.zeros((num_repeats, n_vols, nreg))
        sens = np.zeros((num_repeats, n_vols, nreg))
        spec = np.zeros((num_repeats, n_vols, nreg))
        hd95 = np.zeros((num_repeats, n_vols, nreg))
        t0 = time.time()
        for rep in range(num_repeats):
            # enqueue the whole repeat, then fetch once (same pipelining
            # as test()/validate(): per-volume device_get paid 2xRTT of
            # tunnel latency per dispatch and serialized the host HD95
            # EDT against device compute)
            outs = []
            for ii in range(n_vols):
                img, lbl, _pid = data.get(ii, split)
                outs.append(
                    eval_fn(
                        variables,
                        jnp.asarray(img)[None],
                        jnp.asarray(lbl)[None],
                        jax.random.fold_in(
                            self.state.rng, rep * n_vols + ii
                        ),
                    )
                )
            for ii, out in enumerate(jax.device_get(outs)):
                _img, lbl, _pid = data.get(ii, split)
                dice[rep, ii] = out["dice"]
                sens[rep, ii] = out["sens"]
                spec[rep, ii] = out["spec"]
                pred_bin = np.asarray(out["pred_bin"])
                lbl_np = np.asarray(lbl)
                hd95[rep, ii] = [
                    M.hd95(pred_bin[..., c], lbl_np[..., c])
                    for c in range(nreg)
                ]
        hd95_valid = np.ma.masked_equal(hd95, -1.0)
        results = {
            "dice": (float(dice.mean()), float(dice.std())),
            "dice_per_region": dice.mean(axis=(0, 1)).tolist(),
            "sensitivity_per_region": sens.mean(axis=(0, 1)).tolist(),
            "specificity_per_region": spec.mean(axis=(0, 1)).tolist(),
            "hd95_per_region": [
                float(np.ma.filled(hd95_valid[:, :, c].mean(), -1.0))
                for c in range(nreg)
            ],
            "seconds": time.time() - t0,
        }
        log.info(
            "brats test (%s split): dice %.4f±%.4f per-region %s hd95 %s",
            split,
            *results["dice"],
            np.round(results["dice_per_region"], 4),
            np.round(results["hd95_per_region"], 2),
        )
        if save_npz:
            np.savez(
                os.path.join(self.log_dir, "brats_test_results.npz"),
                dice=dice,
                sensitivity=sens,
                specificity=spec,
                hd95=hd95,
            )
        return results

    def export_predictions(
        self,
        data,
        num_samples: int = 10,
        out_dir: Optional[str] = None,
        split: Optional[str] = None,
    ):
        """BraTS prediction export: mean prediction -> BraTS label map
        (ET=4, TC\\ET=1, WT\\TC=2 — inverse of the WT/TC/ET one-hot,
        bratsDataset.py:125-131) -> largest connected component per label
        (reference BratsProcessing/utils.py:228-249) -> reassembled into
        the ORIGINAL volume geometry when the cache carries crop offsets
        (reference brats18_validation_data_loader.py:39-51) -> .nii.gz."""
        from unet_zoo_tpu.data.brats import reassemble_to_original
        from unet_zoo_tpu.utils.nii import save_nii
        from unet_zoo_tpu.utils.postprocess import (
            keep_largest_connected_components,
        )

        cfg = self.cfg
        out_dir = out_dir or os.path.join(self.log_dir, "predictions")
        os.makedirs(out_dir, exist_ok=True)
        split = split or self._brats_eval_split(data)
        key = ("brats", num_samples)
        if key not in self._val_cache:
            self._val_cache[key] = self._eval_volume_fn(num_samples)
        eval_fn = self._val_cache[key]
        variables = self._eval_variables()
        paths = []
        n_vols = data.num_examples(split)
        # enqueue everything, fetch chunked (same pipelining as
        # validate_brats: the CC-filter + nii write of volume i overlaps
        # device compute of volume i+1…)
        outs = []
        for ii in range(n_vols):
            img, lbl, _pid = data.get(ii, split)
            outs.append(
                eval_fn(
                    variables,
                    jnp.asarray(img)[None],
                    jnp.asarray(lbl)[None],
                    jax.random.fold_in(self.state.rng, ii),
                )
            )
        chunk = 8

        def _fetch_chunked():
            for base in range(0, n_vols, chunk):
                yield from enumerate(
                    jax.device_get(outs[base : base + chunk]), start=base
                )

        for ii, out in _fetch_chunked():
            _img, _lbl, pid = data.get(ii, split)
            wt, tc, et = (np.asarray(out["pred_bin"][..., c]) for c in range(3))
            labels = np.zeros(wt.shape, np.uint8)
            labels[wt] = 2
            labels[tc] = 1
            labels[et] = 4
            labels = keep_largest_connected_components(labels)
            offs = data.offsets(ii, split)
            if offs is not None:
                lo, hi, orig_shape = offs
                labels = reassemble_to_original(
                    labels, tuple(orig_shape), tuple(lo), tuple(hi)
                )
            else:
                log.info(
                    "no crop offsets in cache; exporting pid %d on the "
                    "preprocessed %s grid", pid, labels.shape,
                )
            path = os.path.join(out_dir, f"prediction_{pid}.nii.gz")
            save_nii(path, labels.astype(np.uint8))
            paths.append(path)
        log.info("wrote %d predictions to %s", len(paths), out_dir)
        return paths

    # ------------------------------------------------------------------
    # image generation (reference train_model.py:477-555)
    # ------------------------------------------------------------------

    def generate_images(
        self, data, num_samples: int = 10, out_dir: Optional[str] = None,
        max_images: Optional[int] = 10,
    ):
        """Sample PNG dumps per test image (reference train_model.py:477-555,
        2D only there). 3D/BraTS configs write mid-depth slices: the flair
        channel, the GT whole-tumor mask, and each sample's WT prediction."""
        from PIL import Image

        out_dir = out_dir or os.path.join(self.log_dir, "samples")
        os.makedirs(out_dir, exist_ok=True)
        cfg = self.cfg
        is_brats = cfg.is_3d and cfg.data_loader == "brats"
        variables = self._eval_variables()
        sample_fn = jax.jit(
            partial(self.model.apply, train=False, method=self.model.sample),
            static_argnums=(2,),  # the sample count sets a vmap axis size
        )

        def to_png(arr, path):
            arr = np.asarray(arr, dtype=np.float32)
            lo, hi = arr.min(), arr.max()
            arr = (arr - lo) / max(hi - lo, 1e-8)
            Image.fromarray((arr * 255).astype(np.uint8)).save(path)

        if is_brats:
            split = self._brats_eval_split(data)
            n = data.num_examples(split)
            if max_images is not None:
                n = min(n, max_images)
            for ii in range(n):
                img, lbl, _pid = data.get(ii, split)
                logits = sample_fn(
                    variables,
                    jnp.asarray(img)[None],
                    num_samples,
                    rngs={"z": jax.random.fold_in(self.state.rng, ii)},
                )  # (1, n, D, H, W, C)
                probs = jax.nn.softmax(
                    logits[0].astype(jnp.float32), axis=-1
                )
                preds_wt = np.asarray(probs[..., 0] > 0.5)  # (n, D, H, W)
                mid = img.shape[0] // 2
                to_png(img[mid, ..., -1], os.path.join(out_dir, f"img_{ii}.png"))
                to_png(
                    np.asarray(lbl)[mid, ..., 0],
                    os.path.join(out_dir, f"gt_{ii}.png"),
                )
                for s in range(num_samples):
                    to_png(
                        preds_wt[s, mid],
                        os.path.join(out_dir, f"sample_{ii}_{s}.png"),
                    )
            log.info("wrote 3D slice PNGs to %s", out_dir)
            return out_dir

        n = data.test.images.shape[0]
        if max_images is not None:
            n = min(n, max_images)
        for ii in range(n):
            x = np.asarray(data.test.images[ii], dtype=np.float32)
            logits = sample_fn(
                variables,
                jnp.asarray(x)[None, ..., None],
                num_samples,
                rngs={"z": jax.random.fold_in(self.state.rng, ii)},
            )
            preds = np.asarray(jnp.argmax(logits[0], axis=-1))  # (n, *S)
            to_png(x, os.path.join(out_dir, f"img_{ii}.png"))
            gt = np.asarray(data.test.labels[ii])
            to_png(gt[..., 0], os.path.join(out_dir, f"gt_{ii}.png"))
            for s in range(num_samples):
                to_png(preds[s], os.path.join(out_dir, f"sample_{ii}_{s}.png"))
        log.info("wrote sample PNGs to %s", out_dir)
        return out_dir

    # ------------------------------------------------------------------
    # checkpointing / observability
    # ------------------------------------------------------------------

    def save_model(self, savename: str):
        """Write the full-state checkpoint. Multi-host: the state is fully
        replicated, so process 0 alone writes (the others' copies are
        bit-identical — writing from every process would race on the same
        files)."""
        if not self._is_main:
            return
        save_checkpoint(
            os.path.join(self.log_dir, savename), self._localize_tree(self.state)
        )
        with open(os.path.join(self.log_dir, "best_metrics.json"), "w") as f:
            json.dump({"iteration": self.iteration, **self.best}, f)

    def restore(self, savename: str):
        """Full-state resume: besides the TrainState (params/opt/sched/step/
        rng), reload the best-metric ledger so the first post-resume
        validation can't silently overwrite historical best_* checkpoints,
        and realign self.iteration so train() continues toward
        cfg.iterations instead of restarting from 1."""
        self._restore_state(os.path.join(self.log_dir, savename))
        best_path = os.path.join(self.log_dir, "best_metrics.json")
        if os.path.exists(best_path):
            with open(best_path) as f:
                saved = json.load(f)
            for k in self.best:
                if k in saved:
                    self.best[k] = saved[k]
        self.iteration = int(self.state.step)

    def _log_memory(self):
        """Peak device memory — the paper's headline metric (README.md:4);
        the reference logs torch.cuda.max_memory_allocated each validation
        (train_model.py:145-148)."""
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                log.info(
                    "device peak memory: %.1f MiB",
                    stats["peak_bytes_in_use"] / 2**20,
                )
                return stats["peak_bytes_in_use"]
        except Exception:  # CPU backend has no memory_stats
            pass
        return None
