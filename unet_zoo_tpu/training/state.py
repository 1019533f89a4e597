"""Train state pytree + checkpoint I/O.

The reference checkpoints weights only (`torch.save(state_dict)`,
reference train_model.py:558-563) — no optimizer state, step counter or
RNG, so no true resume. Here the checkpoint is the complete training state
(params + batch_stats + opt state + plateau-scheduler state + step + PRNG
key), written with orbax, making resume exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from unet_zoo_tpu.training.schedule import PlateauState, plateau_init


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    sched: PlateauState
    step: jnp.ndarray  # i32 scalar
    rng: jax.Array  # PRNG key for z-sampling / augmentation

    @classmethod
    def create(cls, variables, tx, lr: float, rng) -> "TrainState":
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            sched=plateau_init(lr),
            step=jnp.asarray(0, jnp.int32),
            rng=rng,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


# ---------------------------------------------------------------------------
# checkpoint I/O (orbax)
# ---------------------------------------------------------------------------


def _checkpointer():
    """Single-process: plain PyTreeCheckpointer. Multi-process: orbax's
    default checkpointer runs sync_global_devices barriers expecting EVERY
    process to call save/restore — but the Trainer deliberately saves from
    process 0 alone (the state is fully replicated; others' copies are
    bit-identical). Scope orbax's coordination to just the calling process
    so the save is genuinely local."""
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        from orbax.checkpoint import options as oopts

        pid = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=oopts.MultiprocessingOptions(
                primary_host=pid,
                active_processes={pid},
                barrier_sync_key_prefix=f"local{pid}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: TrainState) -> None:
    """Write the full state under `path` (directory). Multi-process callers
    must pass an already host-local (localized) state — see
    Trainer._localize_tree."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (needed for dtypes/shapes)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(jnp.asarray, restored)


def load_params(path: str, template: TrainState) -> Optional[TrainState]:
    """Weights-only load (the reference 'pretrained_model' path,
    train_model.py:53-67): missing file -> None, caller continues fresh."""
    if not os.path.exists(path):
        return None
    return restore_checkpoint(path, template)
