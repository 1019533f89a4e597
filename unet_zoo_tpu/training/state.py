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


def save_checkpoint(path: str, state: TrainState) -> None:
    """Write the full state under `path` (directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (needed for dtypes/shapes)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(jnp.asarray, restored)


def load_params(path: str, template: TrainState) -> Optional[TrainState]:
    """Weights-only load (the reference 'pretrained_model' path,
    train_model.py:53-67): missing file -> None, caller continues fresh."""
    if not os.path.exists(path):
        return None
    return restore_checkpoint(path, template)
