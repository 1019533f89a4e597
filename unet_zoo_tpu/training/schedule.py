"""Functional ReduceLROnPlateau.

The reference steps torch's ReduceLROnPlateau(min_lr=1e-4, patience=50000)
*every iteration on the train loss* (reference train_model.py:49-51,134 —
an acknowledged quirk: plateau detection on a noisy per-batch loss). The
TPU twin is a pure pytree state update that lives INSIDE the jitted train
step — no host round-trip per iteration.

Semantics follow torch defaults (mode='min', threshold=1e-4 relative,
cooldown=0): loss improves if loss < best * (1 - threshold); after
`patience` consecutive non-improvements, lr <- max(lr * factor, min_lr).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PlateauState(NamedTuple):
    lr: jnp.ndarray  # current learning rate (f32 scalar)
    best: jnp.ndarray  # best loss seen
    num_bad: jnp.ndarray  # consecutive non-improving steps


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
    )


def plateau_update(
    state: PlateauState,
    loss,
    factor: float = 0.1,
    patience: int = 50_000,
    min_lr: float = 1e-4,
    threshold: float = 1e-4,
) -> PlateauState:
    loss = jnp.asarray(loss, jnp.float32)
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)
