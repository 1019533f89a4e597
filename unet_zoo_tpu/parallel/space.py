"""Spatial-sharding activation constraints (the "space" mesh axis).

GSPMD propagates the input's ("data", "space") sharding through convs and
pools, but drops it at the first op it cannot partition spatially — in
this model family the einsum-matrix resizes (ops/resize.py) — and once an
activation is replicated everything downstream stays replicated. Measured
on the virtual 8-device mesh (512² PHiSeg rev, bs12): per-device peak was
IDENTICAL at space=1 and space=2 before these constraints.

The fix is explicit ``with_sharding_constraint`` pins at op boundaries
(conv/pool/resize/reversible outputs). Under a pinned spec, GSPMD keeps
convs halo-exchanged over ICI and implements the resize contraction as
local-partial + reduce-scatter — activations stay sharded end to end.

The context is enabled by the Trainer around its step function when the
mesh has space > 1; every hook is a no-op otherwise, so single-device and
pure-DP paths are untouched. No reference counterpart: the reference is
strictly single-device (train_model.py:47); this is the SURVEY.md §5
"conv-world context parallelism" slot.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_MESH = contextvars.ContextVar("space_sharding_mesh", default=None)


@contextlib.contextmanager
def space_sharding(mesh):
    """Enable spatial activation constraints while tracing under ``mesh``.

    No-op (constraints disabled) when mesh is None or its "space" axis is 1.
    """
    if mesh is None or dict(mesh.shape).get("space", 1) <= 1:
        yield
        return
    token = _MESH.set(mesh)
    try:
        yield
    finally:
        _MESH.reset(token)


def constrain(x):
    """Pin a batch-leading (B, H, ...) activation to ("data", "space", ...).

    INVARIANT: every array routed through conv/pool/resize/reversible under
    an active ``space_sharding`` context must be batch-leading with the
    sharded spatial (height) dim at axis 1 — i.e. NHWC / NDHWC activations,
    rank 4 or 5. Anything else (weight-like arrays, sample stacks with a
    leading sample axis, …) would be pinned to a silently WRONG sharding,
    so non-(4,5)-rank arrays fail loudly here instead. Rank <3 arrays are
    passed through untouched (scalars/vectors carry no layout to pin).

    Skips tensors whose H is smaller than the space axis (deep pyramid
    levels — they stay replicated over "space" by design).
    """
    mesh = _MESH.get()
    if mesh is None:
        return x
    if not hasattr(x, "ndim") or x.ndim < 3:
        return x
    if x.ndim not in (4, 5):
        raise ValueError(
            "space_sharding constrain() expects batch-leading NHWC/NDHWC "
            f"activations (rank 4 or 5); got rank {x.ndim} shape {x.shape}. "
            "Route non-activation arrays around the space_sharding context."
        )
    space = dict(mesh.shape)["space"]
    if x.shape[1] < space:
        return x
    spec = P("data", "space", *(None,) * (x.ndim - 2))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
