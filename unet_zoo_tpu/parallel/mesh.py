"""Device mesh + sharding helpers.

The reference is strictly single-device (one `torch.device`, reference
train_model.py:47; no torch.distributed anywhere — SURVEY.md §2.4). The TPU
framework scales through a `jax.sharding.Mesh` instead:

* axis "data"  — batch (data parallelism). Gradients all-reduce over ICI;
  XLA inserts the psum from the sharding annotations (GSPMD), no explicit
  collectives in model code.
* axis "space" — optional spatial sharding of the image height dim, the
  conv-world analog of sequence/context parallelism: XLA partitions convs
  with automatic halo exchange, which is what makes 512² UZH and 128³ BraTS
  configs fit and scale (SURVEY.md §5 "long-context" slot).

Multi-host: call jax.distributed.initialize() before make_mesh; the mesh
spans all global devices and DP rides DCN across hosts, space/ICI within.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: call once per host BEFORE make_mesh; after it,
    jax.devices() spans all hosts, DP rides DCN between hosts and ICI
    within (SURVEY.md §5 distributed slot).

    Returns True if distributed init succeeded (or was already done).
    Tolerates only the benign single-process/no-config case; an EXPLICITLY
    requested multi-process launch that fails raises, so a misconfigured
    cluster can't silently degrade to single-host training."""
    import logging

    log = logging.getLogger(__name__)
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        if explicit:
            raise
        log.warning("jax.distributed.initialize failed (%s); single-process", e)
        return False
    except ValueError as e:
        if explicit:
            raise
        log.warning("jax.distributed.initialize failed (%s); single-process", e)
        return False


def make_mesh(
    n_devices: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ("data", "space") mesh over the first `n_devices` devices.

    space=1 gives pure DP; space=k shards the image height k-ways.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    assert n_devices % space == 0, (n_devices, space)
    arr = np.asarray(devices[:n_devices]).reshape(n_devices // space, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_spec(mesh: Mesh, spatial_rank: int = 2) -> P:
    """PartitionSpec for an (B, H, W[, D], C) batch on this mesh: batch over
    "data", height over "space" (if used), rest replicated."""
    if mesh.shape["space"] > 1:
        return P("data", "space", *(None,) * spatial_rank)
    return P("data", *(None,) * (spatial_rank + 1))


def shard_batch(mesh: Mesh, x, spatial_rank: Optional[int] = None):
    """Place a host batch onto the mesh with the batch/space sharding."""
    if spatial_rank is None:
        spatial_rank = x.ndim - 2
    return jax.device_put(x, NamedSharding(mesh, batch_spec(mesh, spatial_rank)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_label_spec(mesh: Mesh, label_rank: int) -> P:
    """Labels: (B, *spatial) int or (B, *spatial, C) one-hot."""
    if mesh.shape["space"] > 1:
        return P("data", "space", *(None,) * max(0, label_rank - 2))
    return P("data", *(None,) * max(0, label_rank - 1))


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this barrier (no-op
    single-process). Rides the jax.distributed COORDINATION service (gRPC
    key-value store), not the device collective fabric — so it is safe to
    call before any collective has established its context, and its timeout
    is independent of the collective backend's (Gloo's context bring-up
    allows only ~30 s between the first and last participant; aligning
    processes here first keeps heavily-skewed hosts — slow imports, cold
    caches — from blowing that window). Also the right fence around
    process-0-only filesystem work (checkpoint write, then barrier, then
    everyone reads)."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def host_to_global(mesh: Mesh, spec: P, x) -> jax.Array:
    """Build a global jax.Array on a (possibly multi-process) mesh from a
    host ndarray that every process holds in full: each process fills only
    its ADDRESSABLE shards (make_array_from_callback slices per device), so
    no process touches devices it doesn't own — the multi-host twin of
    device_put. With a replicated spec this is how the (identically
    seeded) train state becomes a global replicated array; with
    batch_spec/shard_label_spec it is the per-step batch feed
    (SURVEY.md §5 "host-local sharded data loading feeding per-shard
    device_put").

    Every process must pass the same global value (the Trainer guarantees
    this by seeding each process's provider identically)."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
