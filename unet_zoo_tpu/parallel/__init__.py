"""Parallelism layer: device meshes + sharded training.

New first-class component — the reference is single-device only
(SURVEY.md §2.4). DP over the mesh "data" axis, optional spatial sharding
over "space" (XLA halo exchange for convs).
"""

from unet_zoo_tpu.parallel.mesh import (
    barrier,
    batch_spec,
    host_to_global,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
    shard_label_spec,
)

__all__ = [
    "barrier",
    "host_to_global",
    "init_distributed",
    "make_mesh",
    "batch_spec",
    "shard_batch",
    "replicated",
    "shard_label_spec",
]
