"""unet_zoo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
uncertainty-aware medical image segmentation.

A from-scratch rebuild of the capability set of gigantenbein/UNet-Zoo
(reference at /root/reference), designed TPU-first:

* pure-functional models (flax.linen) over pytrees, NHWC/NDHWC layouts,
  explicit PRNG threading, bf16-friendly compute;
* fused XLA compute paths and Pallas kernels for the hot ops;
* metrics (GED / variance-NCC / Dice) vectorized on-device instead of
  CPU per-pair loops (reference utils.py:148-247);
* reversible blocks via a custom_vjp O(1)-activation sequence and/or
  jax.checkpoint remat policies (reference torchlayers.py:55-82);
* scaling via jax.sharding Mesh + pjit/shard_map (no reference analog).
"""

__version__ = "0.1.0"

from unet_zoo_tpu import ops, models, metrics, data, parallel, training  # noqa: F401
