"""Pallas TPU kernel: fused chain of 3x3 'same' convolutions + ReLU.

The U-Net down/up blocks are 3 consecutive conv3x3+ReLU layers
(reference models/unet.py:24-31). Under XLA each conv round-trips its
activations through HBM (at LIDC bench shapes a single 512x128x128x32
bf16 tensor is 0.5 GB); this kernel keeps the whole chain VMEM-resident:

* grid over the batch; each program holds one zero-padded image,
  Pallas double-buffers the HBM->VMEM image loads across programs;
* each conv = im2col patch build (9 shifted slices, VPU copies inside
  VMEM) + ONE MXU matmul with contraction 9*C_in (vs C_in for a naive
  9-tap accumulation — 288 vs 32 for the first U-Net level, which is the
  difference between a busy and a starved MXU);
* patches are built in row chunks so VMEM holds O(chunk) patch data,
  not the full image's;
* bias + ReLU fused into the matmul epilogue, f32 accumulation,
  bf16 storage between stages.

STATUS — experimental, NOT wired into any model path. Measured against
XLA's convs on TPU v5e at the north-star shapes (tools/bench_pallas.py,
bs512 bf16): XLA wins at every shape that compiles (Pallas at 0.59-0.90x
XLA's speed), and the 128x128-spatial shapes fail to compile at all —
the remote-compile service used here returns only an opaque
"tpu_compile_helper exit code 1" (recorded in BENCH_PALLAS.json), with
the underlying compiler diagnostic swallowed by the tunnel. The likely
cause, by the kernel's own buffer arithmetic (not an observed compiler
message): per-program scoped VMEM at 512x128x128 with C=96 — padded
image + double-buffered input + row-chunk patch buffer + per-stage
outputs — totals ~27 MB, over the ~16 MB/core budget. XLA's conv emitter is
already MXU-optimal for these dense NHWC shapes and fuses the
bias+ReLU epilogue on its own, so the fusion this kernel hand-builds
buys nothing. Kept as a correct, tested (tests/test_pallas.py) example
of the im2col-matmul Pallas pattern; no autodiff rules are defined.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-chunk for the im2col patch buffer (bounds VMEM use)
_ROW_CHUNK = 16


def _chain_kernel(x_ref, *refs, num_convs: int, channels: Tuple[int, ...],
                  H: int, W: int):
    """x_ref: (1, H+2N, W+2N, C0) zero-padded input block.
    refs: K_0, b_0, ..., K_{n-1}, b_{n-1}, out_ref, scratch_0, ..., scratch_{n-1}
    where K_j is (9*C_j, C_{j+1}) and scratch_j holds stage-j output
    (with the remaining halo) in bf16.
    """
    n = num_convs
    k_refs = [refs[2 * j] for j in range(n)]
    b_refs = [refs[2 * j + 1] for j in range(n)]
    out_ref = refs[2 * n]
    patch_ref = refs[2 * n + 1]  # (_ROW_CHUNK, W + 2(n-1), 9*Cmax)
    scratch = list(refs[2 * n + 2 :])

    a_ref = None  # current stage input ref; None -> x_ref[0]
    for j in range(n):
        halo = n - j  # input halo of this stage
        R = H + 2 * halo  # input rows
        Wj = W + 2 * halo  # input cols
        Ci = channels[j]
        Co = channels[j + 1]
        kmat = k_refs[j][:]  # (9*Ci, Co)
        bias = b_refs[j][:]  # (1, Co)
        dst = out_ref if j == n - 1 else scratch[j]

        def load(rslice, cslice):
            if a_ref is None:
                return x_ref[0, rslice, cslice, :]
            return a_ref[rslice, cslice, :]

        out_rows = R - 2
        out_cols = Wj - 2
        rc = min(_ROW_CHUNK, out_rows)
        num_chunks = pl.cdiv(out_rows, rc)

        def chunk_body(ci_idx, _):
            # clamped start: the last chunk overlaps its predecessor instead
            # of shrinking — idempotent recompute keeps slice sizes static
            # (a fori_loop bounds the live vector set; a fully unrolled
            # python loop OOM'd VMEM at 128x128).
            r = jnp.minimum(ci_idx * rc, out_rows - rc)
            # im2col into scratch: tap order (dy, dx) row-major. Stores
            # re-align the shifted slices (Mosaic can't lane-concat
            # slices with differing sublane offsets).
            for dy in range(3):
                for dx in range(3):
                    tap = dy * 3 + dx
                    patch_ref[0:rc, 0:out_cols, tap * Ci : (tap + 1) * Ci] = (
                        load(pl.ds(r + dy, rc), pl.ds(dx, out_cols))
                    )
            acc = jax.lax.dot_general(
                patch_ref[0:rc, 0:out_cols, 0 : 9 * Ci].reshape(
                    rc * out_cols, 9 * Ci
                ),
                kmat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = jnp.maximum(acc + bias, 0.0).reshape(rc, out_cols, Co)
            if j == n - 1:
                dst[0, pl.ds(r, rc), :, :] = acc.astype(dst.dtype)
            else:
                dst[pl.ds(r, rc), :, :] = acc.astype(dst.dtype)
            return ()

        jax.lax.fori_loop(0, num_chunks, chunk_body, (), unroll=False)
        if j != n - 1:
            # 'same'-conv semantics: the next stage must see ZEROS outside
            # the true image, not the values the valid conv produced on the
            # halo ring — zero the ring of width h_out.
            h_out = halo - 1
            if h_out > 0:
                zrow = jnp.zeros((h_out, out_cols, Co), dst.dtype)
                dst[0:h_out, :, :] = zrow
                dst[out_rows - h_out : out_rows, :, :] = zrow
                zcol = jnp.zeros((out_rows, h_out, Co), dst.dtype)
                dst[:, 0:h_out, :] = zcol
                dst[:, out_cols - h_out : out_cols, :] = zcol
        a_ref = dst if j != n - 1 else None


@partial(jax.jit, static_argnames=("relu_last",))
def fused_conv_chain(x, kernels: Sequence, biases: Sequence,
                     relu_last: bool = True):
    """x: (B, H, W, C0) — NHWC. kernels[j]: (3, 3, C_j, C_{j+1}).

    Computes relu(conv(...relu(conv(x, k0))...)) with 'same' padding, all
    stages fused in VMEM. Returns (B, H, W, C_n) in x.dtype.

    Note: ReLU is applied after every stage including the last (the
    reference blocks always end in ReLU, models/unet.py:24-31);
    relu_last=False is available for head-less uses.
    """
    assert relu_last, "non-ReLU last stage not implemented"
    n = len(kernels)
    B, H, W, C0 = x.shape
    channels = [C0] + [k.shape[-1] for k in kernels]
    for j, k in enumerate(kernels):
        assert k.shape[:2] == (3, 3) and k.shape[2] == channels[j], (
            j, k.shape, channels)

    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (n, n), (n, n), (0, 0)))
    kmats = [
        k.reshape(9 * k.shape[2], k.shape[3]).astype(dtype) for k in kernels
    ]
    bmats = [jnp.asarray(b, jnp.float32).reshape(1, -1) for b in biases]

    scratch_shapes = [
        pltpu.VMEM(
            (_ROW_CHUNK, W + 2 * (n - 1), 9 * max(channels[:-1])), dtype
        )
    ] + [
        pltpu.VMEM(
            (H + 2 * (n - 1 - j), W + 2 * (n - 1 - j), channels[j + 1]),
            dtype,
        )
        for j in range(n - 1)
    ]

    kernel = partial(
        _chain_kernel, num_convs=n, channels=tuple(channels), H=H, W=W
    )
    in_specs = [
        pl.BlockSpec(
            (1, H + 2 * n, W + 2 * n, C0),
            lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for j in range(n):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # K_j
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # b_j

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, H, W, channels[-1]),
            lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, channels[-1]), dtype),
        scratch_shapes=scratch_shapes,
    )(xp, *[t for pair in zip(kmats, bmats) for t in pair])
    return out
