"""A/B harness for bs64 UNet train-step optimization candidates.

History: round 4 used this tool to adjudicate four *candidate* patches
against the then-current package (tapT transposed tap matrices, warpHIGH
bf16_3x warp dots, resizeVJP pre-transposed resize backward, poolMM
all-matmul pool). The winning combo LANDED in the package (augment.py
transposed `_tap_weights` + `warp_precision="high"` default,
resize.py `_axis_contraction` custom_vjp, pool.py hybrid custom_vjp with
reduce_window forward after poolMM regressed the fwd-only north-star
10770 -> 9743, BENCH_r04.json / VERDICT r4 Weak #1).

So the variants here are now REVERTS: each one measures what a landed
optimization is still worth against today's base, and `poolMM` is kept as
the documented north-star regressor. A revert that measures FASTER than
base means the landed form stopped earning its keep and should be
re-examined.

Each variant monkeypatches the package op, re-traces a fresh Trainer
step, verifies numerics against the unpatched op on device, and times the
same scan-chain programs bench.py uses — BOTH the bs64 train step and the
fwd-only north-star (mandatory guard, round-4 postmortem: a variant is
landable only if train >= base AND north-star fwd >= 10.5k).
Variants run in SUBPROCESSES (one TPU job at a time; patches can't leak
between jits).

Usage:  python tools/bench_step_variants.py            # all variants
        python tools/bench_step_variants.py --variant tapOrig
"""

from __future__ import annotations

import argparse
import json
import os

# persistent XLA compile cache (remote TPU compiles run 1-17 min; the
# content-addressed cache makes repeat invocations skip them; env form so
# subprocess children inherit it). Same location as bench.py / the CLI —
# /tmp is wiped between driver sessions, which made every variant
# subprocess pay its cold compiles again (round-4 VERDICT #3 failure
# mode).
_CACHE_DIR = os.path.expanduser("~/.cache/unet_zoo_tpu/jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = (
    "base",          # the landed package: transposed taps + bf16_3x warp
                     # + custom_vjp resize bwd + hybrid pool
    "tapOrig",       # revert: (P, n) tap matrices, original subscripts
    "warpHIGHEST",   # revert: warp dots back at HIGHEST (bf16_6x)
    "resizePlain",   # revert: plain einsum resize (XLA automatic transpose)
    "poolRW",        # revert: pure reduce_window pool (automatic transpose bwd)
    "poolMM",        # documented regressor: all-matmul pool fwd+bwd
    "comboOld",      # all reverts together = the round-3 package
)


# ---------------------------------------------------------------------------
# variant patches (each reverts one landed optimization)
# ---------------------------------------------------------------------------


def patch_tapOrig():
    """Revert the transposed tap matrices: build (P, n) one-hot-with-
    fraction taps and contract with the original subscripts. Bit-identical
    math at equal precision — this measures the layout-copy cost the
    transposed form removed (~2.65 ms/step 'data formatting', round 4)."""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.data import augment as A

    def _tap_weights_PN(c, n):
        lo = jnp.floor(c)[:, None]           # (P, 1)
        frac = (c - jnp.floor(c))[:, None]   # (P, 1)
        idx = jnp.arange(n, dtype=c.dtype)[None, :]  # (1, n)
        return jnp.where(idx == lo, 1.0 - frac, 0.0) + jnp.where(
            idx == lo + 1, frac, 0.0
        )

    def _gather_bilinear_mm(img_hwc, coords, precision=jax.lax.Precision.HIGHEST):
        H, W, C = img_hwc.shape
        ph, pw = coords[0].shape
        wy = _tap_weights_PN(coords[0].reshape(-1), H)  # (P, H)
        wx = _tap_weights_PN(coords[1].reshape(-1), W)  # (P, W)
        t = jnp.einsum(
            "ph,hwc->pwc", wy, img_hwc.astype(jnp.float32), precision=precision
        )
        out = jnp.einsum("pwc,pw->pc", t, wx, precision=precision)
        return out.reshape(ph, pw, C)

    A._gather_bilinear_mm = _gather_bilinear_mm


def patch_warpHIGHEST():
    """Revert the bf16_3x warp default: map warp_precision='high' back to
    HIGHEST (bf16_6x — exact f32 reproduction, twice the MXU passes)."""
    import jax

    from unet_zoo_tpu.data import augment as A

    A._WARP_PRECISION = dict(
        A._WARP_PRECISION, high=jax.lax.Precision.HIGHEST
    )


def patch_resizePlain():
    """Revert the resize custom_vjp: plain einsum whose backward is XLA's
    automatic transpose (the form that left an ~0.8 ms/step layout copy)."""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.ops import resize as R

    def _apply_axis_matrix(x, mat, axis):
        m = jnp.asarray(mat, dtype=x.dtype)
        letters = "bdhwc"[: x.ndim]
        out_sub = letters[:axis] + "o" + letters[axis + 1 :]
        return jnp.einsum(
            f"{letters},o{letters[axis]}->{out_sub}", x, m,
            precision=jax.lax.Precision.HIGHEST,
        )

    R._apply_axis_matrix = _apply_axis_matrix


def patch_poolRW():
    """Revert the hybrid pool to pure reduce_window: fwd reduce_window +
    XLA's automatic transpose bwd (a pad+window op — the ~0.86 ms/step
    'output fusion' the matmul bwd removed)."""
    import numpy as np
    import jax.numpy as jnp
    import jax.lax as lax

    from unet_zoo_tpu.ops import pool as P
    import unet_zoo_tpu.ops as OPS

    def avg_pool_ceil(x, window: int = 2, stride: int = 2):
        nds = x.ndim - 2
        wd = (1,) + (window,) * nds + (1,)
        st = (1,) + (stride,) * nds + (1,)
        pads = [(0, 0)]
        inv = np.float32(1.0)
        for axis in range(1, x.ndim - 1):
            counts = P._counts_1d(x.shape[axis], window, stride)
            out_len = counts.shape[0]
            pads.append((0, (out_len - 1) * stride + window - x.shape[axis]))
            sh = [1] * x.ndim
            sh[axis] = out_len
            inv = inv * (1.0 / counts).reshape(sh)
        pads.append((0, 0))
        s = lax.reduce_window(
            x, np.zeros((), x.dtype), lax.add, wd, st, tuple(pads)
        )
        out = s * jnp.asarray(inv, x.dtype)
        from unet_zoo_tpu.parallel.space import constrain

        return constrain(out)

    P.avg_pool_ceil = avg_pool_ceil
    OPS.avg_pool_ceil = avg_pool_ceil


def patch_poolMM():
    """The round-4 all-matmul pool (fwd AND bwd as MXU matmuls): won the
    train step but regressed the fwd-only north-star 10770 -> 9743 img/s
    (fwd MFU 0.384 -> 0.355, BENCH_r04.json) — kept as the documented
    regressor this tool's mandatory fwd guard exists to catch."""
    from unet_zoo_tpu.ops import pool as P
    from unet_zoo_tpu.ops import resize as R
    import unet_zoo_tpu.ops as OPS

    def avg_pool_ceil(x, window: int = 2, stride: int = 2):
        for axis in range(1, x.ndim - 1):
            w = P._pool_matrix(x.shape[axis], window, stride)
            x = R._apply_axis_matrix(x, w, axis)
        from unet_zoo_tpu.parallel.space import constrain

        return constrain(x)

    P.avg_pool_ceil = avg_pool_ceil
    OPS.avg_pool_ceil = avg_pool_ceil


def patch_comboOld():
    """All reverts together = the round-3 package."""
    patch_tapOrig()
    patch_warpHIGHEST()
    patch_resizePlain()
    patch_poolRW()


PATCHES = {
    "base": lambda: None,
    "tapOrig": patch_tapOrig,
    "warpHIGHEST": patch_warpHIGHEST,
    "resizePlain": patch_resizePlain,
    "poolRW": patch_poolRW,
    "poolMM": patch_poolMM,
    "comboOld": patch_comboOld,
}


# ---------------------------------------------------------------------------
# numerics checks (vs the unpatched package op, run on the same backend,
# AFTER the patch has been applied)
# ---------------------------------------------------------------------------


def check_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    out: dict = {}
    if name in ("tapOrig", "warpHIGHEST", "comboOld"):
        from unet_zoo_tpu.data import augment as A

        img = jnp.asarray(rng.standard_normal((128, 128, 3)), jnp.float32)
        ident = A._base_grid((128, 128))
        warp = jnp.asarray(
            ident + rng.uniform(-3, 3, (2, 128, 128)).astype(np.float32)
        )
        # Construction exactness is checked at HIGHEST (where bilinear-as-
        # matmul reproduces f32 bit-exactly); the at-use precision for
        # non-identity warps is allowed ~2^-21 rel err by design and the
        # package selects AROUND the warp for gate-off/flip exactness, so
        # HIGH-precision identity inexactness is expected, not a failure.
        hi = jax.lax.Precision.HIGHEST
        mm = jax.jit(lambda i, c: A._gather_bilinear_mm(i, c, hi))
        got_i = np.asarray(mm(img, ident))
        out["identity_exact_at_highest"] = bool(
            np.array_equal(got_i, np.asarray(img))
        )
        ref_w = np.asarray(jax.jit(A._gather_bilinear)(img, warp))
        got_w = np.asarray(mm(img, warp))
        out["warp_max_abs_err_vs_gather_at_highest"] = float(
            np.max(np.abs(ref_w - got_w))
        )
    if name in ("resizePlain", "comboOld"):
        from unet_zoo_tpu.ops import resize as R

        x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)), jnp.float32)

        def f(x):  # the patched path
            return jnp.sum(R.resize_linear(x, (32, 32), align_corners=False) ** 2)

        def f_ref(x):  # the landed custom_vjp path (unpatched internals)
            y = x
            for axis, out_len in reversed(list(zip((1, 2), (32, 32)))):
                mat = R._linear_matrix(y.shape[axis], out_len, False)
                m = jnp.asarray(mat, dtype=y.dtype)
                mt = jnp.asarray(np.ascontiguousarray(mat.T), dtype=y.dtype)
                y = R._axis_contraction(y.ndim, axis)(y, m, mt)
            return jnp.sum(y**2)

        g = np.asarray(jax.grad(f)(x))
        g_ref = np.asarray(jax.grad(f_ref)(x))
        out["resize_grad_max_abs_err"] = float(np.max(np.abs(g - g_ref)))
    if name in ("poolRW", "poolMM", "comboOld"):
        from unet_zoo_tpu.ops import pool as Pm

        for shape, key in (((4, 15, 15, 8), "pool"), ((2, 9, 9, 9, 4), "pool3d")):
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            ref_pool = Pm._pool_fn(tuple(shape[1:-1]), len(shape), 2, 2)
            a = np.asarray(jax.jit(Pm.avg_pool_ceil)(x))
            b = np.asarray(jax.jit(ref_pool)(x))
            out[f"{key}_max_abs_err"] = float(np.max(np.abs(a - b)))
            ga = np.asarray(
                jax.grad(lambda x: jnp.sum(Pm.avg_pool_ceil(x) ** 2))(x)
            )
            gb = np.asarray(jax.grad(lambda x: jnp.sum(ref_pool(x) ** 2))(x))
            out[f"{key}_grad_max_abs_err"] = float(np.max(np.abs(ga - gb)))
    return out


def run_variant(name: str) -> None:
    PATCHES[name]()
    checks = check_variant(name) if name != "base" else {}
    from bench import measure_train_step, measure_unet_fwd

    ips, mfu = measure_train_step("unet", 64)
    # MANDATORY guard metric (round-4 postmortem: poolMM won the train step
    # but regressed the fwd-only north-star 10770 -> 9743 img/s and rode
    # into the record unchecked, BENCH_r04.json / VERDICT r4 Weak #1). A
    # variant is only landable if BOTH numbers hold: train >= base AND
    # north-star fwd >= 10.5k.
    fwd_ips, fwd_mfu = measure_unet_fwd()
    print(
        json.dumps(
            {
                "variant": name,
                "train_images_per_sec": round(ips, 1),
                "train_mfu": round(mfu, 4) if mfu else None,
                "northstar_fwd_images_per_sec": round(fwd_ips, 1),
                "northstar_fwd_mfu": round(fwd_mfu, 4) if fwd_mfu else None,
                **checks,
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=VARIANTS, default=None)
    args = ap.parse_args()
    if args.variant:
        run_variant(args.variant)
        return
    # one subprocess per variant: serial TPU jobs, no patch leakage
    for name in VARIANTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", name],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else f'{{"variant": "{name}", "error": '
              f'"{(r.stderr.splitlines() or ["?"])[-1][:120]}"}}', flush=True)


if __name__ == "__main__":
    main()
