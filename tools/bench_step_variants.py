"""A/B candidate optimizations for the bs64 UNet train step (VERDICT r4
item: train MFU 18.6% vs fwd 38.4% — attack the backward pass).

Round-3 trace attribution (/tmp/prof_train, parsed by profile_train.py with
tf_op scopes: jvp(...) = fwd, transpose(jvp(...)) = bwd) of the 39 ms bs64
step: aug 7.9 / fwd 8.9 / bwd 17.9 ms. Inside those, the non-conv-ceiling
items this harness targets:

* tap-matrix layout copies, augment.py:182 (~2.65 ms "data formatting" +
  "loop fusion"): the (P, n) tap construction may land in the wrong layout
  for the warp dots -> variant ``tapT`` builds them transposed (n, P).
* warp dots at 20.9 TF/s under HIGHEST precision (6 bf16 passes) ->
  variant ``warpHIGH`` uses 3-pass bf16_3x (~2^-21 relative error; breaks
  the *bit*-exactness of identity warps, reported not asserted here).
* resize backward layout copy, resize.py:76 bwd "data formatting"
  (~0.8 ms) -> variant ``resizeVJP`` supplies a custom_vjp with the
  cotangent einsum contracted against a pre-transposed matrix. (The same
  idea was measured NEUTRAL at PHiSeg bs12 round 3 — this re-measures at
  UNet bs64 per VERDICT #6, where the shapes and neighbors differ.)
* avg-pool backward (~0.86 ms "output fusion", pool.py:50): reduce_window's
  transpose is a pad+window op -> variant ``poolMM`` expresses the
  ceil-mode pool as separable (out,in) matrices on the resize einsum
  machinery, making fwd AND bwd single MXU matmuls.

Each variant monkeypatches the package op, re-traces a fresh Trainer step,
verifies numerics against the baseline op on device, and times the same
scan-chain program bench.py uses. Variants run in SUBPROCESSES (one TPU
job at a time; patches can't leak between jits).

Usage:  python tools/bench_step_variants.py            # all variants
        python tools/bench_step_variants.py --variant tapT
"""

from __future__ import annotations

import argparse
import json
import os
import os

# persistent XLA compile cache (remote TPU compiles run 1-17 min; the
# content-addressed cache makes repeat invocations skip them; env form so
# subprocess children inherit it)
os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = (
    "base", "tapT", "warpHIGH", "resizeVJP", "poolMM",
    # combinations (what would actually land in the package if they win):
    # combo = the three bit-exact patches; comboHIGH adds the 3-pass-bf16
    # warp dots (not bit-exact on non-identity warps, ~2^-21 rel err).
    "combo", "comboHIGH",
)


# ---------------------------------------------------------------------------
# variant patches
# ---------------------------------------------------------------------------


def patch_tapT(precision=None):
    """Build tap-weight matrices transposed — (n, P) instead of (P, n) —
    and contract them with flipped einsum subscripts. Bit-identical math
    (same where/select construction, same HIGHEST-precision dots) unless
    ``precision`` overrides the dot precision."""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.data import augment as A

    prec = precision or jax.lax.Precision.HIGHEST

    def _tap_weights_T(c, n):
        lo = jnp.floor(c)[None, :]           # (1, P)
        frac = (c - jnp.floor(c))[None, :]   # (1, P)
        idx = jnp.arange(n, dtype=c.dtype)[:, None]  # (n, 1)
        return jnp.where(idx == lo, 1.0 - frac, 0.0) + jnp.where(
            idx == lo + 1, frac, 0.0
        )

    def _gather_bilinear_mm(img_hwc, coords):
        H, W, C = img_hwc.shape
        ph, pw = coords[0].shape
        wy = _tap_weights_T(coords[0].reshape(-1), H)  # (H, P)
        wx = _tap_weights_T(coords[1].reshape(-1), W)  # (W, P)
        t = jnp.einsum(
            "hp,hwc->pwc", wy, img_hwc.astype(jnp.float32),
            precision=prec,
        )
        out = jnp.einsum("pwc,wp->pc", t, wx, precision=prec)
        return out.reshape(ph, pw, C)

    A._gather_bilinear_mm = _gather_bilinear_mm


def patch_warpHIGH():
    """Warp dots at Precision.HIGH (bf16_3x: 3 passes instead of 6)."""
    import jax

    from unet_zoo_tpu.data import augment as A

    orig = A._gather_bilinear_mm

    def _gather_bilinear_mm(img_hwc, coords):
        import jax.numpy as jnp

        H, W, C = img_hwc.shape
        ph, pw = coords[0].shape
        wy = A._tap_weights(coords[0].reshape(-1), H)
        wx = A._tap_weights(coords[1].reshape(-1), W)
        t = jnp.einsum(
            "ph,hwc->pwc", wy, img_hwc.astype(jnp.float32),
            precision=jax.lax.Precision.HIGH,
        )
        return jnp.einsum(
            "pwc,pw->pc", t, wx, precision=jax.lax.Precision.HIGH
        ).reshape(ph, pw, C)

    _gather_bilinear_mm._orig = orig
    A._gather_bilinear_mm = _gather_bilinear_mm


def patch_resizeVJP():
    """custom_vjp resize axis-contraction: backward contracts the cotangent
    against a PRE-TRANSPOSED (in, out) matrix instead of XLA's automatic
    transpose of the forward einsum."""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.ops import resize as R

    def _apply_axis_matrix(x, mat, axis):
        m = jnp.asarray(mat, dtype=x.dtype)
        mt = jnp.asarray(mat.T.copy(), dtype=x.dtype)
        letters = "bdhwc"[: x.ndim]
        in_sub = letters
        out_sub = letters[:axis] + "o" + letters[axis + 1 :]

        @jax.custom_vjp
        def apply(x, m, mt):
            return jnp.einsum(
                f"{in_sub},o{letters[axis]}->{out_sub}", x, m,
                precision=jax.lax.Precision.HIGHEST,
            )

        def fwd(x, m, mt):
            return apply(x, m, mt), (m, mt)

        def bwd(res, g):
            m, mt = res
            dx = jnp.einsum(
                f"{out_sub},{letters[axis]}o->{in_sub}", g, mt,
                precision=jax.lax.Precision.HIGHEST,
            )
            return dx, None, None

        apply.defvjp(fwd, bwd)
        return apply(x, m, mt)

    R._apply_axis_matrix = _apply_axis_matrix


def patch_poolMM():
    """Ceil-mode avg pool as separable (out, in) matrices on the einsum
    machinery (fwd and bwd become MXU matmuls instead of reduce_window and
    its pad+window transpose)."""
    import functools

    import numpy as np
    import jax.numpy as jnp

    from unet_zoo_tpu.ops import pool as P
    from unet_zoo_tpu.ops import resize as R

    @functools.lru_cache(maxsize=None)
    def _pool_matrix(in_len: int, window: int, stride: int) -> np.ndarray:
        counts = P._counts_1d(in_len, window, stride)
        out_len = counts.shape[0]
        w = np.zeros((out_len, in_len), np.float32)
        for o in range(out_len):
            start = o * stride
            stop = min(start + window, in_len)
            w[o, start:stop] = 1.0 / counts[o]
        return w

    def avg_pool_ceil(x, window: int = 2, stride: int = 2):
        for axis in range(1, x.ndim - 1):
            w = _pool_matrix(x.shape[axis], window, stride)
            x = R._apply_axis_matrix(x, w, axis)
        from unet_zoo_tpu.parallel.space import constrain

        return constrain(x)

    # models call ops.avg_pool_ceil through the package namespace
    import unet_zoo_tpu.ops as OPS

    P.avg_pool_ceil = avg_pool_ceil
    OPS.avg_pool_ceil = avg_pool_ceil


def patch_combo():
    patch_tapT()
    patch_resizeVJP()
    patch_poolMM()


def patch_comboHIGH():
    import jax

    patch_tapT(precision=jax.lax.Precision.HIGH)
    patch_resizeVJP()
    patch_poolMM()


PATCHES = {
    "base": lambda: None,
    "tapT": patch_tapT,
    "warpHIGH": patch_warpHIGH,
    "resizeVJP": patch_resizeVJP,
    "poolMM": patch_poolMM,
    "combo": patch_combo,
    "comboHIGH": patch_comboHIGH,
}


# ---------------------------------------------------------------------------
# numerics checks (vs the unpatched op, run on the same backend)
# ---------------------------------------------------------------------------


def check_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    out: dict = {}
    if name in ("tapT", "warpHIGH", "combo", "comboHIGH"):
        from unet_zoo_tpu.data import augment as A

        img = jnp.asarray(rng.standard_normal((128, 128, 3)), jnp.float32)
        ident = A._base_grid((128, 128))
        warp = jnp.asarray(
            ident + rng.uniform(-3, 3, (2, 128, 128)).astype(np.float32)
        )
        got_i = np.asarray(jax.jit(A._gather_bilinear_mm)(img, ident))
        out["identity_exact"] = bool(np.array_equal(got_i, np.asarray(img)))
        ref_w = np.asarray(jax.jit(A._gather_bilinear)(img, warp))
        got_w = np.asarray(jax.jit(A._gather_bilinear_mm)(img, warp))
        out["warp_max_abs_err_vs_gather"] = float(np.max(np.abs(ref_w - got_w)))
    if name in ("resizeVJP", "combo", "comboHIGH"):
        from unet_zoo_tpu.ops import resize as R

        x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)), jnp.float32)

        def f(x):
            return jnp.sum(R.resize_linear(x, (32, 32), align_corners=False) ** 2)

        g = np.asarray(jax.grad(f)(x))
        # reference gradient via plain einsum (fresh def, no custom_vjp)
        def apply_plain(x, mat, axis):
            m = jnp.asarray(mat, dtype=x.dtype)
            letters = "bdhwc"[: x.ndim]
            out_sub = letters[:axis] + "o" + letters[axis + 1 :]
            return jnp.einsum(
                f"{letters},o{letters[axis]}->{out_sub}", x, m,
                precision=jax.lax.Precision.HIGHEST,
            )

        def f_ref(x):
            y = x
            for axis, out_len in reversed(list(zip((1, 2), (32, 32)))):
                y = apply_plain(
                    y, R._linear_matrix(y.shape[axis], out_len, False), axis
                )
            return jnp.sum(y**2)

        g_ref = np.asarray(jax.grad(f_ref)(x))
        out["grad_max_abs_err"] = float(np.max(np.abs(g - g_ref)))
    if name in ("poolMM", "combo", "comboHIGH"):
        import jax.lax as lax

        from unet_zoo_tpu.ops import pool as Pm

        x = jnp.asarray(rng.standard_normal((4, 15, 15, 8)), jnp.float32)

        def ref_pool(x):  # the reduce_window original (re-derived inline)
            window, stride = 2, 2
            nds = x.ndim - 2
            wd = (1,) + (window,) * nds + (1,)
            st = (1,) + (stride,) * nds + (1,)
            pads = [(0, 0)]
            counts_per_axis = []
            for axis in range(1, x.ndim - 1):
                counts = Pm._counts_1d(x.shape[axis], window, stride)
                out_len = counts.shape[0]
                pads.append((0, (out_len - 1) * stride + window - x.shape[axis]))
                counts_per_axis.append(counts)
            pads.append((0, 0))
            s = lax.reduce_window(
                x, np.zeros((), x.dtype), lax.add, wd, st, tuple(pads)
            )
            inv = np.float32(1.0)
            for axis, counts in enumerate(counts_per_axis, start=1):
                sh = [1] * x.ndim
                sh[axis] = counts.shape[0]
                inv = inv * (1.0 / counts).reshape(sh)
            return s * jnp.asarray(inv, x.dtype)

        a = np.asarray(jax.jit(Pm.avg_pool_ceil)(x))
        b = np.asarray(jax.jit(ref_pool)(x))
        out["pool_max_abs_err"] = float(np.max(np.abs(a - b)))
        ga = np.asarray(jax.grad(lambda x: jnp.sum(Pm.avg_pool_ceil(x) ** 2))(x))
        gb = np.asarray(jax.grad(lambda x: jnp.sum(ref_pool(x) ** 2))(x))
        out["pool_grad_max_abs_err"] = float(np.max(np.abs(ga - gb)))
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
