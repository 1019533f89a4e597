"""Probabilistic U-Net (reference models/probabilistic_unet.py:202-370).

Structure: a U-Net trunk without output head + prior/posterior
``AxisAlignedConvGaussian`` encoders (conv pyramid → global spatial mean →
1x1 conv → mu, log_sigma) + ``Fcomb`` (latent broadcast over H×W, concat to
trunk features, chain of 1x1 convs).

TPU-first notes:
* the latent "tile" (reference :172-199) is a broadcast, never materialized
  until the concat feeding the first 1x1 conv — XLA fuses it;
* multi-sample inference folds the sample axis into the batch for the
  Fcomb 1x1-conv chain (eval-mode BN is sample-independent), so N samples
  ride one MXU-batched matmul instead of N kernel launches;
* the reference's asymmetric KL quirk (sigma1*sigma0 in place of sigma1²,
  reference :294) is reproduced behind ``kl_parity=True`` with the
  corrected form available.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu import ops
from unet_zoo_tpu.models.unet import UNet, softmax_cross_entropy


class _Encoder(nn.Module):
    """Conv pyramid: per level (pool if not first) + ConvSeq(depth, BN+ReLU)
    (reference models/probabilistic_unet.py:20-70)."""

    num_filters: Sequence[int]
    depth_per_block: int = 3
    reversible_mode: str = "plain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, f in enumerate(self.num_filters):
            if i != 0:
                x = ops.avg_pool_ceil(x)
            if self.reversible_mode == "reversible":
                # reference uses reversible_depth = no_convs_per_block - 1 (:60)
                x = ops.ReversibleSequence(
                    f,
                    depth=self.depth_per_block - 1,
                    mode="reversible",
                    init_scheme="he_normal",
                    dtype=self.dtype,
                    name=f"rev{i}",
                )(x, train=train)
            else:
                x = ops.conv_sequence(
                    f,
                    self.depth_per_block,
                    mode=self.reversible_mode,
                    init_scheme="he_normal",
                    dtype=self.dtype,
                    name=f"block{i}",
                )(x, train)
        return x


class _LatentGaussian(nn.Module):
    """AxisAlignedConvGaussian head (reference :73-130): encoder → spatial
    mean → 1x1 conv → (mu, log_sigma)."""

    num_filters: Sequence[int]
    latent_dim: int
    num_classes: int = 2
    posterior: bool = False
    reversible_mode: str = "plain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        if self.posterior:
            assert mask is not None
            onehot = jax.nn.one_hot(mask.astype(jnp.int32), self.num_classes, dtype=x.dtype)
            x = jnp.concatenate([x, onehot - 0.5], axis=-1)
        enc = _Encoder(
            self.num_filters,
            reversible_mode=self.reversible_mode,
            dtype=self.dtype,
            name="encoder",
        )(x, train=train)
        pooled = jnp.mean(enc, axis=tuple(range(1, enc.ndim - 1)), keepdims=True)
        # 1x1 head: kaiming-normal kernel + N(0,1) bias (reference :99-100)
        kernel = self.param(
            "head_kernel",
            ops.kaiming_normal_fan_in,
            (1,) * (x.ndim - 2) + (self.num_filters[-1], 2 * self.latent_dim),
            jnp.float32,
        )
        bias = self.param(
            "head_bias", jax.nn.initializers.normal(1.0), (2 * self.latent_dim,), jnp.float32
        )
        out = jnp.einsum(
            "...i,io->...o",
            pooled.reshape(pooled.shape[0], -1),
            kernel.reshape(self.num_filters[-1], -1),
        ) + bias
        mu, log_sigma = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return mu, jnp.exp(log_sigma)  # (B, latent_dim) each


class _Fcomb(nn.Module):
    """Latent-conditioned decoder head (reference :133-199): broadcast z over
    space, concat with features, (no_convs_fcomb-1) 1x1 ConvBNReLU + 1x1 out."""

    num_classes: int
    features0: int
    no_convs_fcomb: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feat, z, train: bool = True):
        # feat: (B, *S, F); z: (B, latent_dim) → broadcast over spatial dims
        spatial = feat.shape[1:-1]
        zb = z.astype(feat.dtype).reshape(z.shape[0], *(1,) * len(spatial), z.shape[-1])
        zb = jnp.broadcast_to(zb, feat.shape[:-1] + (z.shape[-1],))
        x = jnp.concatenate([feat, zb], axis=-1)
        for i in range(self.no_convs_fcomb - 1):
            x = ops.ConvBNAct(
                self.features0,
                kernel_size=1,
                init_scheme="orthogonal",
                dtype=self.dtype,
                name=f"fc{i}",
            )(x, train=train)
        return ops.Conv(
            self.num_classes, kernel_size=1, init_scheme="orthogonal", name="last"
        )(x)


class ProbUNet(nn.Module):
    num_classes: int
    num_filters: Sequence[int] = (32, 64, 128, 192)
    latent_dim: int = 6
    no_convs_fcomb: int = 4
    reversible_mode: str = "plain"
    kl_parity: bool = True  # reproduce reference sigma1*sigma0 KL (:294)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.unet = UNet(
            num_classes=self.num_classes,
            num_filters=tuple(self.num_filters),
            apply_last_layer=False,
            reversible_mode=self.reversible_mode,
            dtype=self.dtype,
        )
        self.prior_net = _LatentGaussian(
            tuple(self.num_filters), self.latent_dim,
            num_classes=self.num_classes, posterior=False,
            reversible_mode=self.reversible_mode, dtype=self.dtype,
        )
        self.posterior_net = _LatentGaussian(
            tuple(self.num_filters), self.latent_dim,
            num_classes=self.num_classes, posterior=True,
            reversible_mode=self.reversible_mode, dtype=self.dtype,
        )
        self.fcomb = _Fcomb(
            self.num_classes, self.num_filters[0],
            no_convs_fcomb=self.no_convs_fcomb, dtype=self.dtype,
        )
        # deterministic summary head (reference last_conv, :244,255)
        self.last_conv = ops.ConvBNAct(
            self.num_classes, kernel_size=1, norm=False, act=None,
            init_scheme="torch_default",
        )

    def __call__(self, x, mask=None, train: bool = True) -> Dict[str, Any]:
        """Forward pass: prior + (if mask) posterior + trunk + (if train) one
        posterior-sample reconstruction for the ELBO."""
        out: Dict[str, Any] = {}
        out["prior_mu"], out["prior_sigma"] = self.prior_net(x, train=train)
        if mask is not None:
            out["post_mu"], out["post_sigma"] = self.posterior_net(x, mask, train=train)
        feat = self.unet(x, train=train)
        out["features"] = feat
        out["logits"] = self.last_conv(feat, train=train)
        if mask is not None:
            # ELBO reconstruction from a posterior rsample (reference :350,356)
            eps = jax.random.normal(self.make_rng("z"), out["post_mu"].shape)
            z_post = out["post_mu"] + out["post_sigma"] * eps
            out["recon"] = self.fcomb(feat, z_post, train=train)
        return out

    def sample(self, x, n: int, train: bool = False):
        """n prior-sample segmentations: trunk+prior once, Fcomb over a folded
        (B*n) batch. Returns (B, n, *spatial, num_classes) logits."""
        mu, sigma = self.prior_net(x, train=train)
        feat = self.unet(x, train=train)
        B = x.shape[0]
        eps = jax.random.normal(self.make_rng("z"), (B, n, mu.shape[-1]))
        z = mu[:, None] + sigma[:, None] * eps  # (B, n, d)
        featr = jnp.repeat(feat, n, axis=0)  # (B*n, *S, F)
        logits = self.fcomb(featr, z.reshape(B * n, -1), train=train)
        return logits.reshape(B, n, *logits.shape[1:])

    # ------------------------------------------------------------------
    def loss(self, out, mask, params=None):
        """loss = Σ_pixels CE (batch-mean) + KL + 1e-5·Σ‖W‖₂ (reference :343-370)."""
        ce = softmax_cross_entropy(out["recon"], mask)
        recon = jnp.mean(jnp.sum(ce.reshape(ce.shape[0], -1), axis=1))
        kl = kl_two_gauss_diag(
            out["post_mu"], out["post_sigma"], out["prior_mu"], out["prior_sigma"],
            parity=self.kl_parity,
        )
        loss = recon + kl
        if params is not None:
            # safe 2-norm: grad of ||w|| at w=0 is NaN; epsilon keeps it 0
            def _norm(w):
                return jnp.sqrt(jnp.sum(jnp.square(w.astype(jnp.float32))) + 1e-12)

            reg = sum(
                _norm(w)
                for sub in ("prior_net", "posterior_net")
                for w in jax.tree_util.tree_leaves(params[sub])
            )
            # fcomb: reference regularizes fcomb.layers but NOT last_layer (:368)
            reg = reg + sum(
                _norm(w)
                for k, v in params["fcomb"].items()
                if k != "last"
                for w in jax.tree_util.tree_leaves(v)
            )
            loss = loss + 1e-5 * reg
        return loss, {"loss": loss, "kl": kl, "recon": recon}

    @staticmethod
    def accumulate_output(logits, use_softmax: bool = False):
        return jax.nn.softmax(logits, axis=-1) if use_softmax else logits


def kl_two_gauss_diag(mu0, sigma0, mu1, sigma1, parity: bool = True, eps: float = 1e-10):
    """KL(N(mu0,sigma0²) ‖ N(mu1,sigma1²)), batch-mean of per-sample sums.

    parity=True reproduces the reference's sigma1_fs = sigma1*sigma0
    (reference models/probabilistic_unet.py:294, models/phiseg.py:439).
    """
    mu0 = mu0.reshape(mu0.shape[0], -1).astype(jnp.float32)
    mu1 = mu1.reshape(mu1.shape[0], -1).astype(jnp.float32)
    sigma0 = sigma0.reshape(sigma0.shape[0], -1).astype(jnp.float32)
    sigma1 = sigma1.reshape(sigma1.shape[0], -1).astype(jnp.float32)
    s0sq = sigma0 * sigma0
    s1sq = sigma1 * sigma0 if parity else sigma1 * sigma1
    term = (s0sq + (mu1 - mu0) ** 2) / (s1sq + eps)
    return jnp.mean(
        0.5 * jnp.sum(term + jnp.log(s1sq + eps) - jnp.log(s0sq + eps) - 1.0, axis=1)
    )
