"""PHiSeg — hierarchical conditional-VAE segmentation (arXiv:1906.04045).

One dimension-generic implementation covering the reference's 2D PHiSeg
(models/phiseg.py:326-537) and 3D PHISeg3D (models/phiseg3D.py:411-611):
feed NHWC for 2D, NDHWC for 3D; ``num_filters`` length sets the number of
resolution levels, ``latent_levels`` the latent hierarchy depth
(the 2D reference hardcodes 5/7, phiseg.py:131-132; the 3D one is generic).

Architecture:
* Posterior/Prior (same net ± mask concat, reference phiseg.py:109-206):
  contracting conv pyramid, then coarse→fine latent path — SampleZ block at
  the coarsest level, and per finer level an up-block consuming the
  *previous level's z* plus the skip feature. During training the prior is
  teacher-forced with posterior z's (phiseg.py:201-202,417-419).
* Likelihood (phiseg.py:224-323): per-level z embedding + ``lvl_diff``
  resolution doublings, a top-down concat-refine path, per-level 1x1 heads
  nearest-upsampled to full resolution; outputs are *residual* logits that
  accumulate coarse→fine.
* Loss = residual multinoulli CE on cumulative logits (phiseg.py:492-513)
  + 4^level-weighted hierarchical KL (phiseg.py:455-479, with the
  sigma1*sigma0 parity quirk of phiseg.py:439 behind ``kl_parity``).

TPU-first: multi-sample inference runs the expensive contracting trunk
ONCE per image and vmaps only the cheap latent path + likelihood decode
over the sample axis (the reference repeats the whole net over a
16-sample batch, train_model.py:177-185).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_zoo_tpu import ops
from unet_zoo_tpu.models.blocks import PhiDownBlock
from unet_zoo_tpu.models.unet import softmax_cross_entropy
from unet_zoo_tpu.models.prob_unet import kl_two_gauss_diag

# reversible_depth per block kind: (down, up, sample_z, lik_embed, lik_postc)
REV_DEPTHS_2D = (3, 2, 3, 2, 2)  # reference torchlayers usage in phiseg.py
REV_DEPTHS_3D = (1, 1, 1, 1, 1)  # reference phiseg3D.py:105,131,167,339,352


class _SampleZ(nn.Module):
    """2 convs + 1x1 mu / 1x1 sigma(Softplus) heads (reference phiseg.py:76-106)."""

    zdim: int = 2
    depth: int = 2
    reversible_mode: str = "plain"
    rev_depth: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, (tuple, list)):
            feats = sum(p.shape[-1] for p in x)
            if self.reversible_mode in ("reversible", "remat"):
                x = jnp.concatenate(x, axis=-1)
        else:
            feats = x.shape[-1]
        if self.reversible_mode == "reversible":
            x = ops.ReversibleSequence(
                feats, depth=self.rev_depth, mode="reversible",
                dtype=self.dtype, name="rev",
            )(x, train=train)
        else:
            x = ops.conv_sequence(
                feats, self.depth, mode=self.reversible_mode,
                dtype=self.dtype, name="convs",
            )(x, train)
        mu = ops.Conv(self.zdim, kernel_size=1, name="mu")(x)
        sigma = jax.nn.softplus(
            ops.Conv(self.zdim, kernel_size=1, name="sigma")(x).astype(jnp.float32)
        )
        return mu.astype(jnp.float32), sigma


class _PhiUpBlock(nn.Module):
    """x2 linear upsample (align_corners=True) + 2 convs + skip concat
    (reference phiseg.py:42-73)."""

    features: int
    reversible_mode: str = "plain"
    rev_depth: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, bridge, train: bool = True):
        # resize to the bridge's exact spatial shape: equals x2 upsampling on
        # power-of-two sizes, and makes odd pyramids (224^2: ...7 -> ceil 4,
        # where the reference's fixed scale_factor=2 asserts out,
        # phiseg.py:66-70) actually work
        x = ops.resize_linear(
            z.astype(bridge.dtype), bridge.shape[1:-1], align_corners=True
        )
        if self.reversible_mode == "reversible":
            x = ops.ReversibleSequence(
                self.features, depth=self.rev_depth, mode="reversible",
                dtype=self.dtype, name="rev",
            )(x, train=train)
        else:
            x = ops.conv_sequence(
                self.features, 2, mode=self.reversible_mode,
                dtype=self.dtype, name="convs",
            )(x, train)
        assert x.shape[1:-1] == bridge.shape[1:-1], (x.shape, bridge.shape)
        # implicit concat (ops.Conv tuple input): consumed by the next
        # SampleZ/ConvSeq without materializing the concatenated tensor
        return (x, bridge)


class _PhiEncoder(nn.Module):
    """Posterior/Prior net (reference phiseg.py:109-206). ``trunk`` and
    ``zpath`` are separate methods so inference can reuse the trunk across
    posterior samples."""

    num_filters: Sequence[int]
    latent_levels: int
    is_posterior: bool
    mask_channels: int = 2  # reference hardcodes one-hot nlabels=2 (phiseg.py:179)
    zdim: int = 2
    reversible_mode: str = "plain"
    rev_depths: Tuple[int, int, int, int, int] = REV_DEPTHS_2D
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        R, L = len(self.num_filters), self.latent_levels
        self.down_blocks = [
            PhiDownBlock(
                f, pool=(i != 0), depth=3,
                reversible_mode=self.reversible_mode, rev_depth=self.rev_depths[0],
                dtype=self.dtype, name=f"down{i}",
            )
            for i, f in enumerate(self.num_filters)
        ]
        self.up_blocks = [
            _PhiUpBlock(
                self.num_filters[0] * 2,
                reversible_mode=self.reversible_mode, rev_depth=self.rev_depths[1],
                dtype=self.dtype, name=f"up{i}",
            )
            for i in range(L - 1)
        ]
        self.samplez_blocks = [
            _SampleZ(
                zdim=self.zdim, depth=2,
                reversible_mode=self.reversible_mode, rev_depth=self.rev_depths[2],
                dtype=self.dtype, name=f"samplez{i}",
            )
            for i in range(L)
        ]

    def trunk(self, x, mask=None, train: bool = True):
        if self.is_posterior:
            assert mask is not None
            if mask.ndim == x.ndim:  # already one-hot (BraTS 3D convention)
                oh = mask.astype(x.dtype)
            else:
                oh = jax.nn.one_hot(mask.astype(jnp.int32), self.mask_channels, dtype=x.dtype)
            x = jnp.concatenate([x, oh - 0.5], axis=-1)
        skips = []
        for i, blk in enumerate(self.down_blocks):
            x = blk(x, train=train)
            if i != len(self.down_blocks) - 1:
                skips.append(x)
        return skips, x

    def zpath(self, skips, bottom, teacher_z=None, train: bool = True):
        """Coarse→fine latent sampling (reference phiseg.py:196-202).

        ``teacher_z``: posterior z list for prior teacher forcing.
        """
        L = self.latent_levels
        z: List[Any] = [None] * L
        mu: List[Any] = [None] * L
        sigma: List[Any] = [None] * L
        pre = bottom
        for i in range(L):  # i=0 → coarsest latent (level L-1)
            if i != 0:
                pre = self.up_blocks[i - 1](z[L - i], skips[-i], train=train)
            lvl = L - 1 - i
            mu[lvl], sigma[lvl] = self.samplez_blocks[i](pre, train=train)
            eps = jax.random.normal(self.make_rng("z"), sigma[lvl].shape)
            z[lvl] = mu[lvl] + sigma[lvl] * eps
            if teacher_z is not None:
                z[lvl] = teacher_z[lvl]
        return z, mu, sigma

    def __call__(self, x, mask=None, teacher_z=None, train: bool = True):
        skips, bottom = self.trunk(x, mask, train=train)
        return self.zpath(skips, bottom, teacher_z, train=train)


class _PhiLikelihood(nn.Module):
    """Decode the latent hierarchy into per-level residual logit maps
    (reference phiseg.py:224-323)."""

    num_classes: int
    num_filters: Sequence[int]
    latent_levels: int
    image_size: Sequence[int]  # spatial dims, e.g. (128, 128) or (128, 128, 128)
    reversible_mode: str = "plain"
    rev_depths: Tuple[int, int, int, int, int] = REV_DEPTHS_2D
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        R, L = len(self.num_filters), self.latent_levels
        lvl_diff = R - L
        embeds, post_ups = [], []
        for j in range(L):  # j-th module handles latent level L-1-j
            feats = self.num_filters[L - 1 - j]
            if self.reversible_mode == "reversible":
                embeds.append(
                    ops.ReversibleSequence(
                        feats, depth=self.rev_depths[3], mode="reversible",
                        dtype=self.dtype, name=f"embed{j}",
                    )
                )
            else:
                embeds.append(
                    ops.conv_sequence(
                        feats, 2, mode=self.reversible_mode,
                        dtype=self.dtype, name=f"embed{j}",
                    )
                )
            # increase_resolution (reference phiseg.py:209-221): lvl_diff
            # upsample+conv(depth=1) stages, always non-reversible — but in
            # the memory-saving modes they run under per-sequence remat:
            # they sit at the largest resolutions, and storing their
            # activations plainly erases part of what the reversible/remat
            # blocks save (param tree is identical either way).
            incres_mode = (
                "remat" if self.reversible_mode in ("remat", "reversible")
                else "plain"
            )
            post_ups.append(
                [
                    ops.conv_sequence(
                        feats, 1, mode=incres_mode, dtype=self.dtype,
                        name=f"incres{j}_{t}",
                    )
                    for t in range(lvl_diff)
                ]
            )
        self.embeds = embeds
        self.post_ups = post_ups

        post_c = []
        for i in range(L - 1):
            feats = self.num_filters[i + lvl_diff]
            if self.reversible_mode == "reversible":
                post_c.append(
                    ops.ReversibleSequence(
                        feats, depth=self.rev_depths[4], mode="reversible",
                        dtype=self.dtype, name=f"postc{i}",
                    )
                )
            else:
                post_c.append(
                    ops.conv_sequence(
                        feats, 2, mode=self.reversible_mode,
                        dtype=self.dtype, name=f"postc{i}",
                    )
                )
        self.post_c_path = post_c

        self.heads = [
            ops.ConvBNAct(
                self.num_classes, kernel_size=1, norm=False, act=None,
                name=f"head{j}",
            )
            for j in range(L)
        ]

    def __call__(self, z_list, train: bool = True):
        L = self.latent_levels
        R = len(self.num_filters)
        lvl_diff = R - L
        # ceil-halving chain of spatial sizes per resolution level — resize
        # targets match the encoder's ceil-mode pooling exactly, so odd
        # pyramids (e.g. 224^2) decode correctly (the reference's fixed
        # scale_factor=2 only works on power-of-two sizes, phiseg.py:209-221)
        chain = [tuple(self.image_size)]
        for _ in range(R - 1):
            chain.append(tuple(-(-s // 2) for s in chain[-1]))

        post_z: List[Any] = [None] * L
        for j in range(L):
            lvl = L - 1 - j
            h = self.embeds[j](z_list[lvl].astype(self.dtype or jnp.float32), train)
            for t, stage in enumerate(self.post_ups[j]):
                h = ops.resize_linear(
                    h, chain[lvl + lvl_diff - 1 - t], align_corners=True
                )
                h = stage(h, train)
            post_z[lvl] = h

        post_c: List[Any] = [None] * L
        post_c[L - 1] = post_z[L - 1]
        for i in range(L - 2, -1, -1):
            ups = ops.resize_linear(
                post_c[i + 1], post_z[i].shape[1:-1], align_corners=True
            )
            if self.reversible_mode in ("reversible", "remat"):
                h = jnp.concatenate([post_z[i], ups], axis=-1)
            else:
                h = (post_z[i], ups)  # tuple = implicit concat (ops.Conv)
            post_c[i] = self.post_c_path[i](h, train)

        s = [None] * L
        spatial = tuple(self.image_size)
        for j in range(L):
            lvl = L - 1 - j
            logits = self.heads[j](post_c[lvl], train=train)
            s[lvl] = ops.upsample_nearest(logits, spatial)
        return s


class PHiSeg(nn.Module):
    num_classes: int
    num_filters: Sequence[int] = (32, 64, 128, 192, 192, 192, 192)
    latent_levels: int = 5
    zdim: int = 2
    image_size: Sequence[int] = (128, 128)  # spatial only
    reversible_mode: str = "plain"
    exponential_weighting: bool = True
    exponential_weight: float = 4.0
    kl_parity: bool = True
    rev_depths: Tuple[int, int, int, int, int] = REV_DEPTHS_2D
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(
            num_filters=tuple(self.num_filters),
            latent_levels=self.latent_levels,
            zdim=self.zdim,
            reversible_mode=self.reversible_mode,
            rev_depths=self.rev_depths,
            dtype=self.dtype,
        )
        self.posterior = _PhiEncoder(is_posterior=True, mask_channels=self.num_classes, **kw)
        self.prior = _PhiEncoder(is_posterior=False, **kw)
        self.likelihood = _PhiLikelihood(
            num_classes=self.num_classes,
            num_filters=tuple(self.num_filters),
            latent_levels=self.latent_levels,
            image_size=tuple(self.image_size),
            reversible_mode=self.reversible_mode,
            rev_depths=self.rev_depths,
            dtype=self.dtype,
        )

    def __call__(self, x, mask=None, train: bool = True) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if mask is not None:
            post_z, post_mu, post_sigma = self.posterior(x, mask, train=train)
            out.update(post_z=post_z, post_mu=post_mu, post_sigma=post_sigma)
        # prior: teacher-forced with posterior z in training (phiseg.py:417-419)
        teacher = out.get("post_z") if (train and mask is not None) else None
        prior_z, prior_mu, prior_sigma = self.prior(x, None, teacher, train=train)
        out.update(prior_z=prior_z, prior_mu=prior_mu, prior_sigma=prior_sigma)
        # training decodes the POSTERIOR z; eval decodes the PRIOR z
        # (reference phiseg.py:414-426)
        decode_z = out["post_z"] if (train and mask is not None) else prior_z
        out["s_list"] = self.likelihood(decode_z, train=train)
        return out

    def sample(self, x, n: int, train: bool = False):
        """n prior samples: trunk once, latent path + decode vmapped.
        Returns accumulated logits (B, n, *spatial, num_classes)."""
        skips, bottom = self.prior.trunk(x, None, train=train)

        def decode_one(mdl, skips, bottom):
            z, _, _ = mdl.prior.zpath(skips, bottom, None, train=train)
            s = mdl.likelihood(z, train=train)
            return mdl.accumulate_output(s)

        vm = nn.vmap(
            decode_one,
            in_axes=(None, None),
            out_axes=0,
            axis_size=n,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"z": True},
        )
        logits = vm(self, skips, bottom)  # (n, B, *S, C)
        return jnp.moveaxis(logits, 0, 1)

    # ------------------------------------------------------------------
    def loss(self, out, mask, params=None):
        kl = self.hierarchical_kl(
            out["post_mu"], out["post_sigma"], out["prior_mu"], out["prior_sigma"]
        )
        recon = self.residual_multinoulli(out["s_list"], mask)
        loss = kl + recon
        return loss, {"loss": loss, "kl": kl, "recon": recon}

    def hierarchical_kl(self, post_mu, post_sigma, prior_mu, prior_sigma):
        """Σ_lvl w_lvl · KL, w = 4^lvl (coarsest largest; phiseg.py:462-463)."""
        L = self.latent_levels
        total = jnp.zeros(())
        for lvl in range(L):
            w = self.exponential_weight ** lvl if self.exponential_weighting else 1.0
            total = total + w * kl_two_gauss_diag(
                post_mu[lvl], post_sigma[lvl], prior_mu[lvl], prior_sigma[lvl],
                parity=self.kl_parity,
            )
        return total

    def residual_multinoulli(self, s_list, mask):
        """CE on cumulative coarse→fine logits, summed over levels
        (reference phiseg.py:492-513)."""
        L = self.latent_levels
        s_acc = s_list[L - 1]
        total = self._multinoulli(s_acc, mask)
        for lvl in range(L - 2, -1, -1):
            s_acc = s_acc + s_list[lvl]
            total = total + self._multinoulli(s_acc, mask)
        return total

    @staticmethod
    def _multinoulli(logits, mask):
        """batch-mean of pixel-summed CE (reference phiseg.py:481-490).
        Accepts integer masks or one-hot (channel-last) masks."""
        if mask.ndim == logits.ndim:  # one-hot target (BraTS)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ce = -jnp.sum(mask.astype(jnp.float32) * logp, axis=-1)
        else:
            ce = softmax_cross_entropy(logits, mask)
        return jnp.mean(jnp.sum(ce.reshape(ce.shape[0], -1), axis=1))

    @staticmethod
    def accumulate_output(s_list, use_softmax: bool = False):
        total = s_list[0]
        for s in s_list[1:]:
            total = total + s
        return jax.nn.softmax(total, axis=-1) if use_softmax else total
