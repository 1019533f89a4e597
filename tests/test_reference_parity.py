"""Weight-transplant parity against the actual reference PyTorch models.

Loads the reference implementation from /root/reference (read-only, with
stubs for its unavailable deps: revtorch/medpy/nibabel), copies its
randomly-initialized weights into our flax models, and compares outputs
element-wise. This is the strongest available evidence that the TPU
models compute the reference's math.

Skipped automatically when the reference tree isn't mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


# ---------------------------------------------------------------------------
# reference import scaffolding
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref():
    import torch
    import torch.nn as tnn

    class _RevBlock(tnn.Module):
        """Functional equivalent of revtorch.ReversibleBlock (forward only)."""

        def __init__(self, f, g):
            super().__init__()
            self.f_func, self.g_func = f, g

        def forward(self, x):
            x1, x2 = torch.chunk(x, 2, dim=1)
            y1 = x1 + self.f_func(x2)
            y2 = x2 + self.g_func(y1)
            return torch.cat([y1, y2], dim=1)

    class _RevSeq(tnn.Module):
        def __init__(self, blocks):
            super().__init__()
            self.reversible_blocks = blocks

        def forward(self, x):
            for b in self.reversible_blocks:
                x = b(x)
            return x

    def stub(name, **attrs):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
        return sys.modules[name]

    rv_attrs = dict(ReversibleBlock=_RevBlock, ReversibleSequence=_RevSeq)
    rv = stub("revtorch", **rv_attrs)
    rv.revtorch = stub("revtorch.revtorch", **rv_attrs)
    medpy = stub("medpy")
    medpy.metric = stub("medpy.metric", jc=lambda *a, **k: 0.0)
    stub("nibabel", load=None, save=None, Nifti1Image=None)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return types.SimpleNamespace(
        unet=importlib.import_module("models.unet"),
        prob_unet=importlib.import_module("models.probabilistic_unet"),
        phiseg=importlib.import_module("models.phiseg"),
        torch=torch,
    )


# ---------------------------------------------------------------------------
# weight transplant helpers (torch OIHW -> flax HWIO)
# ---------------------------------------------------------------------------


def t2j_conv(conv):
    return {
        "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": conv.bias.detach().numpy(),
    }


def randomize_bn_(bn, rng):
    """Give the BN layer nontrivial running stats so eval-mode parity
    actually exercises them."""
    import torch

    bn.running_mean.copy_(torch.tensor(rng.standard_normal(bn.num_features), dtype=torch.float32))
    bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, bn.num_features), dtype=torch.float32))


def t2j_conv2d_unit(unit, rng=None):
    """torchlayers.Conv2D (conv+BN+ReLU) -> (params, batch_stats) for our
    ConvBNAct."""
    import torch.nn as tnn

    conv = unit.convolution[0]
    params = {"conv": t2j_conv(conv)}
    stats = {}
    if len(unit.convolution) > 1 and isinstance(unit.convolution[1], tnn.BatchNorm2d):
        bn = unit.convolution[1]
        if rng is not None:
            randomize_bn_(bn, rng)
        params["bn"] = {
            "scale": bn.weight.detach().numpy(),
            "bias": bn.bias.detach().numpy(),
        }
        stats["bn"] = {
            "mean": bn.running_mean.numpy(),
            "var": bn.running_var.numpy(),
        }
    return params, stats


def t2j_convseq(seq, rng=None):
    """torchlayers.Conv2DSequence -> ConvSeq params/stats (conv{i} children)."""
    params, stats = {}, {}
    for i, unit in enumerate(seq.convolution):
        p, s = t2j_conv2d_unit(unit, rng)
        params[f"conv{i}"] = p
        if s:
            stats[f"conv{i}"] = s
    return params, stats


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


# ---------------------------------------------------------------------------
# U-Net
# ---------------------------------------------------------------------------


def test_unet_forward_parity(ref):
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.models.unet import UNet

    torch = ref.torch
    torch.manual_seed(0)
    filters = [4, 8, 8]
    rmodel = ref.unet.Unet(
        1, 2, filters, initializers=None, apply_last_layer=True, padding=True
    ).eval()

    model = UNet(num_classes=2, num_filters=tuple(filters))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    for i in range(len(filters)):
        convs = [
            m
            for m in rmodel.contracting_path[i].layers
            if isinstance(m, torch.nn.Conv2d)
        ]
        for k, c in enumerate(convs):
            params[f"down{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)
    for j, up in enumerate(rmodel.upsampling_path):
        i = len(filters) - 2 - j
        convs = [
            m for m in up.conv_block.layers if isinstance(m, torch.nn.Conv2d)
        ]
        for k, c in enumerate(convs):
            params[f"up{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)
    params["last"] = t2j_conv(rmodel.last_layer)

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = rmodel(torch.tensor(to_nchw(x))).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), atol=2e-4)


# ---------------------------------------------------------------------------
# Probabilistic U-Net components
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prob_pair(ref):
    """Reference ProbabilisticUnet + our ProbUNet with transplanted weights."""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.models.prob_unet import ProbUNet

    torch = ref.torch
    torch.manual_seed(1)
    # first filter must be 32: the reference's summary head is hardcoded
    # Conv2D(32, num_classes) (reference probabilistic_unet.py:244)
    filters = [32, 8, 8]
    rmodel = ref.prob_unet.ProbabilisticUnet(
        input_channels=1,
        num_classes=2,
        num_filters=filters,
        latent_dim=3,
        no_convs_fcomb=3,
    ).eval()

    model = ProbUNet(
        num_classes=2, num_filters=tuple(filters), latent_dim=3, no_convs_fcomb=3
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, 2, (2, 16, 16)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        jnp.asarray(y),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    # unet trunk (apply_last_layer=False)
    for i in range(len(filters)):
        convs = [
            m
            for m in rmodel.unet.contracting_path[i].layers
            if isinstance(m, torch.nn.Conv2d)
        ]
        for k, c in enumerate(convs):
            params["unet"][f"down{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)
    for j, up in enumerate(rmodel.unet.upsampling_path):
        i = len(filters) - 2 - j
        convs = [
            m for m in up.conv_block.layers if isinstance(m, torch.nn.Conv2d)
        ]
        for k, c in enumerate(convs):
            params["unet"][f"up{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)

    # prior / posterior encoders + 1x1 heads
    for rnet, ours in ((rmodel.prior, "prior_net"), (rmodel.posterior, "posterior_net")):
        blocks = [
            m
            for m in rnet.encoder.layers
            if m.__class__.__name__ == "Conv2DSequence"
        ]
        for i, blk in enumerate(blocks):
            p, s = t2j_convseq(blk, rng)
            params[ours]["encoder"][f"block{i}"] = p
            stats[ours]["encoder"][f"block{i}"] = s
        params[ours]["head_kernel"] = (
            rnet.conv_layer.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        params[ours]["head_bias"] = rnet.conv_layer.bias.detach().numpy()

    # fcomb 1x1 chain + last layer
    for i, unit in enumerate(rmodel.fcomb.layers):
        p, s = t2j_conv2d_unit(unit, rng)
        params["fcomb"][f"fc{i}"] = p
        stats["fcomb"][f"fc{i}"] = s
    params["fcomb"]["last"] = t2j_conv(rmodel.fcomb.last_layer)

    # deterministic summary head
    params["last_conv"]["conv"] = t2j_conv(rmodel.last_conv.convolution[0])

    return types.SimpleNamespace(
        rmodel=rmodel, model=model, params=params, stats=stats, x=x, y=y
    )


def test_prob_unet_latent_parity(prob_pair, ref):
    import jax.numpy as jnp

    torch = ref.torch
    pp = prob_pair
    variables = {"params": pp.params, "batch_stats": pp.stats}
    out = pp.model.apply(
        variables,
        jnp.asarray(pp.x),
        jnp.asarray(pp.y),
        train=False,
        rngs={"z": __import__("jax").random.PRNGKey(0)},
    )
    with torch.no_grad():
        prior = pp.rmodel.prior(torch.tensor(to_nchw(pp.x)))
        post = pp.rmodel.posterior(
            torch.tensor(to_nchw(pp.x)),
            torch.tensor(pp.y[:, None].astype(np.float32)),
        )
    np.testing.assert_allclose(
        np.asarray(out["prior_mu"]), prior.base_dist.loc.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["prior_sigma"]), prior.base_dist.scale.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["post_mu"]), post.base_dist.loc.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["post_sigma"]), post.base_dist.scale.numpy(), atol=1e-4
    )
    # deterministic summary logits
    with torch.no_grad():
        want_logits = pp.rmodel(torch.tensor(to_nchw(pp.x)), None, training=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), to_nhwc(want_logits.numpy()), atol=2e-4
    )


def test_prob_unet_fcomb_parity(prob_pair, ref):
    import jax
    import jax.numpy as jnp

    torch = ref.torch
    pp = prob_pair
    rng = np.random.default_rng(2)
    z = rng.standard_normal((2, 3)).astype(np.float32)

    with torch.no_grad():
        feat = pp.rmodel.unet(torch.tensor(to_nchw(pp.x)), False)
        want = pp.rmodel.fcomb(feat, torch.tensor(z)).numpy()

    variables = {"params": pp.params, "batch_stats": pp.stats}
    feat_ours = pp.model.apply(
        variables,
        jnp.asarray(pp.x),
        train=False,
        rngs={"z": jax.random.PRNGKey(0)},
        method=lambda m, xx, train: m.unet(xx, train=train),
    )
    np.testing.assert_allclose(
        np.asarray(feat_ours), to_nhwc(feat.numpy()), atol=2e-4
    )
    got = pp.model.apply(
        variables,
        jnp.asarray(feat_ours),
        jnp.asarray(z),
        train=False,
        method=lambda m, f, zz, train: m.fcomb(f, zz, train=train),
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=2e-4)


def test_prob_unet_kl_quirk_parity(prob_pair, ref):
    """The reference's hand-rolled KL uses sigma1*sigma0 in place of sigma1^2
    (reference probabilistic_unet.py:292-308). kl_parity=True must reproduce
    its value exactly."""
    import jax.numpy as jnp

    from unet_zoo_tpu.models.prob_unet import kl_two_gauss_diag

    torch = ref.torch
    rng = np.random.default_rng(3)
    mu0, mu1 = rng.standard_normal((2, 5)), rng.standard_normal((2, 5))
    s0, s1 = rng.uniform(0.5, 2, (2, 5)), rng.uniform(0.5, 2, (2, 5))

    want = ref.prob_unet.ProbabilisticUnet.KL_two_gauss_with_diag_cov(
        None,
        torch.tensor(mu0),
        torch.tensor(s0),
        torch.tensor(mu1),
        torch.tensor(s1),
    ).numpy()
    got = kl_two_gauss_diag(
        jnp.asarray(mu0), jnp.asarray(s0), jnp.asarray(mu1), jnp.asarray(s1),
        parity=True,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ---------------------------------------------------------------------------
# PHiSeg (hierarchical CVAE) — the flagship
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def phiseg_pair(ref):
    """Reference Posterior/Prior/Likelihood + our PHiSeg, weights transplanted.

    The reference hardcodes 7 resolution / 5 latent levels
    (reference phiseg.py:131-132) and nlabels=2 one-hot
    (phiseg.py:179 — even for 3-class configs; we parameterize, so the test
    uses 2 classes where both agree).
    """
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.models.phiseg import PHiSeg

    torch = ref.torch
    torch.manual_seed(2)
    filters = [2, 4, 4, 4, 4, 4, 4]
    L, R = 5, 7

    rpost = ref.phiseg.Posterior(1, 2, filters, is_posterior=True).eval()
    rprior = ref.phiseg.Posterior(1, 2, filters, is_posterior=False).eval()
    rlik = ref.phiseg.Likelihood(
        1, 2, filters, latent_levels=L, resolution_levels=R,
        image_size=(1, 64, 64),
    ).eval()

    model = PHiSeg(
        num_classes=2, num_filters=tuple(filters), latent_levels=L,
        image_size=(64, 64),
    )
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    y = rng.integers(0, 2, (1, 64, 64)).astype(np.int32)
    import jax as _jax

    variables = model.init(
        {"params": _jax.random.PRNGKey(0), "z": _jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(y), train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def units_of(seq_module):
        return [m for m in seq_module if m.__class__.__name__ == "Conv2D"]

    def transplant_encoder(rnet, name):
        for i, down in enumerate(rnet.contracting_path):
            units = units_of(down.layers)
            for k, u in enumerate(units):
                p, s = t2j_conv2d_unit(u, rng)
                params[name][f"down{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"down{i}"]["convs"][f"conv{k}"] = s
        for i in range(L - 1):  # 5th ref up-block exists but is never called
            units = units_of(rnet.upsampling_path[i].upconv_layer)
            for k, u in enumerate(units):
                p, s = t2j_conv2d_unit(u, rng)
                params[name][f"up{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"up{i}"]["convs"][f"conv{k}"] = s
        for i, sz in enumerate(rnet.sample_z_path):
            units = units_of(sz.conv)
            for k, u in enumerate(units):
                p, s = t2j_conv2d_unit(u, rng)
                params[name][f"samplez{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"samplez{i}"]["convs"][f"conv{k}"] = s
            params[name][f"samplez{i}"]["mu"] = t2j_conv(sz.mu_conv[0])
            params[name][f"samplez{i}"]["sigma"] = t2j_conv(sz.sigma_conv[0])

    transplant_encoder(rpost, "posterior")
    transplant_encoder(rprior, "prior")

    lvl_diff = R - L
    for j in range(L):
        p, s = t2j_convseq(rlik.likelihood_ups_path[j], rng)
        params["likelihood"][f"embed{j}"] = p
        stats["likelihood"][f"embed{j}"] = s
        seqs = [
            m
            for m in rlik.likelihood_post_ups_path[j]
            if m.__class__.__name__ == "Conv2DSequence"
        ]
        assert len(seqs) == lvl_diff
        for t, seq in enumerate(seqs):
            p, s = t2j_convseq(seq, rng)
            params["likelihood"][f"incres{j}_{t}"] = p
            stats["likelihood"][f"incres{j}_{t}"] = s
    for i in range(L - 1):
        p, s = t2j_convseq(rlik.likelihood_post_c_path[i], rng)
        params["likelihood"][f"postc{i}"] = p
        stats["likelihood"][f"postc{i}"] = s
    for j in range(L):
        head_conv = rlik.s_layer[j].convolution[0].convolution[0]
        params["likelihood"][f"head{j}"]["conv"] = t2j_conv(head_conv)

    return types.SimpleNamespace(
        rpost=rpost, rprior=rprior, rlik=rlik, model=model,
        params=params, stats=stats, x=x, y=y, L=L, lvl_diff=lvl_diff,
    )


def _fixed_z(pp, rng):
    """Teacher-forcing z list: level l has spatial 64 / 2^(lvl_diff + l)."""
    zs = []
    for l in range(pp.L):
        side = 64 // (2 ** (pp.lvl_diff + l))
        zs.append(rng.standard_normal((1, side, side, 2)).astype(np.float32))
    return zs


def test_phiseg_posterior_prior_parity(phiseg_pair, ref):
    import jax
    import jax.numpy as jnp

    torch = ref.torch
    pp = phiseg_pair
    rng = np.random.default_rng(5)
    zs = _fixed_z(pp, rng)
    zs_t = [torch.tensor(to_nchw(z)) for z in zs]
    variables = {"params": pp.params, "batch_stats": pp.stats}

    for rnet, method, with_mask in (
        (pp.rpost, "posterior", True),
        (pp.rprior, "prior", False),
    ):
        with torch.no_grad():
            _, mu_t, sigma_t = rnet(
                torch.tensor(to_nchw(pp.x)),
                torch.tensor(pp.y[:, None].astype(np.float32)) if with_mask else None,
                training_prior=True,
                z_list=zs_t,
            )
        z_j, mu_j, sigma_j = pp.model.apply(
            variables,
            jnp.asarray(pp.x),
            jnp.asarray(pp.y) if with_mask else None,
            [jnp.asarray(z) for z in zs],
            train=False,
            rngs={"z": jax.random.PRNGKey(0)},
            method=lambda m, a, b, c, train: getattr(m, method)(a, b, c, train=train),
        )
        for l in range(pp.L):
            np.testing.assert_allclose(
                np.asarray(mu_j[l]), to_nhwc(mu_t[l].numpy()), atol=5e-4,
                err_msg=f"{method} mu level {l}",
            )
            np.testing.assert_allclose(
                np.asarray(sigma_j[l]), to_nhwc(sigma_t[l].numpy()), atol=5e-4,
                err_msg=f"{method} sigma level {l}",
            )


def test_phiseg_likelihood_parity(phiseg_pair, ref):
    import jax.numpy as jnp

    torch = ref.torch
    pp = phiseg_pair
    rng = np.random.default_rng(6)
    zs = _fixed_z(pp, rng)
    with torch.no_grad():
        s_t = pp.rlik([torch.tensor(to_nchw(z)) for z in zs])
    variables = {"params": pp.params, "batch_stats": pp.stats}
    s_j = pp.model.apply(
        variables,
        [jnp.asarray(z) for z in zs],
        train=False,
        method=lambda m, z, train: m.likelihood(z, train=train),
    )
    for l in range(pp.L):
        np.testing.assert_allclose(
            np.asarray(s_j[l]), to_nhwc(s_t[l].numpy()), atol=5e-4,
            err_msg=f"likelihood level {l}",
        )


# ---------------------------------------------------------------------------
# metric parity: our on-device metrics vs the reference's CPU implementations
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_utils(ref):
    """Reference utils with a REAL jaccard in the medpy stub so its GED
    actually computes (reference utils.py:148-200 calls medpy.metric.jc)."""

    def jc(result, reference_mask):
        result = np.atleast_1d(result.astype(bool))
        reference_mask = np.atleast_1d(reference_mask.astype(bool))
        inter = np.count_nonzero(result & reference_mask)
        union = np.count_nonzero(result | reference_mask)
        return inter / float(union)

    sys.modules["medpy.metric"].jc = jc
    import importlib

    utils = importlib.import_module("utils")
    importlib.reload(utils)  # pick up the working jc
    return utils


def test_ged_parity_vs_reference(ref, ref_utils):
    import jax.numpy as jnp

    from unet_zoo_tpu.metrics import generalised_energy_distance

    torch = ref.torch
    rng = np.random.default_rng(7)
    for trial in range(3):
        samples = rng.integers(0, 2, (6, 12, 12))
        gts = rng.integers(0, 2, (4, 12, 12))
        if trial == 1:
            samples[0] = 0  # include empty masks (the IoU conventions)
            gts[0] = 0
        want = ref_utils.generalised_energy_distance(
            torch.tensor(samples), torch.tensor(gts), nlabels=1,
            label_range=range(1, 2),
        )
        got = float(
            generalised_energy_distance(
                jnp.asarray(samples), jnp.asarray(gts), nlabels=1,
                label_range=range(1, 2),
            )
        )
        assert got == pytest.approx(float(want), abs=1e-5), f"trial {trial}"


def test_ged_parity_multiclass(ref, ref_utils):
    import jax.numpy as jnp

    from unet_zoo_tpu.metrics import generalised_energy_distance

    torch = ref.torch
    rng = np.random.default_rng(8)
    samples = rng.integers(0, 3, (5, 10, 10))
    gts = rng.integers(0, 3, (6, 10, 10))
    want = ref_utils.generalised_energy_distance(
        torch.tensor(samples), torch.tensor(gts), nlabels=2,
        label_range=range(1, 3),
    )
    got = float(
        generalised_energy_distance(
            jnp.asarray(samples), jnp.asarray(gts), nlabels=2,
            label_range=range(1, 3),
        )
    )
    assert got == pytest.approx(float(want), abs=1e-5)


def test_variance_ncc_parity_vs_reference(ref, ref_utils):
    import jax.numpy as jnp

    from unet_zoo_tpu.metrics import variance_ncc_dist

    torch = ref.torch
    rng = np.random.default_rng(9)
    # reference wants CHW: samples (N, C, H, W) softmax; gts (M, C, H, W) one-hot
    probs = rng.dirichlet((1.0, 1.0), size=(5, 12, 12)).astype(np.float32)
    samples_nhwc = probs  # (5, 12, 12, 2)
    gts_lbl = rng.integers(0, 2, (4, 12, 12))
    gts_onehot = np.eye(2, dtype=np.float32)[gts_lbl]  # (4, 12, 12, 2)

    want = ref_utils.variance_ncc_dist(
        torch.tensor(np.moveaxis(samples_nhwc, -1, 1)),
        torch.tensor(np.moveaxis(gts_onehot, -1, 1)),
    )
    got = float(
        variance_ncc_dist(jnp.asarray(samples_nhwc), jnp.asarray(gts_onehot))
    )
    want = float(want[0] if hasattr(want, "__len__") else want)
    assert got == pytest.approx(want, rel=1e-4)


def test_phiseg_loss_parity(phiseg_pair, ref):
    """The training objective itself: reference PHISeg.loss (hierarchical KL
    + residual multinoulli, phiseg.py:455-537) vs ours, same weights, same
    teacher-forced z."""
    import jax
    import jax.numpy as jnp

    torch = ref.torch
    pp = phiseg_pair
    rng = np.random.default_rng(10)
    zs = _fixed_z(pp, rng)
    variables = {"params": pp.params, "batch_stats": pp.stats}

    # ours: posterior + teacher-forced prior + likelihood(posterior z), eval BN
    def fwd(m, x, y, zlist, train):
        post_z, post_mu, post_sigma = m.posterior(x, y, zlist, train=train)
        prior_z, prior_mu, prior_sigma = m.prior(x, None, zlist, train=train)
        s_list = m.likelihood(zlist, train=train)
        out = dict(post_z=post_z, post_mu=post_mu, post_sigma=post_sigma,
                   prior_mu=prior_mu, prior_sigma=prior_sigma, s_list=s_list)
        return m.loss(out, y)

    loss_j, aux = pp.model.apply(
        variables, jnp.asarray(pp.x), jnp.asarray(pp.y),
        [jnp.asarray(z) for z in zs], train=False,
        rngs={"z": jax.random.PRNGKey(0)}, method=fwd,
    )

    # reference: same protocol through the module objects
    zs_t = [torch.tensor(to_nchw(z)) for z in zs]
    with torch.no_grad():
        x_t = torch.tensor(to_nchw(pp.x))
        y_t = torch.tensor(pp.y[:, None].astype(np.float32))
        _, mu_p, sig_p = pp.rpost(x_t, y_t, training_prior=True, z_list=zs_t)
        _, mu_pr, sig_pr = pp.rprior(x_t, None, training_prior=True, z_list=zs_t)
        s_t = pp.rlik(zs_t)

        # hierarchical KL (reference phiseg.py:436-479) with w = 4^level
        kl = 0.0
        for lvl in range(pp.L):
            m0, s0 = mu_p[lvl], sig_p[lvl]
            m1, s1 = mu_pr[lvl], sig_pr[lvl]
            s0f = s0.reshape(s0.shape[0], -1) ** 2
            s1f = (s1 * s0).reshape(s1.shape[0], -1)  # the sigma1*sigma0 quirk
            m0f = m0.reshape(m0.shape[0], -1)
            m1f = m1.reshape(m1.shape[0], -1)
            per = 0.5 * torch.sum(
                (s0f + (m1f - m0f) ** 2) / (s1f + 1e-10)
                + torch.log(s1f + 1e-10) - torch.log(s0f + 1e-10) - 1.0,
                dim=1,
            )
            kl = kl + (4.0 ** lvl) * torch.mean(per)

        # residual multinoulli CE on cumulative logits (phiseg.py:492-513)
        cel = torch.nn.CrossEntropyLoss(reduction="none")
        y_long = torch.tensor(pp.y.astype(np.int64))
        recon = 0.0
        s_acc = s_t[pp.L - 1]
        for lvl in range(pp.L - 1, -1, -1):
            if lvl != pp.L - 1:
                s_acc = s_acc + s_t[lvl]
            ce = cel(s_acc, y_long)
            recon = recon + torch.mean(torch.sum(ce.reshape(ce.shape[0], -1), dim=1))
        want = kl + recon

    assert float(aux["kl"]) == pytest.approx(float(kl), rel=1e-4)
    assert float(aux["recon"]) == pytest.approx(float(recon), rel=1e-4)
    assert float(loss_j) == pytest.approx(float(want), rel=1e-4)


# ---------------------------------------------------------------------------
# PHiSeg3D (volumetric) — transplant parity for the 3D twins
# ---------------------------------------------------------------------------


def t2j_conv3d(conv):
    return {
        "kernel": conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0),
        "bias": conv.bias.detach().numpy(),
    }


def t2j_conv3d_unit(unit, rng=None):
    import torch.nn as tnn

    conv = unit.convolution[0]
    params = {"conv": t2j_conv3d(conv)}
    stats = {}
    if len(unit.convolution) > 1 and isinstance(unit.convolution[1], tnn.BatchNorm3d):
        bn = unit.convolution[1]
        if rng is not None:
            randomize_bn_(bn, rng)
        params["bn"] = {
            "scale": bn.weight.detach().numpy(),
            "bias": bn.bias.detach().numpy(),
        }
        stats["bn"] = {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()}
    return params, stats


def to_ncdhw(x):
    return np.moveaxis(x, -1, 1)


def to_ndhwc(x):
    return np.moveaxis(x, 1, -1)


@pytest.fixture(scope="module")
def ref3d(ref):
    import importlib

    return importlib.import_module("models.phiseg3D")


def test_phiseg3d_posterior_and_likelihood_parity(ref, ref3d):
    """Transplant the reference 3D Posterior/Likelihood weights and compare
    mu/sigma/decodes. (Two reference-3D bugs NOT reproduced: nlabels=2
    hardcoded one-hot, phiseg3D.py:282; the s_layer upsample passes only 2
    sizes to a 5D interpolate, phiseg3D.py:398 — we therefore compare the
    likelihood up to (and excluding) the final nearest upsample.)"""
    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.models.phiseg import PHiSeg, REV_DEPTHS_3D

    torch = ref.torch
    torch.manual_seed(3)
    filters = [2, 4, 4]
    L, R = 2, 3
    size = 16

    rpost = ref3d.Posterior(1, 2, filters, latent_levels=L, is_posterior=True).eval()
    rprior = ref3d.Posterior(1, 2, filters, latent_levels=L, is_posterior=False).eval()
    rlik = ref3d.Likelihood(
        1, 2, filters, latent_levels=L,  # resolution_levels = len(filters)
        image_size=(1, size, size, size),
    ).eval()

    model = PHiSeg(
        num_classes=2, num_filters=tuple(filters), latent_levels=L,
        image_size=(size, size, size), rev_depths=REV_DEPTHS_3D,
    )
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, size, size, size, 1)).astype(np.float32)
    # the 3D reference expects ALREADY one-hot masks (convert_to_onehot_torch
    # passes 4D inputs through, utils.py:296-299); ours accepts the same
    y_lbl = rng.integers(0, 2, (1, size, size, size)).astype(np.int64)
    y = np.eye(2, dtype=np.float32)[y_lbl]  # (1, D, H, W, 2) one-hot NDHWC
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(y), train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def units_of(seq):
        return [m for m in seq if m.__class__.__name__ == "Conv3D"]

    def transplant(rnet, name):
        for i, down in enumerate(rnet.contracting_path):
            for k, u in enumerate(units_of(down.layers)):
                p, s = t2j_conv3d_unit(u, rng)
                params[name][f"down{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"down{i}"]["convs"][f"conv{k}"] = s
        for i in range(L - 1):
            for k, u in enumerate(units_of(rnet.upsampling_path[i].upconv_layer)):
                p, s = t2j_conv3d_unit(u, rng)
                params[name][f"up{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"up{i}"]["convs"][f"conv{k}"] = s
        for i, sz in enumerate(rnet.sample_z_path):
            for k, u in enumerate(units_of(sz.conv)):
                p, s = t2j_conv3d_unit(u, rng)
                params[name][f"samplez{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"samplez{i}"]["convs"][f"conv{k}"] = s
            params[name][f"samplez{i}"]["mu"] = t2j_conv3d(sz.mu_conv[0])
            params[name][f"samplez{i}"]["sigma"] = t2j_conv3d(sz.sigma_conv[0])

    transplant(rpost, "posterior")
    transplant(rprior, "prior")

    lvl_diff = R - L
    for j in range(L):
        pj, sj = {}, {}
        for i, unit in enumerate(rlik.likelihood_ups_path[j].convolution):
            p, s = t2j_conv3d_unit(unit, rng)
            pj[f"conv{i}"] = p
            sj[f"conv{i}"] = s
        params["likelihood"][f"embed{j}"] = pj
        stats["likelihood"][f"embed{j}"] = sj
        seqs = [
            m for m in rlik.likelihood_post_ups_path[j]
            if m.__class__.__name__ == "Conv3DSequence"
        ]
        for t, seq in enumerate(seqs):
            pt, st = {}, {}
            for i, unit in enumerate(seq.convolution):
                p, s = t2j_conv3d_unit(unit, rng)
                pt[f"conv{i}"] = p
                st[f"conv{i}"] = s
            params["likelihood"][f"incres{j}_{t}"] = pt
            stats["likelihood"][f"incres{j}_{t}"] = st
    for i in range(L - 1):
        pi, si = {}, {}
        for k, unit in enumerate(rlik.likelihood_post_c_path[i].convolution):
            p, s = t2j_conv3d_unit(unit, rng)
            pi[f"conv{k}"] = p
            si[f"conv{k}"] = s
        params["likelihood"][f"postc{i}"] = pi
        stats["likelihood"][f"postc{i}"] = si
    for j in range(L):
        head = rlik.s_layer[j].convolution[0].convolution[0]
        params["likelihood"][f"head{j}"]["conv"] = t2j_conv3d(head)

    # fixed teacher-forcing z per level: z_l spatial = size / 2^(lvl_diff+l)
    zs = []
    for l in range(L):
        side = size // (2 ** (lvl_diff + l))
        zs.append(rng.standard_normal((1, side, side, side, 2)).astype(np.float32))
    zs_t = [torch.tensor(to_ncdhw(z)) for z in zs]
    variables = {"params": params, "batch_stats": stats}

    for rnet, method, with_mask in ((rpost, "posterior", True), (rprior, "prior", False)):
        with torch.no_grad():
            _, mu_t, sigma_t = rnet(
                torch.tensor(to_ncdhw(x)),
                torch.tensor(to_ncdhw(y)) if with_mask else None,
                training_prior=True, z_list=zs_t,
            )
        _, mu_j, sigma_j = model.apply(
            variables, jnp.asarray(x), jnp.asarray(y) if with_mask else None,
            [jnp.asarray(z) for z in zs], train=False,
            rngs={"z": jax.random.PRNGKey(0)},
            method=lambda m, a, b, c, train: getattr(m, method)(a, b, c, train=train),
        )
        for l in range(L):
            np.testing.assert_allclose(
                np.asarray(mu_j[l]), to_ndhwc(mu_t[l].numpy()), atol=5e-4,
                err_msg=f"3D {method} mu level {l}",
            )
            np.testing.assert_allclose(
                np.asarray(sigma_j[l]), to_ndhwc(sigma_t[l].numpy()), atol=5e-4,
                err_msg=f"3D {method} sigma level {l}",
            )
