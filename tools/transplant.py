"""Full-network init-weight transplant: reference PyTorch -> unet_zoo_tpu.

Used by tools/quality_parity.py --paired: both frameworks start from the
IDENTICAL initialization (the torch net's), consume the identical batch /
annotator sequence (same-seeded data provider on both sides), and are
compared per-pair after training — which removes init variance from the
quality-parity comparison entirely and lets the BASELINE "within 1%" bar
actually be resolved (round-2 VERDICT.md "Next round" #1).

The per-layer conversion helpers live in tests/test_reference_parity.py
(t2j_conv & co. — torch OIHW -> flax HWIO); this module composes them over
whole reference networks:

* ``transplant_phiseg``  — reference models/phiseg.py PHISeg
  (net.posterior / net.prior / net.likelihood, phiseg.py:375-380)
* ``transplant_prob_unet`` — reference models/probabilistic_unet.py
  ProbabilisticUnet (net.unet / net.prior / net.posterior / net.fcomb /
  net.last_conv, probabilistic_unet.py:232-244)

Both return (params, batch_stats) numpy pytrees shaped exactly like our
model.init output (the same key layout the transplant parity tests pin).
BatchNorm running stats are copied as-is (torch init: mean 0 / var 1 —
identical to flax defaults), NOT randomized like the eval-parity tests do.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_reference_parity import (  # noqa: E402
    t2j_conv,
    t2j_conv2d_unit,
    t2j_convseq,
)


def _np_tree(variables):
    import jax

    return (
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {})),
    )


def _units_of(seq_module):
    return [m for m in seq_module if m.__class__.__name__ == "Conv2D"]


def transplant_phiseg(net, variables, latent_levels: int, num_filters):
    """Reference PHISeg instance -> (params, batch_stats) for our PHiSeg.

    Mirrors tests/test_reference_parity.py::phiseg_pair (which is itself
    pinned by posterior/prior/likelihood + full-loss bit-parity tests),
    generalized to any (resolution_levels, latent_levels)."""
    params, stats = _np_tree(variables)
    L = latent_levels
    R = len(num_filters)
    lvl_diff = R - L

    def encoder(rnet, name):
        for i, down in enumerate(rnet.contracting_path):
            for k, u in enumerate(_units_of(down.layers)):
                p, s = t2j_conv2d_unit(u, None)
                params[name][f"down{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"down{i}"]["convs"][f"conv{k}"] = s
        for i in range(L - 1):  # ref's L-th up-block exists but is never called
            for k, u in enumerate(_units_of(rnet.upsampling_path[i].upconv_layer)):
                p, s = t2j_conv2d_unit(u, None)
                params[name][f"up{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"up{i}"]["convs"][f"conv{k}"] = s
        for i, sz in enumerate(rnet.sample_z_path):
            for k, u in enumerate(_units_of(sz.conv)):
                p, s = t2j_conv2d_unit(u, None)
                params[name][f"samplez{i}"]["convs"][f"conv{k}"] = p
                stats[name][f"samplez{i}"]["convs"][f"conv{k}"] = s
            params[name][f"samplez{i}"]["mu"] = t2j_conv(sz.mu_conv[0])
            params[name][f"samplez{i}"]["sigma"] = t2j_conv(sz.sigma_conv[0])

    encoder(net.posterior, "posterior")
    encoder(net.prior, "prior")

    rlik = net.likelihood
    for j in range(L):
        p, s = t2j_convseq(rlik.likelihood_ups_path[j], None)
        params["likelihood"][f"embed{j}"] = p
        stats["likelihood"][f"embed{j}"] = s
        seqs = [
            m
            for m in rlik.likelihood_post_ups_path[j]
            if m.__class__.__name__ == "Conv2DSequence"
        ]
        assert len(seqs) == lvl_diff, (j, len(seqs), lvl_diff)
        for t, seq in enumerate(seqs):
            p, s = t2j_convseq(seq, None)
            params["likelihood"][f"incres{j}_{t}"] = p
            stats["likelihood"][f"incres{j}_{t}"] = s
    for i in range(L - 1):
        p, s = t2j_convseq(rlik.likelihood_post_c_path[i], None)
        params["likelihood"][f"postc{i}"] = p
        stats["likelihood"][f"postc{i}"] = s
    for j in range(L):
        head_conv = rlik.s_layer[j].convolution[0].convolution[0]
        params["likelihood"][f"head{j}"]["conv"] = t2j_conv(head_conv)
    return params, stats


def transplant_prob_unet(net, variables, num_filters):
    """Reference ProbabilisticUnet instance -> (params, batch_stats) for our
    ProbUNet. Mirrors tests/test_reference_parity.py::prob_pair."""
    import torch

    params, stats = _np_tree(variables)
    n = len(num_filters)

    for i in range(n):
        convs = [
            m
            for m in net.unet.contracting_path[i].layers
            if isinstance(m, torch.nn.Conv2d)
        ]
        for k, c in enumerate(convs):
            params["unet"][f"down{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)
    for j, up in enumerate(net.unet.upsampling_path):
        i = n - 2 - j
        convs = [m for m in up.conv_block.layers if isinstance(m, torch.nn.Conv2d)]
        for k, c in enumerate(convs):
            params["unet"][f"up{i}"]["convs"][f"conv{k}"]["conv"] = t2j_conv(c)

    for rnet, ours in ((net.prior, "prior_net"), (net.posterior, "posterior_net")):
        blocks = [
            m for m in rnet.encoder.layers if m.__class__.__name__ == "Conv2DSequence"
        ]
        for i, blk in enumerate(blocks):
            p, s = t2j_convseq(blk, None)
            params[ours]["encoder"][f"block{i}"] = p
            stats[ours]["encoder"][f"block{i}"] = s
        params[ours]["head_kernel"] = (
            rnet.conv_layer.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        params[ours]["head_bias"] = rnet.conv_layer.bias.detach().numpy()

    for i, unit in enumerate(net.fcomb.layers):
        p, s = t2j_conv2d_unit(unit, None)
        params["fcomb"][f"fc{i}"] = p
        stats["fcomb"][f"fc{i}"] = s
    params["fcomb"]["last"] = t2j_conv(net.fcomb.last_layer)
    params["last_conv"]["conv"] = t2j_conv(net.last_conv.convolution[0])
    return params, stats


def install_into_trainer(trainer, params, stats):
    """Replace a Trainer's initial state with transplanted weights; the
    optimizer state is re-created (zero moments) and step/rng preserved."""
    import jax.numpy as jnp

    from unet_zoo_tpu.training.state import TrainState

    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    new = TrainState.create(
        variables, trainer.tx, trainer.cfg.learning_rate, trainer.state.rng
    )
    import jax

    trainer.state = jax.tree_util.tree_map(jnp.asarray, new)
    return trainer
