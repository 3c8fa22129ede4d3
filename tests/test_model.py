"""Model tests: shapes, invariants, loss, and the get_P codec path.

Uses a shrunken config (Cf=16, 2 blocks, K=3) — the architecture is the
same, only widths differ, and the 1-core CPU test box stays fast.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu import blueprint
from l3c_tpu.config import MsConfig, EncConfig, DecConfig, QConfig, ProbConfig
from l3c_tpu.models.network import MultiscaleNetwork
from l3c_tpu.models import layers


def small_cfg(**kw):
    base = dict(
        num_scales=3, Cf=16, kernel_size=3,
        enc=EncConfig(num_blocks=2), dec=DecConfig(num_blocks=2),
        q=QConfig(C=5, L=25), prob=ProbConfig(K=3),
    )
    base.update(kw)
    return MsConfig(**base)


@pytest.fixture(scope="module")
def net_and_params():
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (1, 16, 16, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    return cfg, net, params, x


def test_forward_shapes_and_invariants(net_and_params):
    cfg, net, params, x = net_and_params
    out = jax.jit(lambda p, x: net.apply(p, x, train=False))(params, x)
    # Invariant: len(S) == len(bn) == len(P) + 1 ... here P has one entry
    # per scale and S has the image in front (multiscale_network.py:84).
    assert len(out.S) == cfg.num_scales + 1
    assert len(out.P) == cfg.num_scales
    # spatial halving per scale; channels C=5 at bottlenecks
    assert out.S[0].shape == (1, 16, 16, 3)
    for s in range(1, 4):
        assert out.S[s].shape == (1, 16 >> s, 16 >> s, 5)
        assert out.bn[s].shape == out.S[s].shape
    # P[0] predicts RGB: Kp = 4*3*K; coarser: 3*C*K
    assert out.P[0].shape == (1, 16, 16, 4 * 3 * 3)
    assert out.P[1].shape == (1, 8, 8, 3 * 5 * 3)
    # symbol range
    for s in range(1, 4):
        syms = np.asarray(out.S[s])
        assert syms.min() >= 0 and syms.max() < cfg.q.L


def test_eval_bn_is_quantized_grid(net_and_params):
    cfg, net, params, x = net_and_params
    out = jax.jit(lambda p, x: net.apply(p, x, train=False))(params, x)
    from l3c_tpu.models import grids
    lv = grids.levels(-1.0, 1.0, 25)
    for s in range(1, 4):
        bn = np.asarray(out.bn[s])
        syms = np.asarray(out.S[s])
        np.testing.assert_array_equal(bn, lv[syms])


def test_loss_finite_and_grad(net_and_params):
    cfg, net, params, x = net_and_params

    @jax.jit
    def loss_fn(p):
        out = net.apply(p, x, train=True)
        return blueprint.compute_loss(cfg, out).loss_pc

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # untrained model should cost roughly >= a few bpsp
    assert 1.0 < float(loss) < 100.0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_get_P_matches_full_forward(net_and_params):
    """Decode-side get_P chain must reproduce the forward's P bit-exactly.

    This is the determinism contract the codec relies on: encode computes
    P via the same per-scale applications as decode.
    """
    cfg, net, params, x = net_and_params
    out, enc_outs = jax.jit(
        lambda p, x: net.apply(
            p, x, train=False,
            method=lambda m, x, train: (m(x, train=train),
                                        m.enc_forward(
                                            layers.sub_rgb_mean(x)))),
    )(params, x)

    # reconstruct P coarse->fine through get_P, like Bitcoding.decode
    S = cfg.num_scales
    dec_F_prev = None
    bn_prev = enc_outs[S - 1].bn_q
    for scale in reversed(range(S)):
        l, dec_F_prev = net.apply(params, scale, bn_prev, dec_F_prev,
                                  method=MultiscaleNetwork.get_P)
        np.testing.assert_array_equal(np.asarray(l), np.asarray(out.P[scale]))
        if scale > 0:
            bn_prev = enc_outs[scale - 1].bn_q


def test_uniform_tail_cost():
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x, train=False)
    nats = blueprint.uniform_tail_nats(cfg, out, len(out.S) - 1)
    assert nats == pytest.approx(1 * 2 * 2 * 5 * np.log(25))


def test_rgb_shared_baseline_forward():
    """RGB-Shared: 1 scale, bicubic enc, auto-recursion, C=3 targets."""
    cfg = small_cfg(
        num_scales=1, rgb_bicubic_baseline=True,
        enc=EncConfig(cls="BicubicSubsampling", num_blocks=2, feed_F=False),
        dec=DecConfig(num_blocks=2, skip=False),
        q=QConfig(C=3, L=5),
    )
    net = MultiscaleNetwork(cfg)
    x = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, (1, 32, 32, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    out = jax.jit(
        lambda p, x: net.apply(p, x, train=False, auto_recurse=2))(params, x)
    assert len(out.S) == 4  # image + 3 pyramid levels (1 + 2 recursed)
    for i, sh in enumerate([(1, 32, 32, 3), (1, 16, 16, 3),
                            (1, 8, 8, 3), (1, 4, 4, 3)]):
        assert out.S[i].shape == sh
    assert out.P[0].shape == (1, 32, 32, 4 * 3 * 3)
    loss = blueprint.compute_loss(cfg, out, auto_recursive_from=1)
    assert np.isfinite(float(loss.loss_pc))
    assert loss.recursive_bpsps is not None
    assert len(loss.nonrecursive_bpsps) == 2  # scale 0 + uniform tail
