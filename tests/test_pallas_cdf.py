"""Pallas CDF kernel vs the pure-XLA table builder (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.ops import pallas_cdf, tpu_coder as tc


@pytest.mark.parametrize("P,K,L", [(300, 10, 256), (64, 3, 25), (1, 1, 25)])
def test_kernel_matches_xla_path(P, K, L):
    rng = np.random.RandomState(0)
    pi = jnp.asarray(rng.dirichlet(np.ones(K), size=P).astype(np.float32))
    mu = jnp.asarray(rng.uniform(-1, 1, (P, K)).astype(np.float32))
    inv_s = jnp.asarray(np.exp(-rng.uniform(-5, 1, (P, K)))
                        .astype(np.float32))
    bw = 2.0 / (L - 1)
    a = np.asarray(tc.build_cdf_table(pi, mu, inv_s, -1.0, bw, L),
                   np.int64)
    b = np.asarray(pallas_cdf.build_cdf_table_pallas(pi, mu, inv_s, -1.0,
                                                     bw, L), np.int64)
    # identical math modulo float association; tables may differ by <=1
    # quantization step. Monotonicity must hold for both.
    assert np.abs(a - b).max() <= 1
    for t in (a, b):
        d = np.diff(np.concatenate([t, np.full((P, 1), 65536)], 1), axis=1)
        assert (d >= 1).all()


def test_roundtrip_through_pallas_tables():
    """The codec round-trips when BOTH sides use the kernel's tables."""
    rng = np.random.RandomState(1)
    P, K, L = 1000, 4, 25
    pi = jnp.asarray(rng.dirichlet(np.ones(K), size=P).astype(np.float32))
    mu = jnp.asarray(rng.uniform(-1, 1, (P, K)).astype(np.float32))
    inv_s = jnp.asarray(np.exp(-rng.uniform(-3, 1, (P, K)))
                        .astype(np.float32))
    table = pallas_cdf.build_cdf_table_pallas(pi, mu, inv_s, -1.0,
                                              2.0 / 24, L)
    lay = tc.layout_for(P, 1)
    syms = jnp.asarray(rng.randint(0, L, P).astype(np.int32))
    words, _ = tc.encode_channels(table, syms, L, lay)
    out = tc.decode_channels(table, words, L, lay)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(syms))


def test_fine_kernel_matches_xla_path():
    """Pallas conditional fine-table kernel vs tpu_coder.rgb_fine_tables
    XLA path: same spec, <=1 quantization-step difference, monotone."""
    from l3c_tpu.models import dmll as dmll_mod
    rng = np.random.RandomState(2)
    n, K = 500, 4
    spec = dmll_mod.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0,
                             L=256)
    # raw network output l for one RGB scale: (1, h, w, Kp)
    h = w = 25   # h*w >= n not required; use n = h*w
    n = h * w
    Kp = dmll_mod.non_shared_get_Kp(K, 3)
    l = jnp.asarray(rng.randn(1, h, w, Kp).astype(np.float32))
    dec = jnp.asarray(rng.randint(0, 256, (1, h, w, 3))
                      .astype(np.float32))
    # realistic coarse symbols: the bin holding mixture component 0's
    # mean (data-drawn symbols live where the model puts mass)
    pi0, mu0, inv0 = tc._channel_params(spec, l, 2, 3, dec)
    a = jnp.clip((np.asarray(mu0)[:, 0] - spec.x_min)
                 / spec.bin_width / 16.0, 0, 15).astype(jnp.int32)
    xla = np.asarray(tc.rgb_fine_tables(spec, l, 2, 3, dec, a,
                                        use_pallas=False), np.int64)
    pls = np.asarray(tc.rgb_fine_tables(spec, l, 2, 3, dec, a,
                                        use_pallas=True), np.int64)
    # Implementations must agree wherever the coarse bin carries real
    # mass; near-zero-mass bins divide ~0/~0 and may differ freely (the
    # codec never mixes them: it is XLA-only since v7, Pallas is a
    # bench A/B path). Identify well-conditioned rows via the floats.
    pi_, mu_, inv_ = pi0, mu0, inv0
    k = jnp.arange(17, dtype=jnp.float32)
    t = (a.reshape(-1, 1).astype(jnp.float32) * 16.0 + k)         * np.float32(spec.bin_width)         + np.float32(spec.x_min - spec.bin_width / 2)
    cv = np.asarray(tc.edge_cdf(pi_, mu_, inv_, t))
    good = (cv[:, -1] - cv[:, 0]) > 1e-2
    assert good.sum() > n // 3   # the test must actually cover rows
    assert np.abs(xla[good] - pls[good]).max() <= 2
    for t_ in (xla, pls):
        d = np.diff(np.concatenate([t_, np.full((n, 1), 65536)], 1),
                    axis=1)
        assert (d >= 1).all()


def test_codec_ignores_pallas_env(tmp_path, monkeypatch):
    """Since v7 the codec is XLA-only: L3C_PALLAS_CDF must not change
    the bitstream or break the round-trip (it only steers bench A/Bs)."""
    from l3c_tpu.codec.bitcoding2 import TpuBitcoding
    from l3c_tpu.config import (MsConfig, EncConfig, DecConfig, QConfig,
                                ProbConfig)
    from l3c_tpu.models.network import MultiscaleNetwork
    cfg = MsConfig(num_scales=2, Cf=8,
                   enc=EncConfig(num_blocks=1), dec=DecConfig(num_blocks=1),
                   q=QConfig(C=2, L=25), prob=ProbConfig(K=2))
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)))
    img = np.random.RandomState(5).randint(
        0, 256, (1, 24, 16, 3)).astype(np.uint8)
    monkeypatch.setenv("L3C_PALLAS_CDF", "1")
    bc = TpuBitcoding(cfg, net, params)
    p = str(tmp_path / "pl.l3c")
    bc.encode(img, p)
    monkeypatch.setenv("L3C_PALLAS_CDF", "0")
    bc2 = TpuBitcoding(cfg, net, params)
    p2 = str(tmp_path / "xla.l3c")
    bc2.encode(img, p2)
    with open(p, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    out = bc2.decode(p)
    np.testing.assert_array_equal(out, img)
