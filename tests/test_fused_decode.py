"""Fused-scan RGB decode (ops/fused_decode.py): bit-exact vs the
channel-sequential default.

The fused path advances all 6 RGB streams (coarse+fine x 3 channels)
in ONE lax.scan, building every CDF row in-body from the same
int_coder expressions the per-channel programs use — so on identical
v8 files both decoders must produce identical pixels."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.codec.bitcoding2 import TpuBitcoding
from l3c_tpu.config import MsConfig, EncConfig, DecConfig, QConfig, ProbConfig
from l3c_tpu.models.network import MultiscaleNetwork


def small_cfg(**kw):
    q = kw.pop("q", QConfig(C=5, L=25))
    return MsConfig(num_scales=2, Cf=8,
                    enc=EncConfig(num_blocks=1), dec=DecConfig(num_blocks=1),
                    q=q, prob=ProbConfig(K=3), **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(7),
                               jnp.zeros((1, 16, 16, 3)))
    return cfg, net, params


def _rand_img(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(1, h, w, 3)).astype(np.uint8)


def _fused(bc: TpuBitcoding) -> TpuBitcoding:
    bc._dec_fused = True
    return bc


def test_fused_decode_bit_exact(setup, tmp_path):
    cfg, net, params = setup
    enc = TpuBitcoding(cfg, net, params)
    img = _rand_img(32, 32, seed=1)
    p = str(tmp_path / "a.l3c")
    enc.encode(img, p)
    ref = TpuBitcoding(cfg, net, params).decode(p)
    got = _fused(TpuBitcoding(cfg, net, params)).decode(p)
    np.testing.assert_array_equal(ref, img)
    np.testing.assert_array_equal(got, img)


def test_fused_decode_padded_nonsquare(setup, tmp_path):
    """Odd sizes exercise stream-layout padding (masked tail lanes) in
    the fused scan."""
    cfg, net, params = setup
    enc = TpuBitcoding(cfg, net, params)
    img = _rand_img(19, 45, seed=2)
    p = str(tmp_path / "b.l3c")
    enc.encode(img, p)
    np.testing.assert_array_equal(
        _fused(TpuBitcoding(cfg, net, params)).decode(p), img)


def test_fused_decode_batch(setup, tmp_path):
    cfg, net, params = setup
    enc = TpuBitcoding(cfg, net, params)
    imgs = [_rand_img(16, 16, seed=s) for s in (3, 4)]
    ps = [str(tmp_path / f"c{i}.l3c") for i in range(2)]
    enc.encode_batch(imgs, ps)
    outs = _fused(TpuBitcoding(cfg, net, params)).decode_batch(ps)
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, im)


def test_fused_encode_scan_byte_identical(setup, tmp_path, monkeypatch):
    """Merging the coarse+fine encode scans into one wider scan
    (L3C_ENC_FUSED, default on) must not change a single stream byte —
    each lane's rANS encoding is independent of its neighbors."""
    cfg, net, params = setup
    img = _rand_img(24, 40, seed=9)
    monkeypatch.setenv("L3C_ENC_FUSED", "0")
    bc_two = TpuBitcoding(cfg, net, params)
    p_two = str(tmp_path / "two.l3c")
    bc_two.encode(img, p_two)
    monkeypatch.setenv("L3C_ENC_FUSED", "1")
    bc_one = TpuBitcoding(cfg, net, params)
    p_one = str(tmp_path / "one.l3c")
    bc_one.encode(img, p_one)
    with open(p_two, "rb") as f:
        two = f.read()
    with open(p_one, "rb") as f:
        one = f.read()
    assert one == two
    np.testing.assert_array_equal(bc_one.decode(p_one), img)


def test_fused_decode_rgb_baseline(tmp_path):
    """rgb_bicubic_baseline codes RGB at every scale — the fused path
    must also serve the inner scales' 'bn' consumer cast."""
    cfg = MsConfig(
        num_scales=2, Cf=8, rgb_bicubic_baseline=True,
        enc=EncConfig(cls="BicubicSubsampling", num_blocks=1,
                      feed_F=False),
        dec=DecConfig(num_blocks=1, skip=False),
        q=QConfig(C=3, L=5), prob=ProbConfig(K=2))
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(8),
                               jnp.zeros((1, 16, 16, 3)))
    enc = TpuBitcoding(cfg, net, params)
    img = _rand_img(24, 24, seed=5)
    p = str(tmp_path / "d.l3c")
    enc.encode(img, p)
    np.testing.assert_array_equal(
        _fused(TpuBitcoding(cfg, net, params)).decode(p), img)
