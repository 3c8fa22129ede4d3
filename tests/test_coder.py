"""Property tests for the C++ rANS entropy backend.

SURVEY.md section 4: 'property tests for the C++ rANS coder (random CDFs,
round-trip, adversarial skewed distributions)'. The backend evaluates
mixture CDFs on the fly, so these tests are the spec for the determinism
and monotonicity contract between encode and decode.
"""
import numpy as np
import pytest

from l3c_tpu.ops.coder import MixtureCoder, UniformCoder, get_lib


def _rand_params(rng, C, HW, K, spread=1.0, x_min=-1.0, x_max=1.0):
    pi = rng.dirichlet(np.ones(K), size=(C, HW)).astype(np.float32)
    mu = rng.uniform(x_min, x_max, size=(C, HW, K)).astype(np.float32)
    log_s = rng.uniform(-5, spread, size=(C, HW, K)).astype(np.float32)
    inv_s = np.exp(-np.maximum(log_s, -7.0)).astype(np.float32)
    return pi, mu, inv_s


def test_lib_builds_and_versions():
    assert get_lib().l3c_coder_version() >= 10


@pytest.mark.parametrize("L,x_min,x_max", [(25, -1.0, 1.0), (256, 0.0, 255.0)])
def test_mixture_roundtrip_random(L, x_min, x_max):
    rng = np.random.RandomState(0)
    C, HW, K = 5, 777, 10
    pi, mu, inv_s = _rand_params(rng, C, HW, K, x_min=x_min, x_max=x_max)
    syms = rng.randint(0, L, size=(C, HW)).astype(np.int32)
    coder = MixtureCoder(L, x_min, x_max)
    data, lens = coder.encode(pi, mu, inv_s, None, syms)
    assert sum(lens) == len(data)
    out = coder.decode(pi, mu, inv_s, None, data, lens)
    np.testing.assert_array_equal(out, syms)


def test_mixture_roundtrip_rgb_lambda():
    """RGB path: channel-autoregressive means from decoded channels."""
    rng = np.random.RandomState(1)
    C, HW, K = 3, 512, 10
    pi, mu, inv_s = _rand_params(rng, C, HW, K, x_min=0, x_max=255)
    mu *= 0  # keep adjusted means in-range-ish
    mu += rng.uniform(0, 255, size=(C, HW, K)).astype(np.float32) * 0.5
    lam = rng.uniform(0, 1, size=(3, HW, K)).astype(np.float32)
    syms = rng.randint(0, 256, size=(C, HW)).astype(np.int32)
    coder = MixtureCoder(256, 0.0, 255.0)
    data, lens = coder.encode(pi, mu, inv_s, lam, syms)
    out = coder.decode(pi, mu, inv_s, lam, data, lens)
    np.testing.assert_array_equal(out, syms)
    # and: dropping lambda must NOT give the same stream (it is used)
    data2, _ = coder.encode(pi, mu, inv_s, None, syms)
    assert data2 != data


def test_mixture_adversarial_skew():
    """Extremely sharp components + symbols far in the tails."""
    rng = np.random.RandomState(2)
    C, HW, K = 2, 300, 4
    pi = np.zeros((C, HW, K), np.float32)
    pi[..., 0] = 1.0 - 3e-5
    pi[..., 1:] = 1e-5
    mu = np.full((C, HW, K), -1.0, np.float32)      # all mass at symbol 0
    inv_s = np.full((C, HW, K), np.exp(7.0), np.float32)  # sharpest allowed
    # adversarial: code the OPPOSITE end (worst-case probability)
    syms = np.full((C, HW), 24, np.int32)
    syms[:, ::3] = 0
    coder = MixtureCoder(25, -1.0, 1.0)
    data, lens = coder.encode(pi, mu, inv_s, None, syms)
    out = coder.decode(pi, mu, inv_s, None, data, lens)
    np.testing.assert_array_equal(out, syms)


def test_mixture_all_symbols_all_positions():
    """Every symbol value survives at every chunk position."""
    rng = np.random.RandomState(3)
    L, C, K = 25, 1, 3
    HW = L * L
    pi, mu, inv_s = _rand_params(rng, C, HW, K)
    syms = np.tile(np.arange(L, dtype=np.int32), L).reshape(C, HW)
    coder = MixtureCoder(L, -1.0, 1.0)
    data, lens = coder.encode(pi, mu, inv_s, None, syms)
    out = coder.decode(pi, mu, inv_s, None, data, lens)
    np.testing.assert_array_equal(out, syms)


def test_bitrate_close_to_cross_entropy():
    """Actual bytes must track the model cross-entropy (small overhead).

    Mirrors the reference's --compare_theory check (bitcoding.py:112-121).
    """
    rng = np.random.RandomState(4)
    C, HW, K = 1, 20000, 1
    L, x_min, x_max = 25, -1.0, 1.0
    bw = (x_max - x_min) / (L - 1)
    pi = np.ones((C, HW, K), np.float32)
    mu = rng.uniform(-1, 1, size=(C, HW, K)).astype(np.float32)
    log_s = np.full((C, HW, K), -2.5, np.float32)
    inv_s = np.exp(-log_s).astype(np.float32)

    # sample symbols from the actual model per-pixel
    grid = x_min + bw * np.arange(L)
    cdf_hi = 1 / (1 + np.exp(-(grid[None, :] + bw / 2 - mu[0, :, 0, None])
                             * inv_s[0, :, 0, None]))
    cdf_lo = 1 / (1 + np.exp(-(grid[None, :] - bw / 2 - mu[0, :, 0, None])
                             * inv_s[0, :, 0, None]))
    p = np.clip(cdf_hi - cdf_lo, 1e-12, None)
    p[:, 0] = cdf_hi[:, 0]
    p[:, -1] = 1.0 - cdf_lo[:, -1]
    p /= p.sum(-1, keepdims=True)
    cum = np.cumsum(p, -1)
    u = rng.uniform(size=(HW, 1))
    syms = (u > cum).sum(-1).astype(np.int32).reshape(C, HW)

    entropy_bits = -np.log2(p[np.arange(HW), syms[0]]).sum()
    coder = MixtureCoder(L, x_min, x_max)
    data, lens = coder.encode(pi, mu, inv_s, None, syms)
    actual_bits = len(data) * 8
    overhead = actual_bits / entropy_bits - 1
    assert overhead < 0.02, (actual_bits, entropy_bits)
    out = coder.decode(pi, mu, inv_s, None, data, lens)
    np.testing.assert_array_equal(out, syms)


@pytest.mark.parametrize("L", [2, 25, 256, 65536])
def test_uniform_roundtrip(L):
    rng = np.random.RandomState(5)
    n = 4321
    syms = rng.randint(0, L, size=n).astype(np.int32)
    coder = UniformCoder(L)
    data, lens = coder.encode(syms)
    out = coder.decode(data, lens, n)
    np.testing.assert_array_equal(out, syms)
    # uniform coding must cost ~log2(L) bits/sym
    bits = len(data) * 8 / n
    assert bits < np.log2(L) + 0.1 + 64 * coder.n_chunks / n


def test_uniform_empty_and_single():
    coder = UniformCoder(25, n_chunks=1)
    for n in (1, 2, 3):
        syms = np.arange(n, dtype=np.int32) % 25
        data, lens = coder.encode(syms)
        np.testing.assert_array_equal(coder.decode(data, lens, n), syms)


def test_deterministic_encode():
    """Same inputs -> byte-identical stream (encode is a pure function)."""
    rng = np.random.RandomState(6)
    C, HW, K = 2, 100, 5
    pi, mu, inv_s = _rand_params(rng, C, HW, K)
    syms = rng.randint(0, 25, size=(C, HW)).astype(np.int32)
    coder = MixtureCoder(25, -1.0, 1.0)
    d1, l1 = coder.encode(pi, mu, inv_s, None, syms)
    d2, l2 = coder.encode(pi, mu, inv_s, None, syms)
    assert d1 == d2 and np.array_equal(l1, l2)
