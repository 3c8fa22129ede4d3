"""Unit tests for the numerics core: grids, quantizer, DMLL, pad.

DMLL is validated against scipy's closed-form logistic CDF (the reference has
no such tests; SURVEY.md section 4 calls for them).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import logistic as scipy_logistic

from l3c_tpu.models import dmll, grids, quantizer
from l3c_tpu.utils import pad as pad_mod


# ---------------------------------------------------------------- grids

def test_levels_rgb_exact_integers():
    lv = grids.levels(0.0, 255.0, 256)
    assert lv.dtype == np.float32
    np.testing.assert_array_equal(lv, np.arange(256, dtype=np.float32))


def test_levels_bn_span():
    lv = grids.levels(-1.0, 1.0, 25)
    assert lv.shape == (25,)
    assert lv[0] == np.float32(-1.0)
    np.testing.assert_allclose(lv[-1], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.diff(lv), 2.0 / 24.0, atol=1e-6)


def test_to_sym_to_bn_roundtrip():
    S = np.arange(25, dtype=np.int32)
    bn = grids.to_bn_np(S, -1.0, 1.0, 25)
    S2 = np.asarray(grids.to_sym(jnp.asarray(bn), -1.0, 1.0, 25))
    np.testing.assert_array_equal(S, S2)
    # to_bn must be bit-identical to levels[S]
    np.testing.assert_array_equal(bn, grids.levels(-1.0, 1.0, 25)[S])


def test_to_bn_jnp_np_bitwise_identical():
    S = np.random.RandomState(0).randint(0, 25, size=(1000,)).astype(np.int32)
    a = grids.to_bn_np(S, -1.0, 1.0, 25)
    b = np.asarray(grids.to_bn(jnp.asarray(S), -1.0, 1.0, 25))
    np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))


def test_targets_grid():
    t = grids.targets_grid(-1.0, 1.0, 25)
    assert t.shape == (26,)
    bw = grids.bin_width(-1.0, 1.0, 25)
    np.testing.assert_allclose(t[0], -1.0 - bw / 2, atol=1e-6)
    np.testing.assert_allclose(t[-1], 1.0 + bw / 2, atol=1e-5)


# ---------------------------------------------------------------- quantizer

def test_quantizer_hard_is_nearest_level():
    lv = jnp.asarray(grids.levels(-1.0, 1.0, 25))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 5),
                           minval=-1.2, maxval=1.2)
    out = quantizer.quantize(x, lv, sigma=2.0)
    expect_syms = np.argmin(
        (np.asarray(x)[..., None] - np.asarray(lv)) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(out.syms), expect_syms)
    np.testing.assert_array_equal(np.asarray(out.bn_q),
                                  np.asarray(lv)[expect_syms])
    # forward value of the STE output equals the hard value
    np.testing.assert_array_equal(np.asarray(out.bn), np.asarray(out.bn_q))


def test_quantizer_ste_gradient_is_soft():
    lv = jnp.asarray(grids.levels(-1.0, 1.0, 25))
    x = jnp.full((1, 2, 2, 1), 0.3)

    def f_ste(x):
        return jnp.sum(quantizer.quantize(x, lv, sigma=2.0).bn)

    def f_soft(x):
        d = (x[..., None] - lv) ** 2
        phi = jax.nn.softmax(-2.0 * d, axis=-1)
        return jnp.sum(jnp.sum(lv * phi, axis=-1))

    g_ste = jax.grad(f_ste)(x)
    g_soft = jax.grad(f_soft)(x)
    np.testing.assert_allclose(np.asarray(g_ste), np.asarray(g_soft),
                               rtol=1e-6)
    # and the hard path alone has zero gradient
    def f_hard(x):
        return jnp.sum(quantizer.quantize(x, lv, sigma=2.0).bn_q)
    assert np.all(np.asarray(jax.grad(f_hard)(x)) == 0.0)


# ---------------------------------------------------------------- DMLL

def _np_dmll_single(x, mu, log_s, x_min, x_max, L):
    """Closed-form discretized logistic probability via scipy."""
    bw = (x_max - x_min) / (L - 1)
    s = np.exp(log_s)
    cdf_plus = scipy_logistic.cdf(x + bw / 2, loc=mu, scale=s)
    cdf_min = scipy_logistic.cdf(x - bw / 2, loc=mu, scale=s)
    if x < x_min + 0.001:
        return cdf_plus
    if x > x_max - 0.001:
        return 1.0 - cdf_min
    return max(cdf_plus - cdf_min, 1e-12)


def _assert_nll_close(got, expected_p):
    """Compare a float32 NLL against a float64 oracle probability.

    In the deep tail (p < 1e-9) float32 cancellation in cdf_plus - cdf_min
    legitimately hits the 1e-12 clip before the float64 oracle does — the
    reference's float32 torch code behaves identically — so there we only
    require the NLL to be at least the tail bound.
    """
    if expected_p < 1e-9:
        assert got >= -np.log(1e-9) - 1e-3, (got, expected_p)
    else:
        np.testing.assert_allclose(got, -np.log(expected_p),
                                   rtol=2e-4, atol=2e-4)


def test_nll_matches_scipy_single_component():
    spec = dmll.DMLLSpec(rgb_scale=False, x_min=-1.0, x_max=1.0, L=25)
    C, K = 5, 1
    rng = np.random.RandomState(1)
    N, H, W = 1, 3, 3
    Kp = dmll.non_shared_get_Kp(K, C)
    l = rng.randn(N, H, W, Kp).astype(np.float32)
    lv = grids.levels(-1.0, 1.0, 25)
    x = lv[rng.randint(0, 25, size=(N, H, W, C))].astype(np.float32)

    got = np.asarray(dmll.nll(spec, jnp.asarray(x), jnp.asarray(l)))

    lr = l.reshape(N, H, W, 3, C, K)
    for n in range(N):
        for h in range(H):
            for w in range(W):
                for c in range(C):
                    mu = lr[n, h, w, 1, c, 0]
                    log_s = max(lr[n, h, w, 2, c, 0], -7.0)
                    p = _np_dmll_single(x[n, h, w, c], mu, log_s, -1.0, 1.0, 25)
                    _assert_nll_close(got[n, h, w, c], p)


def test_nll_matches_numpy_mixture():
    spec = dmll.DMLLSpec(rgb_scale=False, x_min=-1.0, x_max=1.0, L=25)
    C, K = 2, 4
    rng = np.random.RandomState(2)
    N, H, W = 1, 2, 2
    Kp = dmll.non_shared_get_Kp(K, C)
    l = rng.randn(N, H, W, Kp).astype(np.float32)
    lv = grids.levels(-1.0, 1.0, 25)
    x = lv[rng.randint(0, 25, size=(N, H, W, C))].astype(np.float32)

    got = np.asarray(dmll.nll(spec, jnp.asarray(x), jnp.asarray(l)))

    lr = l.reshape(N, H, W, 3, C, K).astype(np.float64)
    logit = lr[..., 0, :, :]
    pis = np.exp(logit) / np.exp(logit).sum(-1, keepdims=True)
    for idx in np.ndindex(N, H, W, C):
        n, h, w, c = idx
        p = 0.0
        for k in range(K):
            mu = lr[n, h, w, 1, c, k]
            log_s = max(lr[n, h, w, 2, c, k], -7.0)
            p += pis[n, h, w, c, k] * _np_dmll_single(
                x[n, h, w, c], mu, log_s, -1.0, 1.0, 25)
        _assert_nll_close(got[idx], p)


def test_nll_rgb_lambda_conditioning():
    """The RGB mixture's G/B means shift by sigmoid(lambda) * observed chans."""
    spec = dmll.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0, L=256)
    C, K = 3, 2
    rng = np.random.RandomState(3)
    Kp = dmll.non_shared_get_Kp(K, C)
    assert Kp == 4 * 3 * K
    l = rng.randn(1, 2, 2, Kp).astype(np.float32)
    x = rng.randint(0, 256, size=(1, 2, 2, 3)).astype(np.float32)

    got = np.asarray(dmll.nll(spec, jnp.asarray(x), jnp.asarray(l)))

    lr = l.reshape(1, 2, 2, 4, C, K).astype(np.float64)
    logit = lr[..., 0, :, :]
    pis = np.exp(logit) / np.exp(logit).sum(-1, keepdims=True)
    lam = 1.0 / (1.0 + np.exp(-lr[..., 3, :, :]))
    for n, h, w in np.ndindex(1, 2, 2):
        mus = lr[n, h, w, 1].copy()  # (C,K)
        mus[1] += lam[n, h, w, 0] * x[n, h, w, 0]
        mus[2] += (lam[n, h, w, 1] * x[n, h, w, 0]
                   + lam[n, h, w, 2] * x[n, h, w, 1])
        for c in range(3):
            p = 0.0
            for k in range(K):
                log_s = max(lr[n, h, w, 2, c, k], -7.0)
                p += pis[n, h, w, c, k] * _np_dmll_single(
                    x[n, h, w, c], mus[c, k], log_s, 0.0, 255.0, 256)
            _assert_nll_close(got[n, h, w, c], p)


def test_pack_coder_params_shapes():
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = 10
    l = jnp.zeros((1, 4, 4, dmll.non_shared_get_Kp(K, 3)))
    pi, mu, inv_s, lam = dmll.pack_coder_params(spec, l, 3)
    assert pi.shape == mu.shape == inv_s.shape == (1, 4, 4, 3, K)
    assert lam.shape == (1, 4, 4, 3, K)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inv_s), np.exp(0.0))

    spec_n = dmll.DMLLSpec(rgb_scale=False, x_min=-1, x_max=1, L=25)
    l = jnp.zeros((1, 4, 4, dmll.non_shared_get_Kp(K, 5)))
    pi, mu, inv_s, lam = dmll.pack_coder_params(spec_n, l, 5)
    assert pi.shape == (1, 4, 4, 5, K)
    assert lam is None


def test_sample_range_and_shapes():
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = 3
    rng = np.random.RandomState(4)
    l = jnp.asarray(rng.randn(1, 8, 8, dmll.non_shared_get_Kp(K, 3))
                    .astype(np.float32))
    x = dmll.sample(spec, l, 3, jax.random.PRNGKey(0))
    assert x.shape == (1, 8, 8, 3)
    assert np.all(np.asarray(x) >= 0.0) and np.all(np.asarray(x) <= 255.0)


# ---------------------------------------------------------------- pad

@pytest.mark.parametrize("h,w", [(13, 17), (16, 16), (8, 9), (1, 1)])
@pytest.mark.parametrize("mode", ["constant", "replicate"])
def test_pad_undo_pad_identity(h, w, mode):
    img = np.random.RandomState(0).randint(
        0, 255, size=(1, h, w, 3)).astype(np.float32)
    padded, tup = pad_mod.pad(img, fac=8, mode=mode)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    back = pad_mod.undo_pad(padded, *tup)
    np.testing.assert_array_equal(back, img)


def test_pad_noop_when_divisible():
    img = np.zeros((1, 16, 32, 3), np.float32)
    padded, tup = pad_mod.pad(img, fac=8)
    assert tup == (0, 0, 0, 0)
    assert padded is img


def test_mean_symbol_probs_matches_numpy_oracle():
    """p_y (mean predicted symbol distribution): sums to 1 and matches a
    float64 numpy oracle that averages per-pixel discretized mixture
    probabilities (tails absorbed into the edge symbols)."""
    spec = dmll.DMLLSpec(rgb_scale=False, x_min=-1.0, x_max=1.0, L=9)
    rng = np.random.RandomState(3)
    N, H, W, C, K = 1, 4, 5, 2, 3
    l = rng.randn(N, H, W, spec.num_params * C * K).astype(np.float32)
    x = rng.uniform(-1, 1, (N, H, W, C)).astype(np.float32)
    p_y = np.asarray(jax.jit(dmll.mean_symbol_probs,
                             static_argnums=(0,))(spec, jnp.asarray(x),
                                                  jnp.asarray(l)))
    assert p_y.shape == (spec.L,)
    np.testing.assert_allclose(p_y.sum(), 1.0, atol=1e-5)
    # numpy oracle
    lr = l.reshape(N, H, W, spec.num_params, C, K).astype(np.float64)
    pis = np.exp(lr[..., 0, :, :])
    pis /= pis.sum(-1, keepdims=True)
    mu = lr[..., 1, :, :]
    inv_s = np.exp(-np.maximum(lr[..., 2, :, :], dmll.LOG_SCALES_MIN))
    bw = spec.bin_width
    edges = spec.x_min - bw / 2 + bw * np.arange(spec.L + 1)
    cdf = (pis[..., None] / (1 + np.exp(
        -(edges - mu[..., None]) * inv_s[..., None]))).sum(-2)  # NHWC,L+1
    cdf[..., 0] = 0.0
    cdf[..., -1] = 1.0
    oracle = np.diff(cdf, axis=-1).mean(axis=(0, 1, 2, 3))
    np.testing.assert_allclose(p_y, oracle, atol=1e-5)


def test_levels_select_bitwise_equals_gather():
    """levels_select must copy table values bit-exactly for every
    symbol (the no-gather replacement inside quantize/decode)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from l3c_tpu.models import grids
    from l3c_tpu.models.quantizer import levels_select

    for (lo, hi, L) in ((-1.0, 1.0, 25), (0.0, 255.0, 256),
                        (-2.0, 2.0, 13)):
        lv = jnp.asarray(grids.levels(lo, hi, L))
        syms = jnp.asarray(np.tile(np.arange(L, dtype=np.int32),
                                   (2, 3, 1)))
        out = np.asarray(jax.jit(levels_select)(lv, syms))
        ref = np.asarray(lv)[np.asarray(syms)]
        np.testing.assert_array_equal(
            out.view(np.uint32), ref.view(np.uint32))
