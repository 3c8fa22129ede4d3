"""Tests for the on-TPU vectorized rANS codec (runs on CPU backend).

Round-trip properties mirror tests/test_coder.py for the host backend;
additionally the v7 table spec (floor + 2l slack, edge-0 pin, implicit
top, NO cummax) is validated against numpy oracles.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.models import dmll
from l3c_tpu.ops import tpu_coder as tc


def _dec(tables_nl, words, L, lay):
    """decode_channels takes LANE-MAJOR (L, C*n) tables since round 4;
    tests build row-major (C*n, L) oracles and transpose here."""
    return tc.decode_channels(jnp.transpose(tables_nl), words, L, lay)


def _rand_table(rng, n, L):
    """Random valid tables: strictly increasing uint16 rows, freq>=1."""
    raw = rng.randint(0, 65536 - L, size=(n, L))
    raw.sort(axis=1)
    q = np.maximum.accumulate(raw, axis=1) + np.arange(L)
    return jnp.asarray(q.astype(np.uint16))


@pytest.mark.parametrize("n,C,L", [(1000, 1, 25), (777, 5, 256),
                                   (50, 2, 2), (1, 1, 25), (513, 3, 25)])
def test_rans_roundtrip_random_tables(n, C, L):
    rng = np.random.RandomState(0)
    lay = tc.layout_for(n, C)
    table = _rand_table(rng, C * n, L)
    syms = jnp.asarray(rng.randint(0, L, size=C * n).astype(np.int32))
    words, lens = jax.jit(
        lambda t, s: tc.encode_channels(t, s, L, lay))(table, syms)
    out = jax.jit(
        lambda t, w: _dec(t, w, L, lay))(table, words)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(syms))
    assert int(jnp.max(lens)) <= lay.T + 2
    assert words.shape == (lay.lanes, lay.T + 2)


def test_channel_slices_decode_independently():
    """Channel-aligned streams: decoding one channel's row slice works
    (the property the RGB lambda decode depends on)."""
    rng = np.random.RandomState(1)
    n, C, L = 700, 3, 25
    lay = tc.layout_for(n, C)
    lay1 = tc.layout_for(n, 1)
    table = _rand_table(rng, C * n, L)
    syms = rng.randint(0, L, size=C * n).astype(np.int32)
    words, _ = tc.encode_channels(table, jnp.asarray(syms), L, lay)
    for c in range(C):
        w_c = words[c * lay1.ns_c: (c + 1) * lay1.ns_c]
        t_c = table[c * n: (c + 1) * n]
        out = _dec(t_c, w_c, L, lay1)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1), syms[c * n: (c + 1) * n])


def test_rans_skewed_distribution():
    """Sharp tables + worst-case symbols (minimum-probability bins)."""
    rng = np.random.RandomState(1)
    n, L = 2000, 25
    lay = tc.layout_for(n, 1)
    q = np.zeros((n, L), np.int64)
    q[:, 1:] = 65536 - L  # all mass on symbol 0; others freq==1
    q = np.maximum.accumulate(q, 1) + np.arange(L)
    table = jnp.asarray(q.astype(np.uint16))
    syms = np.full(n, L - 1, np.int32)
    syms[::3] = 0
    syms[::7] = 13
    words, lens = tc.encode_channels(table, jnp.asarray(syms), L, lay)
    out = _dec(table, words, L, lay)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1), syms)


def test_uniform_roundtrip():
    rng = np.random.RandomState(2)
    for L in (2, 25, 256):
        n, C = 1500, 2
        lay = tc.layout_for(n, C)
        syms = jnp.asarray(rng.randint(0, L, size=C * n).astype(np.int32))
        words, lens = tc.encode_uniform(syms, L, lay)
        out = tc.decode_uniform(words, L, lay)
        np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                      np.asarray(syms))
        bits = float(jnp.sum(lens)) * 16 / (C * n)
        assert bits < np.log2(L) + 16 * 2 * lay.lanes / (C * n) + 0.2


def test_bitrate_tracks_entropy():
    """Biased table + matching symbols => near-entropy bitrate."""
    rng = np.random.RandomState(3)
    n, L = 40000, 25
    lay = tc.layout_for(n, 1)
    p = rng.dirichlet(np.full(L, 0.3))
    cum = np.concatenate([[0], np.cumsum(p)])[:L]
    q = np.maximum.accumulate(
        np.round(cum * (65536 - L)).astype(np.int64)) + np.arange(L)
    table = jnp.asarray(np.broadcast_to(q.astype(np.uint16), (n, L)).copy())
    syms = rng.choice(L, size=n, p=p).astype(np.int32)
    words, lens = tc.encode_channels(table, jnp.asarray(syms), L, lay)
    entropy_bits = -np.sum(np.log2(p[syms]))
    actual_bits = float(jnp.sum(lens)) * 16
    overhead = actual_bits / entropy_bits - 1
    assert overhead < 0.06, (actual_bits, entropy_bits)
    out = _dec(table, words, L, lay)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1), syms)


def test_table_lookup_symbol_matches_rows():
    rng = np.random.RandomState(7)
    n, L = 500, 25
    table = _rand_table(rng, n, L)
    syms = jnp.asarray(rng.randint(0, L, n).astype(np.int32))
    start, freq = tc.table_lookup_symbol(table, syms, L)
    t = np.asarray(table, np.int64)
    s = np.asarray(syms)
    exp_start = t[np.arange(n), s]
    exp_high = np.where(s == L - 1, 65536, t[np.arange(n),
                                             np.minimum(s + 1, L - 1)])
    np.testing.assert_array_equal(np.asarray(start), exp_start)
    np.testing.assert_array_equal(np.asarray(freq), exp_high - exp_start)


def test_build_cdf_table_spec():
    """Tables are strictly increasing with freq>=1 everywhere, and match
    a numpy reference of the formula."""
    rng = np.random.RandomState(4)
    n, K, L = 64, 4, 25
    pi = rng.dirichlet(np.ones(K), size=n).astype(np.float32)
    mu = rng.uniform(-1, 1, (n, K)).astype(np.float32)
    inv_s = np.exp(-rng.uniform(-5, 1, (n, K))).astype(np.float32)
    bw = 2.0 / 24
    table = np.asarray(tc.build_cdf_table(
        jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(inv_s),
        -1.0, bw, L)).astype(np.int64)
    diffs = np.diff(np.concatenate(
        [table, np.full((n, 1), 65536)], axis=1), axis=1)
    assert (diffs >= 1).all()
    # numpy reference of the v7 spec
    t = np.arange(L) * bw + (-1.0 - bw / 2)
    c = (pi[:, :, None] / (1 + np.exp(-(t - mu[:, :, None])
                                      * inv_s[:, :, None]))).sum(1)
    q = np.floor(np.clip(c, 0.0, 1.0) * (65536 - 2 * L))
    q = q + 2 * np.arange(L)
    q[:, 0] = 0  # lower-tail absorption: symbol 0 starts at 0
    np.testing.assert_allclose(table, q, atol=3)  # f32 vs f64 floor slack


def test_mixture_tables_lambda_conditioning():
    """RGB channel tables shift with decoded channel values."""
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = 2
    rng = np.random.RandomState(5)
    l = jnp.asarray(rng.randn(1, 4, 4, dmll.non_shared_get_Kp(K, 3))
                    .astype(np.float32))
    dec0 = jnp.zeros((1, 4, 4, 3))
    dec255 = jnp.full((1, 4, 4, 3), 255.0)
    t0 = np.asarray(tc.mixture_tables_for_channel(spec, l, 1, 3, dec0))
    t1 = np.asarray(tc.mixture_tables_for_channel(spec, l, 1, 3, dec255))
    assert not np.array_equal(t0, t1)
    # channel 0 ignores decoded values
    t0 = np.asarray(tc.mixture_tables_for_channel(spec, l, 0, 3, dec0))
    t1 = np.asarray(tc.mixture_tables_for_channel(spec, l, 0, 3, dec255))
    np.testing.assert_array_equal(t0, t1)


def test_encode_matches_decode_through_mixture_tables():
    """Full scale pipeline: params -> fused tables -> encode -> decode."""
    spec = dmll.DMLLSpec(rgb_scale=False, x_min=-1, x_max=1, L=25)
    K, C = 3, 5
    rng = np.random.RandomState(6)
    H = W = 16
    l = jnp.asarray(rng.randn(1, H, W, dmll.non_shared_get_Kp(K, C))
                    .astype(np.float32))
    lay = tc.layout_for(H * W, C)
    tables = tc.mixture_tables_all_channels(spec, l, C, None)
    syms = jnp.asarray(rng.randint(0, 25, C * H * W).astype(np.int32))
    words, lens = tc.encode_channels(tables, syms, 25, lay)
    out = _dec(tables, words, 25, lay)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(syms))


def _np_mixture_cdf(pi, mu, inv_s, t):
    """numpy float64 oracle of _mixture_cdf_at."""
    z = (t[:, None, :] - mu[:, :, None]) * inv_s[:, :, None]
    return (pi[:, :, None] / (1 + np.exp(-z))).sum(1)


def test_rgb_coarse_fine_tables_spec():
    """Two-level tables: coarse = CDF at 16-stride edges; fine =
    conditional CDF inside the decoded coarse bin; both strictly
    increasing; chain probabilities approximate the direct mixture."""
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = 4
    rng = np.random.RandomState(8)
    n = 64
    l = jnp.asarray(rng.randn(1, 8, 8, dmll.non_shared_get_Kp(K, 3))
                    .astype(np.float32))
    dec = jnp.asarray(rng.randint(0, 256, (1, 8, 8, 3))
                      .astype(np.float32))
    a = jnp.asarray(rng.randint(0, 16, n).astype(np.int32))

    ct = np.asarray(tc.rgb_coarse_tables(spec, l, 1, 3, dec), np.int64)
    ft = np.asarray(tc.rgb_fine_tables(spec, l, 1, 3, dec, a), np.int64)
    for t in (ct, ft):
        assert t.shape == (n, 16)
        d = np.diff(np.concatenate([t, np.full((n, 1), 65536)], 1), 1)
        assert (d >= 1).all()

    # numpy oracle of the coarse CDF values
    from l3c_tpu.models.dmll import pack_coder_params
    pi, mu, inv_s, lam = [np.asarray(x, np.float64) if x is not None
                          else None
                          for x in pack_coder_params(spec, l, 3)]
    mu1 = (mu[..., 1, :] + lam[..., 0, :]
           * np.asarray(dec)[..., 0:1]).reshape(n, K)
    pi1 = pi[..., 1, :].reshape(n, K)
    is1 = inv_s[..., 1, :].reshape(n, K)
    bw, t0 = 1.0, -0.5
    edges = (np.arange(16) * 16) * bw + t0
    c = _np_mixture_cdf(pi1, mu1, is1, np.broadcast_to(edges, (n, 16)))
    q = np.floor(np.clip(c, 0, 1) * (65536 - 32)) + 2 * np.arange(16)
    q[:, 0] = 0  # lower-tail absorption
    np.testing.assert_allclose(ct, q, atol=5)  # f32 vs f64 rounding

    # fine rows: conditional within bin a
    a_np = np.asarray(a)
    kk = np.arange(17)
    tfine = (a_np[:, None] * 16 + kk) * bw + t0
    cf = _np_mixture_cdf(pi1, mu1, is1, tfine)
    lo = np.where(a_np[:, None] == 0, 0.0, cf[:, :1])
    hi = np.where(a_np[:, None] == 15, 1.0, cf[:, -1:])
    cond = (cf[:, :16] - lo) / np.maximum(hi - lo, 1e-9)
    qf = np.floor(np.clip(cond, 0, 1) * (65536 - 32)) + 2 * np.arange(16)
    qf[:, 0] = 0  # lower-tail absorption
    # degenerate bins (negligible mass in the coarse bin) divide two
    # ~zero float32 quantities: numerically arbitrary but still a VALID
    # coding table (strict monotonicity asserted above); compare only
    # the well-conditioned rows against the float64 oracle
    ok = (hi - lo)[:, 0] > 1e-3
    assert ok.sum() > n // 4
    np.testing.assert_allclose(ft[ok], qf[ok], atol=5)


def test_two_level_roundtrip_chain():
    """Code (a, b) chains through the coarse+fine tables and recover the
    full 256-ary symbols."""
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = 3
    rng = np.random.RandomState(9)
    H = W = 16
    n = H * W
    l = jnp.asarray(rng.randn(1, H, W, dmll.non_shared_get_Kp(K, 3))
                    .astype(np.float32))
    dec = jnp.asarray(rng.randint(0, 256, (1, H, W, 3))
                      .astype(np.float32))
    syms = rng.randint(0, 256, n).astype(np.int32)
    a, b = syms >> 4, syms & 15
    lay = tc.layout_for(n, 1)

    ct = tc.rgb_coarse_tables(spec, l, 2, 3, dec)
    wa, _ = tc.encode_channels(ct, jnp.asarray(a), 16, lay)
    a_dec = _dec(ct, wa, 16, lay).reshape(-1)
    np.testing.assert_array_equal(np.asarray(a_dec), a)

    ft = tc.rgb_fine_tables(spec, l, 2, 3, dec, a_dec)
    wb, _ = tc.encode_channels(ft, jnp.asarray(b), 16, lay)
    b_dec = _dec(ft, wb, 16, lay).reshape(-1)
    np.testing.assert_array_equal(np.asarray(b_dec), b)
    np.testing.assert_array_equal(
        (np.asarray(a_dec) << 4) | np.asarray(b_dec), syms)


def test_v7_rows_strictly_increasing_adversarial():
    """Sharp, saturated, and out-of-range mixtures: every v7 row must be
    strictly increasing with the implicit 65536 top (freq >= 1) WITHOUT
    a cummax — the +2l slack guarantee."""
    rng = np.random.RandomState(13)
    n, K, L = 512, 4, 25
    pi = rng.dirichlet(np.ones(K) * 0.05, size=n).astype(np.float32)
    mu = rng.uniform(-8, 8, (n, K)).astype(np.float32)   # far outside
    inv_s = np.exp(rng.uniform(-2, 9, (n, K))).astype(np.float32)
    table = np.asarray(tc.build_cdf_table(
        jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(inv_s),
        -1.0, 2.0 / 24, L), np.int64)
    d = np.diff(np.concatenate([table, np.full((n, 1), 65536)], 1), 1)
    assert (d >= 1).all()
    assert (table[:, 0] == 0).all()


def test_lower_tail_absorption():
    """A confident model expresses "x = x_min" by pushing mu BELOW the
    range (DMLL open lower tail). The coding table must give symbol 0
    ~all the frequency; before the edge-0 pin this collapsed to freq 1
    (16 bits where theory pays ~0 — observed +108% file size)."""
    # single component far below the range, sharp-ish
    pi = jnp.asarray([[1.0]])
    mu = jnp.asarray([[-6.4]])
    inv_s = jnp.asarray([[2.3]])
    table = np.asarray(tc.build_cdf_table(pi, mu, inv_s, 0.0, 1.0, 256),
                       np.int64)[0]
    freq0 = table[1] - table[0]
    assert table[0] == 0
    assert freq0 > 60000, freq0  # ~all mass, not 1

    # coarse/fine two-level path, same regime
    spec = dmll.DMLLSpec(rgb_scale=True)
    K = dmll.non_shared_get_K(dmll.non_shared_get_Kp(1, 3), 3)
    l = np.zeros((1, 1, 1, dmll.non_shared_get_Kp(1, 3)), np.float32)
    # layout p,c,k: pi=anything (K=1 softmax -> 1), mu ch0 = -6.4,
    # log_s ch0 = log(1/2.3)
    lr = l.reshape(1, 1, 1, 4, 3, 1)
    lr[..., 1, 0, 0] = -6.4
    lr[..., 2, 0, 0] = np.log(1 / 2.3)
    dec = jnp.zeros((1, 1, 1, 3), jnp.float32)
    ct = np.asarray(tc.rgb_coarse_tables(spec, jnp.asarray(l), 0, 3, dec),
                    np.int64)[0]
    assert ct[0] == 0 and ct[1] - ct[0] > 60000, ct
    a0 = jnp.zeros((1,), jnp.int32)
    ft = np.asarray(tc.rgb_fine_tables(spec, jnp.asarray(l), 0, 3, dec,
                                       a0), np.int64)[0]
    assert ft[0] == 0 and ft[1] - ft[0] > 60000, ft


def test_compact_left_matches_reference():
    """The log-rotation compaction must equal a numpy stable compaction
    for arbitrary masks (random, all, none, alternating, blocks) —
    garbage beyond each lane's kept count is excluded by slicing."""
    import numpy as np
    import jax.numpy as jnp
    from l3c_tpu.ops.tpu_coder import _compact_left

    rng = np.random.RandomState(0)
    for T in (8, 64, 256, 1024):
        masks = [rng.rand(6, T) < p for p in (0.0, 0.2, 0.5, 0.9, 1.0)]
        alt = np.zeros((2, T), bool)
        alt[0, ::2] = True
        alt[1, 1::2] = True
        blocks = np.zeros((2, T), bool)
        blocks[0, : T // 3] = True
        blocks[1, T // 2:] = True
        for keep in masks + [alt, blocks]:
            a = rng.randint(0, 1 << 16, keep.shape).astype(np.int32)
            out = np.asarray(jax.jit(_compact_left)(
                jnp.asarray(a), jnp.asarray(keep)))
            for lane in range(keep.shape[0]):
                want = a[lane][keep[lane]]
                np.testing.assert_array_equal(out[lane][: want.size],
                                              want, err_msg=f"T={T}")


def test_packer_variants_bit_identical():
    """sort- and shift-packers must produce identical streams."""
    import numpy as np
    import jax
    from l3c_tpu.ops import tpu_coder as tc

    rng = np.random.RandomState(1)
    lanes, T = 16, 256
    freq = rng.randint(1, 5000, size=(lanes, T)).astype(np.uint32)
    start = np.minimum(rng.randint(0, 60000, size=(lanes, T)),
                       65536 - freq).astype(np.uint32)
    mask = rng.rand(lanes, T) < 0.97
    outs = {}
    for packer in ("sort", "shift"):
        tc.PACKER = packer
        w, l = jax.jit(tc.rans_encode)(jnp.asarray(start),
                                       jnp.asarray(freq),
                                       jnp.asarray(mask))
        outs[packer] = (np.asarray(w), np.asarray(l))
    tc.PACKER = "shift"
    np.testing.assert_array_equal(outs["sort"][1], outs["shift"][1])
    for lane in range(lanes):
        n = outs["sort"][1][lane]
        np.testing.assert_array_equal(outs["sort"][0][lane][:n],
                                      outs["shift"][0][lane][:n])
