"""Format-v8 exact-integer-in-f32 coding CDF (ops.int_coder).

The load-bearing properties, each tested here:
1. int_sigmoid is EXACTLY a known integer function (int64 oracle),
   exactly monotone and exactly antisymmetric — exhaustively over its
   whole 2^15 domain.
2. Rows/lookups match a pure-int64 numpy oracle bit-for-bit.
3. CROSS-PROGRAM EXACTNESS: the 2-edge encode lookup evaluated in a
   differently-shaped, differently-fused program equals the decode
   row entries exactly (the property the v7 float evaluator measurably
   lacks, which forced v7 encode to build full rows).
4. Rows are strictly increasing (freq >= 1) with tails pinned, under
   adversarial params.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.models import dmll
from l3c_tpu.ops import int_coder as ic

SIG_C = ic.SIG_C
SIG_CB = ic.SIG_CB


# ------------------------------------------------------- int64 oracles


def oracle_sigmoid(z):
    z = np.asarray(z, np.int64)
    neg = z < 0
    za = np.minimum(np.abs(z), ic.Z_SAT)
    i = za >> 10
    f = za & 1023
    p = np.full_like(za, SIG_C[4])
    for c in (SIG_C[3], SIG_C[2], SIG_C[1], SIG_C[0]):
        p = c - ((f * p) >> 10)
    e = p >> 2
    for b in range(4):
        e = np.where((i >> b) & 1 == 1, (e * SIG_CB[b]) >> 12, e)
    q = (1 << 24) // (4096 + e)
    return np.where(neg, 4096 - q, q)


def oracle_cdf_q14(p_q, z):
    sg = oracle_sigmoid(z)
    acc = ((p_q[..., None] * sg) >> 10).sum(axis=-2)
    return np.clip(acc, 0, ic.C_ONE)


def oracle_quantize(c, l_idx, L):
    M = 65536 - 2 * L
    q = (((c * (M >> 7)) >> 7) + ((c * (M & 127)) >> 14)
         + 2 * np.asarray(l_idx, np.int64))
    q = np.where(np.asarray(l_idx) <= 0, 0, q)
    return np.where(np.asarray(l_idx) >= L, 65536, q)


def oracle_bn_rows(p_q, a_q, v_q, L):
    e = np.arange(L + 1)
    z = np.clip(e[None, None, :] * a_q[..., None] - v_q[..., None],
                -ic.Z_SAT, ic.Z_SAT)
    c = oracle_cdf_q14(p_q, z)
    return oracle_quantize(c, e, L)


def rand_params(n, K, seed=0, sharp=False):
    rng = np.random.RandomState(seed)
    pi = rng.dirichlet(np.ones(K) * (0.05 if sharp else 0.5), n)
    a_hat = np.clip(np.exp(rng.uniform(-6, 5, (n, K))),
                    ic.A_MIN, ic.A_MAX)
    m_hat = rng.uniform(-40, 300, (n, K))
    p_q = np.round(pi * ic.PI_Q)
    a_q = np.round(a_hat * (1 << ic.ZF))
    v_q = np.clip(np.round(m_hat * a_hat * (1 << ic.ZF)),
                  -ic.V_CLAMP, ic.V_CLAMP)
    return (p_q.astype(np.int64), a_q.astype(np.int64),
            v_q.astype(np.int64))


# ---------------------------------------------------------------- tests


def test_sigmoid_exhaustive():
    """Whole domain: f32 impl == int64 oracle, monotone, symmetric."""
    z = np.arange(-(ic.Z_SAT + 64), ic.Z_SAT + 65, dtype=np.float32)
    got = np.asarray(jax.jit(ic.int_sigmoid)(jnp.asarray(z)), np.int64)
    want = oracle_sigmoid(z.astype(np.int64))
    np.testing.assert_array_equal(got, want)
    assert (np.diff(got) >= 0).all()
    assert (got + got[::-1] == 4096).all()
    assert got.min() == 0 and got.max() == 4096
    # accuracy vs the real sigmoid
    true = 1.0 / (1.0 + np.exp(-np.clip(z, -ic.Z_SAT, ic.Z_SAT) / 1024))
    assert np.abs(got / 4096.0 - true).max() < 5e-4


def test_bn_rows_match_oracle():
    n, K, L = 512, 4, 25
    p_q, a_q, v_q = rand_params(n, K, seed=1)
    # lane-major call: params (K, n), edges (L+1,) iota -> cd (L+1, n)
    fn = jax.jit(lambda p, a, v: ic.bn_cdf_at_edges(
        p, a, v, jnp.arange(L + 1, dtype=jnp.float32)))
    cd = np.asarray(fn(*(jnp.asarray(x.T, jnp.float32)
                         for x in (p_q, a_q, v_q))), np.int64)
    e = np.arange(L + 1)
    z = np.clip(e[None, None, :] * a_q[..., None] - v_q[..., None],
                -ic.Z_SAT, ic.Z_SAT)
    np.testing.assert_array_equal(cd.T, oracle_cdf_q14(p_q, z))
    q = np.asarray(jax.jit(
        lambda c: ic.quantize_edges(
            c, jnp.arange(L + 1, dtype=jnp.float32)[:, None], L))(
        jnp.asarray(cd, jnp.float32)), np.int64)
    np.testing.assert_array_equal(q.T, oracle_quantize(cd.T, e, L))


def test_rows_strictly_increasing_adversarial():
    n, K, L = 2048, 4, 25
    p_q, a_q, v_q = rand_params(n, K, seed=2, sharp=True)
    rows = oracle_bn_rows(p_q, a_q, v_q, L)
    d = np.diff(rows, axis=-1)
    assert (d >= 1).all()
    assert (rows[:, 0] == 0).all() and (rows[:, -1] == 65536).all()


def test_cross_program_two_edge_equals_rows():
    """THE v8 contract: a 2-edge lookup in a deliberately different
    program (different shape, extra fused ops around it) must equal the
    full-row build entries EXACTLY, for every symbol."""
    n, K, L = 640, 4, 25
    p_q, a_q, v_q = rand_params(n, K, seed=3, sharp=True)
    args = tuple(jnp.asarray(x, jnp.float32) for x in (p_q, a_q, v_q))

    @jax.jit
    def rows_program(p, a, v):
        # full rows inside a bigger fused context (lane-major (K, n))
        cd = ic.bn_cdf_at_edges(p, a, v,
                                jnp.arange(L, dtype=jnp.float32))
        q = ic.quantize_edges(
            cd, jnp.arange(L, dtype=jnp.float32)[:, None], L)
        return q + 0.0 * jnp.sum(p)          # extra consumer, new fusion

    rows = np.asarray(rows_program(*(a.T for a in args)),
                      np.int64).T                             # (n, L)

    for shape_mode in ("flat", "padded", "chunk"):
        if shape_mode == "flat":
            sel = np.arange(n)
        elif shape_mode == "padded":
            sel = np.arange(n // 2)           # different program shape
        else:
            sel = np.arange(13, n // 3)       # odd size

        syms = np.tile(np.arange(L), (len(sel) // L + 1))[: len(sel)]

        @jax.jit
        def lookup_program(p, a, v, s):
            # different surrounding ops -> different fusion decisions
            p = p * jnp.float32(1.0)
            e = jnp.stack([s, s + np.float32(1)], axis=0)
            cd = ic.bn_cdf_at_edges(p, a, v, e)
            q = ic.quantize_edges(cd, e, L)
            return (q[0], q[1] - q[0],
                    jnp.sum(jnp.sqrt(jnp.abs(v))))  # extra fused consumer

        st, fr, _ = lookup_program(
            *(x.T[:, jnp.asarray(sel)] for x in args),
            jnp.asarray(syms, jnp.float32))
        st, fr = np.asarray(st, np.int64), np.asarray(fr, np.int64)
        top = np.concatenate([rows[sel], np.full((len(sel), 1), 65536)],
                             axis=1)
        want_start = top[np.arange(len(sel)), syms]
        want_freq = top[np.arange(len(sel)), syms + 1] - want_start
        np.testing.assert_array_equal(st, want_start, err_msg=shape_mode)
        np.testing.assert_array_equal(fr, want_freq, err_msg=shape_mode)


def test_rgb_fine_lookup_matches_rows_with_lambda():
    """Two-level RGB with the lambda chain: fine 2-edge lookups (encode,
    conditioned on target symbols) == fine rows (decode, conditioned on
    decoded symbols) — exact, across programs."""
    n, K = 360, 3
    rng = np.random.RandomState(5)
    N, H, W = 1, 18, 20
    spec = dmll.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0, L=256)
    Kp = dmll.non_shared_get_Kp(K, 3)
    l = rng.randn(N, H, W, Kp).astype(np.float32) * 1.5
    ip = jax.jit(lambda lv: ic.pack_int_params(spec, lv, 3))(
        jnp.asarray(l))
    syms = rng.randint(0, 256, (N, H, W, 3)).astype(np.int32)
    a_sym = syms >> 4
    b_sym = syms & 15
    for c in range(3):
        dec = tuple(jnp.asarray(syms[..., j].reshape(-1))
                    for j in range(c))
        a_c = jnp.asarray(a_sym[..., c].reshape(-1))
        b_c = jnp.asarray(b_sym[..., c].reshape(-1))
        rows = np.asarray(jax.jit(
            lambda ipp, d, a: ic.rgb_fine_rows(ipp, c, d, a))(
            ip, dec, a_c), np.int64).T
        st, fr = jax.jit(
            lambda ipp, d, a, b: ic.rgb_fine_lookup(ipp, c, d, a, b))(
            ip, dec, a_c, b_c)
        st, fr = np.asarray(st, np.int64), np.asarray(fr, np.int64)
        top = np.concatenate([rows, np.full((rows.shape[0], 1), 65536)],
                             axis=1)
        bi = b_sym[..., c].reshape(-1)
        want_start = top[np.arange(len(bi)), bi]
        want_freq = top[np.arange(len(bi)), bi + 1] - want_start
        np.testing.assert_array_equal(st, want_start)
        np.testing.assert_array_equal(fr, want_freq)
        assert (fr >= 1).all()
        # coarse too
        crows = np.asarray(jax.jit(
            lambda ipp, d: ic.rgb_coarse_rows(ipp, c, d))(ip, dec),
            np.int64).T
        cst, cfr = jax.jit(
            lambda ipp, d, a: ic.rgb_coarse_lookup(ipp, c, d, a))(
            ip, dec, a_c)
        ctop = np.concatenate([crows, np.full((crows.shape[0], 1),
                                              65536)], axis=1)
        ai = a_sym[..., c].reshape(-1)
        np.testing.assert_array_equal(np.asarray(cst, np.int64),
                                      ctop[np.arange(len(ai)), ai])
        np.testing.assert_array_equal(
            np.asarray(cfr, np.int64),
            ctop[np.arange(len(ai)), ai + 1]
            - ctop[np.arange(len(ai)), ai])


def test_pack_topk_and_bitrate_sanity():
    """Integer tables cost ~nothing vs the float64 model distribution,
    and topk truncation composes (all inside one jitted pack)."""
    n, K, L = 4000, 10, 25
    rng = np.random.RandomState(7)
    spec = dmll.DMLLSpec(rgb_scale=False, x_min=-1.0, x_max=1.0, L=L)
    N, H, W, C = 1, 50, 80, 1
    Kp = dmll.non_shared_get_Kp(K, C)
    l = (rng.randn(N, H, W, Kp) * 1.2).astype(np.float32)
    ip = jax.jit(lambda lv: ic.pack_int_params(spec, lv, C))(
        jnp.asarray(l))
    rows = np.asarray(jax.jit(
        lambda ipp: ic.bn_rows(ipp, C, L))(ip), np.int64).T
    top = np.concatenate([rows, np.full((rows.shape[0], 1), 65536)], 1)
    p_int = np.diff(top, axis=1) / 65536.0
    assert (np.diff(top, axis=1) >= 1).all()
    # float64 oracle distribution
    pi, mu, inv_s, _ = (np.asarray(x, np.float64) for x in
                        jax.jit(lambda lv: dmll.pack_coder_params(
                            spec, lv, C))(jnp.asarray(l)))
    bw = spec.bin_width
    edges = spec.x_min - bw / 2 + bw * np.arange(L + 1)
    with np.errstate(over="ignore"):
        cd = (pi[..., None] / (1 + np.exp(
            -(edges - mu[..., None]) * inv_s[..., None]))).sum(-2)
    cd[..., 0] = 0
    cd[..., -1] = 1
    p_true = np.clip(np.diff(cd, axis=-1), 1e-300, None).reshape(-1, L)
    H_true = -(p_true * np.log2(p_true)).sum(-1).mean()
    x_int = -(p_true * np.log2(p_int)).sum(-1).mean()
    assert x_int / H_true - 1 < 0.005, (H_true, x_int)
    # topk variant stays valid + close
    ip4 = jax.jit(lambda lv: ic.pack_int_params(spec, lv, C, topk=4))(
        jnp.asarray(l))
    rows4 = np.asarray(jax.jit(
        lambda ipp: ic.bn_rows(ipp, C, L))(ip4), np.int64).T
    top4 = np.concatenate([rows4, np.full((rows4.shape[0], 1), 65536)],
                          1)
    assert (np.diff(top4, axis=1) >= 1).all()
    p4 = np.diff(top4, axis=1) / 65536.0
    x4 = -(p_true * np.log2(p4)).sum(-1).mean()
    assert x4 / H_true - 1 < 0.03, (H_true, x4)


def test_topk_sel_variants_bitwise_equal(monkeypatch):
    """L3C_TOPK_SEL=stack (per-rank masked sums) and =kmajor (one
    streaming pass) must produce BITWISE-identical IntParams: both
    forms sum exactly one nonzero term per (c, pixel, rank) plus
    zeros, so the selected value itself comes out either way. The
    variants differ only in measured device time (tools/topk_probe)."""
    rng = np.random.RandomState(11)
    for rgb in (False, True):
        K = 10
        C = 3 if rgb else 2
        spec = (dmll.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0,
                              L=256) if rgb else
                dmll.DMLLSpec(rgb_scale=False, x_min=-1.0, x_max=1.0,
                              L=25))
        Kp = dmll.non_shared_get_Kp(K, C)
        N, H, W = 2, 12, 16
        l = (rng.randn(N, H, W, Kp) * 1.3).astype(np.float32)
        # engineered ties so tie-handling is covered too
        l[0, 0, 0] = l[0, 1, 1]
        ips = {}
        for variant in ("stack", "kmajor"):
            monkeypatch.setenv("L3C_TOPK_SEL", variant)
            ips[variant] = jax.jit(
                lambda lv: ic.pack_int_params(spec, lv, C, topk=4))(
                jnp.asarray(l))
        for name in ip_fields(ips["stack"]):
            a = getattr(ips["stack"], name)
            b = getattr(ips["kmajor"], name)
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint32),
                np.asarray(b).view(np.uint32),
                err_msg=f"rgb={rgb} field={name}")


def ip_fields(ip):
    return ip._fields


def test_topk_masks_match_stable_argsort_oracle():
    """Rank-based top-k selection == numpy stable descending top-k,
    including exact ties (ties must break to the LOWER index so both
    coder sides agree for any input)."""
    rng = np.random.RandomState(3)
    C, K, n, topk = 2, 10, 64, 4
    pi = rng.rand(C, K, n).astype(np.float32)
    # engineered ties: duplicate the max into a later slot for some
    # pixels, triple-tie a mid value for others
    pi[0, 7, :16] = pi[0, 2, :16]
    pi[1, 4, 16:32] = pi[1, 1, 16:32]
    pi[1, 9, 16:32] = pi[1, 1, 16:32]
    masks = jax.jit(lambda p: ic.topk_masks(p, topk))(jnp.asarray(pi))
    masks = [np.asarray(m) for m in masks]
    # oracle: stable argsort of -pi (stable => ties keep low index
    # first), one component per rank slot
    order = np.argsort(-pi, axis=1, kind="stable")
    for r in range(topk):
        exp = np.zeros((C, K, n), bool)
        for c in range(C):
            exp[c, order[c, r, np.arange(n)], np.arange(n)] = True
        np.testing.assert_array_equal(masks[r], exp, err_msg=f"r={r}")
    # disjoint and exactly one per pixel
    total = np.sum(masks, axis=0)
    assert total.max() <= 1
    counts = np.sum(total, axis=1)          # selections per (c, pixel)
    assert counts.min() == topk and counts.max() == topk
