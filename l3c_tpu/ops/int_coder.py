"""Exact-integer coding CDF in float32 — the format-v8 evaluator.

Round 3 measured two facts that shape this design (RESULTS.md):

1. The same float expression evaluated in two DIFFERENTLY-FUSED XLA
   programs diverges by 1 ulp (~1e-3 of symbols) and flips floor() at
   quantization boundaries — so a v7 float coding CDF is only
   deterministic when encode and decode share the same builder
   programs, and a 2-edge encode lookup (a different program than the
   decode row builder) is unsound.
2. int32 arithmetic on the TPU VPU is ~7x slower than f32 for this op
   mix, so a plain integer evaluator is not an option.

The v8 evaluator therefore does EXACT INTEGER ARITHMETIC IN FLOAT32:
every value is an integer stored in f32, and every multiplication's
exact product fits in 24 significand bits. Such products are exactly
representable, so FMA contraction — the fusion freedom that produces
the 1-ulp divergence — cannot change any result: fma(a, b, c) and
round(round(a*b) + c) coincide when a*b is exact. Adds/subs of exact
values are single correctly-rounded IEEE ops, identical on every
platform. The one true division (the sigmoid reciprocal and the fine
conditional) is made exact with a multiply-free floor-correction step.
Result: ANY program, any fusion, any IEEE platform produces the same
coding CDF — encode can evaluate just the 2 edges around each known
symbol while decode builds full rows, and a v8 file encodes on TPU and
decodes on CPU bit-exactly.

LANE-MAJOR LAYOUT (round 4): every array keeps the pixel dimension n
MINOR. The previous (n, C, K) / (n, K, E) layouts put K=10 and E=2..16
in the two minor dims, which the TPU's (8, 128) vector tiling pads to
(16, 128) — an 8-13x waste on rows and up to 64x on 2-edge lookups
(measured: the row builders ran at ~3% VPU utilization). IntParams is
now (C, K', n), rows come out (L, n), and every elementwise op runs on
fully-occupied (.., n) tiles. The exact-integer contract makes this
restructuring bit-safe BY CONSTRUCTION: the same integer function in
any program shape produces the same values (the oracle tests assert
it). Exception: pack_int_params is the float boundary — its reductions
moved axes, so v8 files carry a new contract canary.

Fixed-point formats (all stored in f32):
  z         Q10, saturated to +-16383 (|z| >= 16 saturates sigmoid)
  a_q       round(clip(inv_s * bin_w, 2^-8, 64) * 2^10)      <= 2^16
  sc_q      round(16 * a_hat * 2^10)  (RGB coarse edge step)  <= 2^20
  v_q       round(m_hat * a_hat * 2^10), |.| <= 2^24
  pi        Q12 (p_q <= 4096)
  sigmoid   Q12 out (0..4096), Q14 internal polynomial
  CDF c     Q14 (0..16384)
  table     integer in [0, 65536] per the v7 +2l spec (kept in v8)

Numerical cost of the integer realization vs the float v7 tables,
measured against a float64 oracle: +0.001% bitrate on generic mixture
params, +0.13% on adversarially confident ones (tests).

The sigmoid is verified EXHAUSTIVELY (32768-value domain) against a
pure-int64 oracle: exactly equal, exactly monotone, exactly symmetric
(tests/test_int_coder.py). Monotone c + the +2l slack make every row
strictly increasing with no cummax, so the 2-edge encode lookup equals
the decode row entries BY CONSTRUCTION.

Reference anchors: torchac_kernel.cu:20-77 (the fused CUDA CDF kernel
being out-designed) and ops/csrc/l3c_coder.cpp:50-77 (the host
backend's provably-monotone evaluator, whose argument inspired this).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dmll as dmll_mod

# ---- evaluator constants (FROZEN: part of the v8 bitstream format)
ZF = 10                      # z fraction bits
Z_SAT = 16 * 1024 - 1        # 16383
A_MIN, A_MAX = 1.0 / 256, 64.0
SIG_C = (16384, 16373, 8116, 2517, 419)   # e^-u poly, Q14, Horner
SIG_CB = (1507, 554, 75, 1)               # e^-(2^b), Q12
PI_Q = 4096                  # pi scale (Q12)
C_ONE = 16384                # CDF 1.0 (Q14)
V_CLAMP = float(1 << 24)

_F = jnp.float32


def _fdiv2(x, p: int):
    """floor(x / 2^p) — exact for integer-valued f32 x (scaling by a
    power of two is exact; floor is exact)."""
    return jnp.floor(x * np.float32(1.0 / (1 << p)))


def int_sigmoid(z: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(z / 2^10) in Q12, exact-integer f32 in/out.

    z: integer-valued f32, any magnitude (saturated at +-16383 inside).
    Returns integer-valued f32 in [0, 4096]; monotone nondecreasing and
    exactly antisymmetric around z=0 (s(z) + s(-z) == 4096)."""
    neg = z < 0
    za = jnp.minimum(jnp.abs(z), np.float32(Z_SAT))
    i = _fdiv2(za, 10)                       # 0..15
    f = za - i * np.float32(1 << 10)         # 0..1023
    # e^-f: Q14-internal Horner (poly strictly decreasing; f*p <= 2^24)
    p = jnp.full_like(za, np.float32(SIG_C[4]))
    for c in (SIG_C[3], SIG_C[2], SIG_C[1], SIG_C[0]):
        p = np.float32(c) - _fdiv2(f * p, 10)
    e = _fdiv2(p, 2)                         # Q12
    # e^-i: conditional multiplies on the bits of i (no gather)
    ib = i
    for b in range(4):
        half = _fdiv2(ib, 1)
        odd = ib - half * np.float32(2)
        e = jnp.where(odd > 0, _fdiv2(e * np.float32(SIG_CB[b]), 12), e)
        ib = half
    # sp = floor(2^24 / (4096 + e)) with exact correction: XLA's f32
    # divide may not be correctly rounded on every backend, so fix the
    # floor with an exact remainder (d split keeps q*d products exact)
    d = np.float32(1 << 12) + e              # 4096..8192
    q = jnp.floor(np.float32(1 << 24) / d)
    d_hi = _fdiv2(d, 6)
    d_lo = d - d_hi * np.float32(1 << 6)
    for _ in range(2):                       # covers +-2 of divide error
        r = (np.float32(1 << 24) - q * d_hi * np.float32(1 << 6)) \
            - q * d_lo
        q = q + (r >= d).astype(_F) - (r < 0).astype(_F)
    return jnp.where(neg, np.float32(1 << 12) - q, q)


def mixture_cdf_q14(p_q: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """CDF in Q14 from per-component z values, lane-major.

    p_q: (K, n) Q12 weights; z: (K, E, n) Q10 integer-f32 -> (E, n).
    Per-term products p*sig <= 2^24 stay exact; the per-term >>10 keeps
    every partial sum exact too (<= K * 2^14 <= 2^18) — so the
    accumulation order is irrelevant to the result."""
    sg = int_sigmoid(z)                              # (K, E, n) Q12
    terms = _fdiv2(p_q[:, None, :] * sg, 10)         # Q14 per term
    K = terms.shape[0]
    acc = terms[0]
    for k in range(1, K):
        acc = acc + terms[k]
    return jnp.clip(acc, np.float32(0), np.float32(C_ONE))


def quantize_edges(c_q14: jnp.ndarray, l_idx: jnp.ndarray, L: int
                   ) -> jnp.ndarray:
    """Q(l) per the +2l table spec, exact-int f32 in [0, 65536].

    c*M is split so every product stays within 24 significand bits;
    the two floors sum to a monotone function of c (not exactly
    floor(c*M/2^14), but BOTH sides compute this same function)."""
    M = 65536 - 2 * L
    m_hi, m_lo = M >> 7, M & 127
    q = (_fdiv2(c_q14 * np.float32(m_hi), 7)
         + _fdiv2(c_q14 * np.float32(m_lo), 14)
         + np.float32(2) * l_idx)
    q = jnp.where(l_idx <= 0, np.float32(0), q)
    return jnp.where(l_idx >= L, np.float32(65536), q)


def _floor_div(a: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(a / d) for integer-valued f32, 0 <= a < 2^28 with
    <= 24 significand bits, 1 <= d <= 2^14. Split-d remainder keeps
    every product exact; two correction rounds cover a non-correctly-
    rounded backend divide."""
    q = jnp.floor(a / d)
    d_hi = _fdiv2(d, 7)
    d_lo = d - d_hi * np.float32(1 << 7)
    for _ in range(2):
        r = (a - q * d_hi * np.float32(1 << 7)) - q * d_lo
        q = q + (r >= d).astype(_F) - (r < 0).astype(_F)
    return q


# ------------------------------------------------------- packed params


class IntParams(NamedTuple):
    """Per-scale coder parameters as exact-integer f32 arrays.

    Produced INSIDE the shared get_P program (the only float->int
    boundary); every downstream use is exact-integer f32 math.
    LANE-MAJOR: shapes (C, K', n) with n = N*H*W minor and
    K' = topk or K. w is (3, K', n) for the RGB scale's lambda chain,
    else None.
    """
    p: jnp.ndarray     # pi Q12
    a: jnp.ndarray     # a_hat Q10        (fine/bn edge step)
    sc: jnp.ndarray    # 16 * a_hat Q10   (RGB coarse edge step)
    v: jnp.ndarray     # m_hat * a_hat Q10
    w: Optional[jnp.ndarray]  # lam * a_hat Q10 (RGB) or None


def topk_rank(pi: jnp.ndarray) -> jnp.ndarray:
    """u8 descending rank of the mixture components along axis 1.

    One-pass RANK select, NOT lax.top_k (lowers to a full sort plus
    gathers) and NOT iterative argmax rounds (each round
    re-materializes the full (C, K, n) pool with a serializing K-wise
    cumsum; measured +24 ms on get_P[0] at the bench shape).
    rank_k = #components that beat k, ties to the lower index — K
    fused compare-accumulates over arrays whose minor axis is n, so
    the K^2 compares are tile-local and the whole select fuses into
    the surrounding elementwise pack. rank == r selects the same
    component as stable descending top-k for every input, including
    ties (tested against the numpy argsort oracle)."""
    K = pi.shape[1]
    k_iota = jnp.arange(K, dtype=jnp.float32)[None, :, None]
    rank = jnp.zeros_like(pi)
    for j in range(K):
        pj = jax.lax.slice_in_dim(pi, j, j + 1, axis=1)
        rank = rank + jnp.where(
            pi == pj, (np.float32(j) < k_iota).astype(pi.dtype),
            (pj > pi).astype(pi.dtype))
    # Materialize rank ONCE as u8 (K <= 255) behind a fusion barrier:
    # without it XLA's loop-fusion re-derives the whole K-pass rank
    # accumulation inside EVERY masked-sum consumer (4 groups x topk
    # stack entries), turning one O(K^2 n) pass into ~16 — measured
    # +24.5 ms on get_P[0] at the bench shape. A 60 MB u8 spill is
    # ~0.1 ms of HBM traffic; mask compares against it are free.
    return jax.lax.optimization_barrier(rank.astype(jnp.uint8))


def topk_masks(pi: jnp.ndarray, topk: int) -> list:
    """One-hot masks of the top-`topk` mixture components along axis 1.

    pi: (C, K, n). Returns `topk` disjoint (C, K, n) bool masks, each
    selecting exactly one component per (c, pixel)."""
    rank = topk_rank(pi)
    return [rank == np.uint8(r) for r in range(topk)]


def sel_kmajor(x: jnp.ndarray, rank: jnp.ndarray, topk: int
               ) -> jnp.ndarray:
    """Rank-select as ONE streaming pass over x: route each (c, k, n)
    element to its rank slot while it is in registers, instead of
    re-reading the whole (C, K, n) tensor once per rank (the stacked
    masked-sum form makes each of the `topk` sums an independent
    reduce, so x is streamed from HBM topk times per group).

    BITWISE equal to the stacked form by construction: per (c, pixel,
    r) exactly one k contributes a nonzero term and float adds of +-0
    to an accumulator are exact, so both forms produce the selected
    value itself (pinned by tests/test_int_coder.py against the
    stacked oracle).

    x: (C, K, n); rank: u8 (C, K, n). Returns (C, topk, n)."""
    K = x.shape[1]
    acc = [jnp.zeros_like(x[:, 0]) for _ in range(topk)]
    for k in range(K):
        xk = x[:, k]
        rk = rank[:, k]
        for r in range(topk):
            acc[r] = acc[r] + xk * (rk == np.uint8(r)).astype(x.dtype)
    return jnp.stack(acc, axis=1)


def pack_int_params(spec: dmll_mod.DMLLSpec, l: jnp.ndarray, C: int,
                    topk: int = 0) -> IntParams:
    """Float mixture params -> IntParams. MUST run inside the shared
    per-scale get_P program: the float softmax/exp/top_k here are the
    single float stage of the v8 coder; everything after is
    program-shape-independent integer math.

    SEMANTIC SOURCE: the float-boundary definitions (softmax over the
    K axis, LOG_SCALES_MIN clamp on log-scales, sigmoid on the lambda
    slots) are dmll.pack_coder_params's — both branches below must
    keep matching it exactly or coded distributions silently change;
    tests/test_numerics.py pins the equivalence against the model-side
    definition.

    Lane-major: each param group's (N,H,W,C,K) slice of `l` is
    transposed to (C, K, n); every reduction (softmax, top-k
    selection) runs over the leading K axis as K slices of fully-tiled
    (n,) work. Per-group slice transposes measured ~17% cheaper than
    one whole-l transpose (tools/pack_probe.py)."""
    lr = dmll_mod._reshape_l(spec, l, C)           # (N,H,W,P,C,K)
    N, H, W, P, _, K = lr.shape
    n = N * H * W

    def tp(i):
        return lr[..., i, :, :].astype(jnp.float32)\
            .transpose(3, 4, 0, 1, 2).reshape(C, K, n)

    if topk and K > topk:
        # Select BEFORE the transcendentals: softmax is strictly
        # monotone per pixel, so ranking the raw pi LOGITS picks the
        # same components as ranking softmax probs — and then the
        # softmax/exp/sigmoid all run on K'=topk components instead
        # of K. Renormalized top-k probs = softmax over the selected
        # logits directly.
        pl = tp(0)                                 # pi logits (C, K, n)
        # L3C_TOPK_SEL: stacked masked-sums (stack) vs one streaming
        # k-major pass (kmajor) — bitwise-identical outputs (tested);
        # pick by measured device time (tools/topk_probe.py).
        kmajor = os.environ.get("L3C_TOPK_SEL", "kmajor") == "kmajor"
        rank = topk_rank(pl)
        ohs = [rank == np.uint8(r) for r in range(topk)]

        def sel(x):
            # x (C, K, n) -> (C, topk, n); selected value rides a sum
            # of zeros either way, exact
            if kmajor:
                return sel_kmajor(x, rank, topk)
            return jnp.stack(
                [jnp.sum(x * m.astype(x.dtype), axis=1)
                 for m in ohs], axis=1)

        pi = jax.nn.softmax(sel(pl), axis=1)
        mu = sel(tp(1))
        inv_s = jnp.exp(-jnp.maximum(sel(tp(2)), np.float32(
            dmll_mod.LOG_SCALES_MIN)))
        lam = None
        if spec.rgb_scale:
            # lam slot j conditions TARGET channel (1, 2, 2): each slot
            # follows its target channel's component selection
            ll = tp(3)
            if kmajor:
                lam_sel = sel_kmajor(
                    ll, jnp.stack([rank[1], rank[2], rank[2]], axis=0),
                    topk)
            else:
                lam_sel = jnp.stack(
                    [jnp.stack([jnp.sum(ll[j] * oh[t].astype(ll.dtype),
                                        axis=0) for oh in ohs], axis=0)
                     for j, t in enumerate((1, 2, 2))], axis=0)
            lam = jax.nn.sigmoid(lam_sel)
    else:
        pi = jax.nn.softmax(tp(0), axis=1)         # (C, K, n)
        mu = tp(1)
        inv_s = jnp.exp(-jnp.maximum(tp(2), np.float32(
            dmll_mod.LOG_SCALES_MIN)))
        lam = jax.nn.sigmoid(tp(3)) if spec.rgb_scale else None
    bw = np.float32(spec.bin_width)
    t0 = np.float32(spec.x_min - spec.bin_width / 2.0)
    a_hat = jnp.clip(inv_s * bw, np.float32(A_MIN), np.float32(A_MAX))
    m_hat = (mu - t0) / bw
    p_q = jnp.round(pi * np.float32(PI_Q))
    a_q = jnp.round(a_hat * np.float32(1 << ZF))
    sc_q = jnp.round(a_hat * np.float32(16 << ZF))
    v_q = jnp.clip(jnp.round(m_hat * a_hat * np.float32(1 << ZF)),
                   np.float32(-V_CLAMP), np.float32(V_CLAMP))
    w_q = None
    if lam is not None:
        # w slot j = lam_j * a_hat(target channel j) so that
        # v'_q = v_q + w_q * sym matches z = e * a_q(target) - v'_q
        # (lambda conditioning divided by bin_width folds into a_hat
        # because the symbol VALUE for RGB equals the symbol index)
        tgt = jnp.stack([a_hat[1], a_hat[2], a_hat[2]], axis=0)
        w_q = jnp.round(lam * tgt * np.float32(1 << ZF))
    return IntParams(p=p_q, a=a_q, sc=sc_q, v=v_q, w=w_q)


def apply_lambda_chain(v: jnp.ndarray, c: int,
                       w_slots: Tuple[jnp.ndarray, ...],
                       dec_syms: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """v' = clip(v + sum_j w_j * sym_j) for RGB channel c — THE single
    expression of the lambda chain, shared by every caller so all
    sides produce bit-identical f32 exact integers. v, w_slots are
    (K', n); dec_syms are the already-known channel SYMBOL arrays
    (exact ints 0..255), each (n,)."""
    if c == 1:
        v = v + w_slots[0] * dec_syms[0].astype(_F)[None, :]
    elif c == 2:
        v = (v + w_slots[1] * dec_syms[0].astype(_F)[None, :]
             + w_slots[2] * dec_syms[1].astype(_F)[None, :])
    else:
        return v
    return jnp.clip(v, np.float32(-V_CLAMP), np.float32(V_CLAMP))


def channel_int_params(ip: IntParams, c: int,
                       dec_syms: Optional[Tuple[jnp.ndarray, ...]] = None
                       ) -> Tuple[jnp.ndarray, ...]:
    """(K', n) params for channel c, with the RGB lambda chain applied
    on SYMBOLS (exact ints 0..255): v' = v + w_j * sym_j.

    dec_syms: tuple of already-known channel symbol arrays, each (n,)
    int (decoded on the decode side, targets on the encode side)."""
    p, a, sc, v = ip.p[c], ip.a[c], ip.sc[c], ip.v[c]
    if ip.w is not None and c > 0 and dec_syms is not None:
        v = apply_lambda_chain(
            v, c, (ip.w[0], ip.w[1], ip.w[2]),
            tuple(s.reshape(-1) for s in dec_syms))
    return p, a, sc, v


def _edges2(e) -> jnp.ndarray:
    """Edge spec -> (E, n)-broadcastable (E, 1) or (E, n) f32."""
    e = jnp.asarray(e, _F)
    return e if e.ndim == 2 else e[:, None]


def _cdf_one(p_q: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """CDF Q14 at ONE edge: p_q (K, n), z (K, n) clipped -> (n,).

    The 2-edge lookups evaluate each edge separately on fully-tiled
    (K, n) arrays: an (K, 2, n) batch would put E=2 in the sublane dim
    (2 of 8 used — 4x waste). Same exact-integer function as
    mixture_cdf_q14, so lookups still equal row entries bitwise."""
    sg = int_sigmoid(z)
    terms = _fdiv2(p_q * sg, 10)
    K = terms.shape[0]
    acc = terms[0]
    for k in range(1, K):
        acc = acc + terms[k]
    return jnp.clip(acc, np.float32(0), np.float32(C_ONE))


def _clip_z(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))


# ------------------------------------------------------ bn-scale tables


def bn_cdf_at_edges(p, a, v, e) -> jnp.ndarray:
    """CDF Q14 at integer edge indices e ((E,) iota or (E, n));
    params (K, n). Returns (E, n)."""
    z = _edges2(e)[None] * a[:, None, :] - v[:, None, :]
    z = jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    return mixture_cdf_q14(p, z)


def bn_rows(ip: IntParams, C: int, L: int) -> jnp.ndarray:
    """(L, C*n) uint16 decode rows for a bottleneck scale."""
    outs = []
    iota = jnp.arange(L, dtype=jnp.float32)
    for c in range(C):
        p, a, _, v = channel_int_params(ip, c)
        cd = bn_cdf_at_edges(p, a, v, iota)
        outs.append(quantize_edges(cd, iota[:, None], L))
    return jnp.concatenate(outs, axis=1).astype(jnp.uint16)


def bn_lookup(ip: IntParams, syms: jnp.ndarray, C: int, L: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known symbols — the 2-edge encode path.

    syms: (C, n) int32. Evaluates ONLY edges s and s+1 per symbol:
    O(2K) mixture evaluations instead of O(L*K)."""
    starts, freqs = [], []
    for c in range(C):
        p, a, _, v = channel_int_params(ip, c)
        s = syms[c].astype(_F)
        qs = [quantize_edges(
            _cdf_one(p, _clip_z(e[None, :] * a - v)), e, L)
            for e in (s, s + np.float32(1))]
        starts.append(qs[0])
        freqs.append(qs[1] - qs[0])
    start = jnp.stack(starts).astype(jnp.uint32)
    freq = jnp.stack(freqs).astype(jnp.uint32)
    return start, freq


# ----------------------------------------------- RGB two-level tables


N_COARSE = 16
FINE = 16


def _coarse_cdf(p, a_sc, v, e_coarse) -> jnp.ndarray:
    """CDF Q14 at coarse edges e ((E,) or (E, n)) in COARSE units
    (0..16): z = e * sc_q - v. Returns (E, n)."""
    z = _edges2(e_coarse)[None] * a_sc[:, None, :] - v[:, None, :]
    z = jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    return mixture_cdf_q14(p, z)


def rgb_coarse_rows(ip: IntParams, c: int,
                    dec_syms: Optional[Tuple[jnp.ndarray, ...]]
                    ) -> jnp.ndarray:
    """(16, n) uint16 coarse rows for RGB channel c."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    iota = jnp.arange(N_COARSE, dtype=jnp.float32)
    cd = _coarse_cdf(p, sc, v, iota)
    return quantize_edges(cd, iota[:, None],
                          N_COARSE).astype(jnp.uint16)


def rgb_coarse_lookup(ip: IntParams, c: int,
                      dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                      a_sym: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known coarse symbols a_sym (n,)."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    af = a_sym.reshape(-1).astype(_F)
    qs = [quantize_edges(
        _cdf_one(p, _clip_z(e[None, :] * sc - v)), e, N_COARSE)
        for e in (af, af + np.float32(1))]
    return qs[0].astype(jnp.uint32), (qs[1] - qs[0]).astype(jnp.uint32)


def _cond_bounds(af, c_lo, c_hi):
    """Tail-absorbed conditional bounds (lo, denominator) — THE single
    expression shared by the decode-row side (_fine_cond_q14) and the
    encode-lookup side (rgb_fine_lookup). The two sides must stay
    bitwise in sync or files silently corrupt across the enc/dec
    boundary, so the lo/hi absorption and the denominator clamp live
    here and nowhere else (apply_lambda_chain's pattern)."""
    lo = jnp.where(af == 0, np.float32(0), c_lo)
    hi = jnp.where(af == N_COARSE - 1, np.float32(C_ONE), c_hi)
    return lo, jnp.maximum(hi - lo, np.float32(1))


def _cond_norm(c_e, lo, d) -> jnp.ndarray:
    """Conditional renormalization floor((c_e - lo) * C_ONE / d) in
    exact integers — the other half of the shared enc/dec contract."""
    num = jnp.maximum(c_e - lo, np.float32(0)) * np.float32(C_ONE)
    return jnp.clip(_floor_div(num, d), np.float32(0),
                    np.float32(C_ONE))


def _fine_cond_q14(p, a, sc, v, a_sym, e_fine) -> jnp.ndarray:
    """Conditional CDF Q14 at fine edges e_fine ((E,) or (E, n)) given
    coarse symbols a_sym (n,). z_b = z_a + b * a_q keeps the quantized-
    slope error independent of the absolute edge index. Tail
    absorption: first/last coarse bin open toward -inf/+inf.
    Returns (E, n)."""
    af = a_sym.astype(_F)[None, :]                          # (1, n)
    z_a = af * sc - v                                       # (K, n)
    b_off = _edges2(e_fine)[None] * a[:, None, :]           # (K, E, n)
    clip = lambda z: jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    c_e = mixture_cdf_q14(p, clip(z_a[:, None, :] + b_off))  # (E, n)
    c_lo = mixture_cdf_q14(p, clip(z_a)[:, None, :])         # (1, n)
    c_hi = mixture_cdf_q14(
        p, clip(z_a + np.float32(FINE) * a)[:, None, :])     # (1, n)
    lo, d = _cond_bounds(af, c_lo, c_hi)
    return _cond_norm(c_e, lo, d)


def rgb_fine_rows(ip: IntParams, c: int,
                  dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                  a_sym: jnp.ndarray) -> jnp.ndarray:
    """(16, n) uint16 fine rows conditional on coarse symbols."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    iota = jnp.arange(FINE, dtype=jnp.float32)
    cond = _fine_cond_q14(p, a, sc, v, a_sym.reshape(-1), iota)
    return quantize_edges(cond, iota[:, None], FINE).astype(jnp.uint16)


def rgb_fine_lookup(ip: IntParams, c: int,
                    dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                    a_sym: jnp.ndarray, b_sym: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known (coarse, fine) symbol pairs.

    Per-edge (K, n) evaluation (see _cdf_one); the conditional's
    lo/hi/denominator and normalization are the SHARED expressions
    _cond_bounds/_cond_norm, so they cannot drift from the decode-row
    side (_fine_cond_q14)."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    af = a_sym.reshape(-1).astype(_F)
    bf = b_sym.reshape(-1).astype(_F)
    z_a = af[None, :] * sc - v                               # (K, n)
    c_lo = _cdf_one(p, _clip_z(z_a))
    c_hi = _cdf_one(p, _clip_z(z_a + np.float32(FINE) * a))
    lo, d = _cond_bounds(af, c_lo, c_hi)                     # (n,)
    qs = []
    for e in (bf, bf + np.float32(1)):
        c_e = _cdf_one(p, _clip_z(z_a + e[None, :] * a))
        qs.append(quantize_edges(_cond_norm(c_e, lo, d), e, FINE))
    return qs[0].astype(jnp.uint32), (qs[1] - qs[0]).astype(jnp.uint32)
