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
    """CDF in Q14 from per-component z values.

    p_q: (..., K) Q12 weights; z: (..., K, E) Q10 integer-f32.
    Per-term products p*sig <= 2^24 stay exact; the per-term >>10 keeps
    every partial sum exact too (<= K * 2^14 <= 2^18)."""
    sg = int_sigmoid(z)                              # (..., K, E) Q12
    terms = _fdiv2(p_q[..., None] * sg, 10)          # Q14 per term
    K = terms.shape[-2]
    acc = terms[..., 0, :]
    for k in range(1, K):
        acc = acc + terms[..., k, :]
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
    Shapes: (N, H, W, C, K') with K' = topk or K.
    w is (N, H, W, 3, K') for the RGB scale's lambda chain, else None.
    """
    p: jnp.ndarray     # pi Q12
    a: jnp.ndarray     # a_hat Q10        (fine/bn edge step)
    sc: jnp.ndarray    # 16 * a_hat Q10   (RGB coarse edge step)
    v: jnp.ndarray     # m_hat * a_hat Q10
    w: Optional[jnp.ndarray]  # lam * a_hat Q10 (RGB) or None


def pack_int_params(spec: dmll_mod.DMLLSpec, l: jnp.ndarray, C: int,
                    topk: int = 0) -> IntParams:
    """Float mixture params -> IntParams. MUST run inside the shared
    per-scale get_P program: the float softmax/exp/top_k here are the
    single float stage of the v8 coder; everything after is
    program-shape-independent integer math."""
    pi, mu, inv_s, lam = dmll_mod.pack_coder_params(spec, l, C)
    K = pi.shape[-1]
    if topk and K > topk:
        # Iterative one-hot argmax, NOT lax.top_k: top_k lowers to a
        # full sort plus gathers whose (…, C, K)-minor layouts pad
        # 17-68x on TPU (measured 38 GB HBM for the bench-shape get_P,
        # an OOM); k rounds of max + first-match one-hot + masked sum
        # fuse into the surrounding elementwise work instead. Ties
        # break to the lowest index, same as stable top_k.
        ohs = []
        avail = pi                       # softmax probs, all >= 0
        for _ in range(topk):
            m = jnp.max(avail, axis=-1, keepdims=True)
            oh = jnp.logical_and(avail >= m,
                                 jnp.cumsum((avail >= m).astype(
                                     jnp.int32), axis=-1) == 1)
            ohs.append(oh)
            avail = jnp.where(oh, np.float32(-1.0), avail)

        def sel(x, masks):
            return jnp.stack(
                [jnp.sum(x * m.astype(x.dtype), axis=-1)
                 for m in masks], axis=-1)

        top_pi = sel(pi, ohs)
        pi = top_pi / jnp.sum(top_pi, axis=-1, keepdims=True)
        mu = sel(mu, ohs)
        inv_s = sel(inv_s, ohs)
        if lam is not None:
            # lam slot j conditions TARGET channel (1, 2, 2): each slot
            # follows its target channel's component selection
            lam = jnp.stack(
                [sel(lam[..., j, :], [oh[..., t, :] for oh in ohs])
                 for j, t in enumerate((1, 2, 2))], axis=-2)
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
        tgt = jnp.stack([a_hat[..., 1, :], a_hat[..., 2, :],
                         a_hat[..., 2, :]], axis=-2)
        w_q = jnp.round(lam * tgt * np.float32(1 << ZF))
    return IntParams(p=p_q, a=a_q, sc=sc_q, v=v_q, w=w_q)


def apply_lambda_chain(v: jnp.ndarray, c: int,
                       w_slots: Tuple[jnp.ndarray, ...],
                       dec_syms: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """v' = clip(v + sum_j w_j * sym_j) for RGB channel c — THE single
    expression of the lambda chain, shared by channel_int_params (full-
    image) and the fused decode scan (per-step) so both sides produce
    bit-identical f32 exact integers. w_slots are the (..., K) lambda
    params for slots (0: c1<-c0, 1: c2<-c0, 2: c2<-c1); dec_syms are
    the already-known channel SYMBOL arrays (exact ints 0..255)."""
    if c == 1:
        v = v + w_slots[0] * dec_syms[0].astype(_F)[..., None]
    elif c == 2:
        v = (v + w_slots[1] * dec_syms[0].astype(_F)[..., None]
             + w_slots[2] * dec_syms[1].astype(_F)[..., None])
    else:
        return v
    return jnp.clip(v, np.float32(-V_CLAMP), np.float32(V_CLAMP))


def channel_int_params(ip: IntParams, c: int,
                       dec_syms: Optional[Tuple[jnp.ndarray, ...]] = None
                       ) -> Tuple[jnp.ndarray, ...]:
    """Flattened (n, K) params for channel c, with the RGB lambda chain
    applied on SYMBOLS (exact ints 0..255): v' = v + w_j * sym_j.

    dec_syms: tuple of already-known channel symbol arrays, each (n,)
    int (decoded on the decode side, targets on the encode side)."""
    def flat(x):
        xc = x[..., c, :]
        return xc.reshape(-1, xc.shape[-1])
    p, a, sc, v = flat(ip.p), flat(ip.a), flat(ip.sc), flat(ip.v)
    if ip.w is not None and c > 0 and dec_syms is not None:
        def wflat(j):
            wj = ip.w[..., j, :]
            return wj.reshape(-1, wj.shape[-1])
        v = apply_lambda_chain(
            v, c, (wflat(0), wflat(1), wflat(2)),
            tuple(s.reshape(-1) for s in dec_syms))
    return p, a, sc, v


# ------------------------------------------------------ bn-scale tables


def bn_cdf_at_edges(p, a, v, e) -> jnp.ndarray:
    """CDF Q14 at integer edge indices e (n, E); params (n, K)."""
    z = e[:, None, :] * a[..., None] - v[..., None]
    z = jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    return mixture_cdf_q14(p, z)


def bn_rows(ip: IntParams, C: int, L: int) -> jnp.ndarray:
    """(C*n, L) uint16 decode rows for a bottleneck scale."""
    outs = []
    iota = jnp.arange(L, dtype=jnp.float32)[None]
    l_idx = jnp.arange(L, dtype=jnp.float32)
    for c in range(C):
        p, a, _, v = channel_int_params(ip, c)
        cd = bn_cdf_at_edges(p, a, v, jnp.broadcast_to(iota,
                                                       (p.shape[0], L)))
        outs.append(quantize_edges(cd, l_idx, L))
    return jnp.concatenate(outs, axis=0).astype(jnp.uint16)


def bn_lookup(ip: IntParams, syms: jnp.ndarray, C: int, L: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known symbols — the 2-edge encode path.

    syms: (C, n) int32. Evaluates ONLY edges s and s+1 per symbol:
    O(2K) mixture evaluations instead of O(L*K)."""
    starts, freqs = [], []
    for c in range(C):
        p, a, _, v = channel_int_params(ip, c)
        s = syms[c].astype(_F)
        e = jnp.stack([s, s + np.float32(1)], axis=-1)     # (n, 2)
        cd = bn_cdf_at_edges(p, a, v, e)
        q = quantize_edges(cd, e, L)
        starts.append(q[:, 0])
        freqs.append(q[:, 1] - q[:, 0])
    start = jnp.stack(starts).astype(jnp.uint32)
    freq = jnp.stack(freqs).astype(jnp.uint32)
    return start, freq


# ----------------------------------------------- RGB two-level tables


N_COARSE = 16
FINE = 16


def _coarse_cdf(p, a_sc, v, e_coarse) -> jnp.ndarray:
    """CDF Q14 at coarse edges e (n, E) in COARSE units (0..16):
    z = e * sc_q - v."""
    z = e_coarse[:, None, :] * a_sc[..., None] - v[..., None]
    z = jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    return mixture_cdf_q14(p, z)


def rgb_coarse_rows(ip: IntParams, c: int,
                    dec_syms: Optional[Tuple[jnp.ndarray, ...]]
                    ) -> jnp.ndarray:
    """(n, 16) uint16 coarse rows for RGB channel c."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    n = p.shape[0]
    iota = jnp.broadcast_to(
        jnp.arange(N_COARSE, dtype=jnp.float32)[None], (n, N_COARSE))
    cd = _coarse_cdf(p, sc, v, iota)
    return quantize_edges(cd, jnp.arange(N_COARSE, dtype=jnp.float32),
                          N_COARSE).astype(jnp.uint16)


def rgb_coarse_lookup(ip: IntParams, c: int,
                      dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                      a_sym: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known coarse symbols a_sym (n,)."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    af = a_sym.astype(_F)
    e = jnp.stack([af, af + np.float32(1)], axis=-1)
    cd = _coarse_cdf(p, sc, v, e)
    q = quantize_edges(cd, e, N_COARSE)
    return (q[:, 0].astype(jnp.uint32),
            (q[:, 1] - q[:, 0]).astype(jnp.uint32))


def _fine_cond_q14(p, a, sc, v, a_sym, e_fine) -> jnp.ndarray:
    """Conditional CDF Q14 at fine edges e_fine (n, E) given coarse
    symbols a_sym (n,). z_b = z_a + b * a_q keeps the quantized-slope
    error independent of the absolute edge index. Tail absorption:
    first/last coarse bin open toward -inf/+inf."""
    af = a_sym.astype(_F)[:, None]
    z_a = af[..., None, :] * sc[..., None] - v[..., None]   # (n, K, 1)
    b_off = e_fine[:, None, :] * a[..., None]               # (n, K, E)
    clip = lambda z: jnp.clip(z, np.float32(-Z_SAT), np.float32(Z_SAT))
    c_e = mixture_cdf_q14(p, clip(z_a + b_off))
    c_lo = mixture_cdf_q14(p, clip(z_a))[:, 0:1]
    c_hi = mixture_cdf_q14(
        p, clip(z_a + np.float32(FINE) * a[..., None]))[:, 0:1]
    lo = jnp.where(af == 0, np.float32(0), c_lo)
    hi = jnp.where(af == N_COARSE - 1, np.float32(C_ONE), c_hi)
    d = jnp.maximum(hi - lo, np.float32(1))
    num = jnp.maximum(c_e - lo, np.float32(0)) * np.float32(C_ONE)
    return jnp.clip(_floor_div(num, d), np.float32(0),
                    np.float32(C_ONE))


def rgb_fine_rows(ip: IntParams, c: int,
                  dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                  a_sym: jnp.ndarray) -> jnp.ndarray:
    """(n, 16) uint16 fine rows conditional on coarse symbols."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    n = p.shape[0]
    iota = jnp.broadcast_to(
        jnp.arange(FINE, dtype=jnp.float32)[None], (n, FINE))
    cond = _fine_cond_q14(p, a, sc, v, a_sym.reshape(n), iota)
    return quantize_edges(cond, jnp.arange(FINE, dtype=jnp.float32),
                          FINE).astype(jnp.uint16)


def rgb_fine_lookup(ip: IntParams, c: int,
                    dec_syms: Optional[Tuple[jnp.ndarray, ...]],
                    a_sym: jnp.ndarray, b_sym: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known (coarse, fine) symbol pairs."""
    p, a, sc, v = channel_int_params(ip, c, dec_syms)
    n = p.shape[0]
    bf = b_sym.reshape(n).astype(_F)
    e = jnp.stack([bf, bf + np.float32(1)], axis=-1)
    cond = _fine_cond_q14(p, a, sc, v, a_sym.reshape(n), e)
    q = quantize_edges(cond, e, FINE)
    return (q[:, 0].astype(jnp.uint32),
            (q[:, 1] - q[:, 0]).astype(jnp.uint32))
