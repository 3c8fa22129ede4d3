"""Fully on-TPU rANS entropy codec: vectorized streams under lax.scan.

This is the TPU-native successor to both torchac backends: instead of
evaluating CDFs on the host (ops/coder.py, the portable CPU backend) or
shipping per-pixel CDF tables across the host link (the reference's CUDA
managed-memory design, torchac_kernel.cu:80-84), the ENTIRE entropy coder
runs on the TPU:

- Each channel's pixels are split into many independent rANS streams
  (T symbols each => hundreds-to-thousands of streams per scale). One
  lax.scan steps all streams in lockstep; every scan step is a wide VPU
  op across streams. Sequential-per-stream, parallel-across-streams.
  UNROLL symbols are coded per scan step so the scan's fixed per-step
  cost amortizes (T/UNROLL steps total).
- rANS32: uint32 state, 16-bit probabilities, 16-bit word renorm. At
  most one emitted/consumed word per symbol (state < 2^32 => one shift
  reaches < 2^16 <= freq<<16). All-integer => bit-exact by construction;
  no float determinism contract needed between encode and decode.
- Quantized CDF tables are computed on device (models.dmll params ->
  uint16 rows, fused by XLA) and NEVER leave HBM. Both
  the encoder's (start, freq) lookup and the decoder's searchsorted are
  vectorized compare/sum/min/max reductions — no gathers in hot loops.
- Channels of a scale are coded in ONE fused scan whenever dependencies
  allow (always on encode; on decode for all non-autoregressive scales).
  Streams are per-channel aligned so the RGB decode can still process
  channel slices sequentially for the lambda conditioning.
- Only the compressed words + per-stream lengths cross the host link.

Table spec (format v7): for L symbols, edge entries l = 0..L:
    Q(0) = 0                      (lower-tail absorption)
    Q(l) = floor( clip(C(t_l), 0, 1) * (65536 - 2L) ) + 2l,  0 < l < L
    Q(L) = 65536 implicit         (upper-tail absorption)
where C is `edge_cdf`, the shared mixture-CDF evaluator (fixed-order
accumulation, single-path sigmoid). The +2l slack makes every row
STRICTLY increasing without a cummax as long as the float evaluator is
monotone to within 1/(65536-2L) ~ 1.5e-5 between adjacent edges — far
looser than any real sigmoid wobble, and each edge depends only on its
own C(t_l) (no cross-edge coupling).

Determinism boundary (measured, round 3): the same float expression
evaluated in two DIFFERENTLY-FUSED programs can differ by 1 ulp and
flip floor() at a quantization boundary (~1e-3 of symbols on CPU XLA),
so encode and decode must obtain row values from the SAME standalone
jitted builder programs — a per-symbol 2-edge float lookup in a
separate program is NOT sound. The per-edge-independent spec still
pays: it needs no cummax, and it admits an exactly-reproducible
integer realization (any pure integer function of quantized params is
program-shape-independent by construction).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dmll as dmll_mod

# Stream geometry. T (symbols per rANS stream) trades sequential scan
# depth against per-stream framing overhead (~6 bytes each). Since
# format v5 the stream length is chosen PER UNIT by `t_policy` and
# recorded in each unit's header, so any build decodes any file; the
# policy knobs only steer what the encoder writes. UNROLL (symbols per
# scan step) only affects execution, not the format.
#   L3C_T_STREAM      force one fixed T for every unit (bench sweeps)
#   L3C_CODER_PROFILE speed|balanced|size — stream-count targets
T_STREAM = int(__import__("os").environ.get("L3C_T_STREAM", "1024"))
UNROLL = int(__import__("os").environ.get("L3C_UNROLL", "8"))
CODER_PROFILE = __import__("os").environ.get("L3C_CODER_PROFILE",
                                             "balanced")
_T_FORCED = "L3C_T_STREAM" in __import__("os").environ
# profile -> (max streams per channel, max T). Framing costs ~5 bytes
# per stream (u32 state + length field). Decode scan cost is LINEAR in
# T at fixed content (T x lanes x used-width, lanes ~ n/T, width ~ T),
# so `balanced` favors wall time (serving default) and `size` favors
# bits: on small/low-bpsp files 64 streams/channel measured +4-5% file
# overhead, which `size`'s longer streams cut to well under 1%. Eval
# paths (MultiscaleTester.write_to_files) default to `size` — bitrate
# headlines; bench/serving default to `balanced`.
_PROFILES = {"speed": (1 << 30, 1024), "balanced": (64, 2048),
             "size": (8, 16384)}


def t_policy(n: int, profile: Optional[str] = None) -> int:
    """Stream length for a unit of n symbols/channel: the smallest
    power-of-two T in [1024, max_T] that keeps ceil(n/T) streams per
    channel under the profile's target. Recorded per unit in the v5
    format, so files decode regardless of the writer's profile."""
    if _T_FORCED:
        return T_STREAM
    nsc_max, t_max = _PROFILES[profile or CODER_PROFILE]
    t = 1024
    while t < t_max and -(-n // t) > nsc_max:
        t *= 2
    return t


RANS_L = 1 << 16        # state lower bound
PROB_BITS = 16

# Optional: restrict the CODING distribution to the top-K mixture
# components per pixel (renormalized; same role as the host backend's
# PI_SKIP). Cuts the dominant table-build cost by K/CODER_TOPK on
# compute-bound deployments, at a bitrate cost that shrinks as the
# model converges (undertrained mixtures spread mass; measured +4% bpsp
# at 15k training steps, so DISABLED (0) by default).
CODER_TOPK = int(__import__("os").environ.get("L3C_CODER_TOPK", "0"))

# Encode word packer: "shift" = log-rotation stream compaction
# (default), "sort" = bitonic sort network over (pos, word) pairs (A/B
# baseline). Both are bit-identical packings; execution-only knob.
PACKER = __import__("os").environ.get("L3C_PACKER", "shift")

# Encode-scan division strategy: "float" = exact two-f32-division
# divmod (_divmod_by_freq; bit-identical by proof, far cheaper than the
# VPU's expanded u32 divide), "int" = hardware // and % (A/B baseline).
ENC_DIV = __import__("os").environ.get("L3C_ENC_DIV", "float")


class StreamLayout(NamedTuple):
    """Stream geometry for C channels of n symbols each (per-channel
    aligned: channel c owns stream rows [c*ns_c, (c+1)*ns_c))."""
    C: int
    n: int                # symbols per channel
    T: int

    @property
    def ns_c(self) -> int:
        return -(-self.n // self.T)

    @property
    def lanes(self) -> int:
        return self.C * self.ns_c

    @property
    def pad(self) -> int:
        return self.ns_c * self.T - self.n


def layout_for(n: int, C: int = 1, T: int = T_STREAM) -> StreamLayout:
    return StreamLayout(C=C, n=n, T=T)


def _to_streams(flat_cn: jnp.ndarray, lay: StreamLayout) -> jnp.ndarray:
    """(C, n) or (C*n,) -> (lanes, T) with per-channel zero padding."""
    x = flat_cn.reshape(lay.C, lay.n)
    x = jnp.pad(x, ((0, 0), (0, lay.pad)))
    return x.reshape(lay.lanes, lay.T)


def _from_streams(s: jnp.ndarray, lay: StreamLayout) -> jnp.ndarray:
    """(lanes, T) -> (C, n)."""
    return s.reshape(lay.C, lay.ns_c * lay.T)[:, : lay.n]


def _mask_for(lay: StreamLayout) -> np.ndarray:
    m = np.ones((lay.ns_c, lay.T), bool).reshape(-1)
    if lay.pad:
        m[-lay.pad:] = False
    m = np.broadcast_to(m.reshape(1, lay.ns_c, lay.T),
                        (lay.C, lay.ns_c, lay.T))
    return np.ascontiguousarray(m).reshape(lay.lanes, lay.T)


# --------------------------------------------------------------- tables


def edge_cdf(pi: jnp.ndarray, mu: jnp.ndarray, inv_s: jnp.ndarray,
             t: jnp.ndarray) -> jnp.ndarray:
    """Mixture CDF C(t) at edge targets t (..., E); params (..., K).

    The v7 float evaluator: fixed-order chained accumulation and
    jax.nn.sigmoid. NOTE it is only deterministic WITHIN one jitted
    program (or across dispatches of the same program at the same
    shapes): XLA's fusion-dependent codegen makes identical expression
    DAGs differ by 1 ulp across differently-shaped programs (measured;
    module docstring). Hence encode and decode share the builder
    PROGRAMS, not just this expression; the v7 file canary attests the
    build still lowers those programs identically.
    """
    K = pi.shape[-1]

    def term(k):
        z = (t - mu[..., k:k + 1]) * inv_s[..., k:k + 1]
        return pi[..., k:k + 1] * jax.nn.sigmoid(z)

    acc = term(0)
    for k in range(1, K):
        acc = acc + term(k)
    return acc


def edge_quantize(c: jnp.ndarray, l_idx: jnp.ndarray, L: int
                  ) -> jnp.ndarray:
    """v7 edge quantization: Q(l) for float CDF value c at edge l.

    l_idx int32 (data-dependent on encode, iota on decode). Returns
    int32 in [0, 65536]."""
    M = np.float32(65536 - 2 * L)
    q = (jnp.floor(jnp.clip(c, 0.0, 1.0) * M).astype(jnp.int32)
         + 2 * l_idx)
    q = jnp.where(l_idx <= 0, 0, q)
    return jnp.where(l_idx >= L, 65536, q)


def build_cdf_table(pi: jnp.ndarray, mu: jnp.ndarray, inv_s: jnp.ndarray,
                    x_min: float, bin_w: float, L: int) -> jnp.ndarray:
    """Quantized CDF rows from mixture params (decode side).

    pi, mu, inv_s: (..., K) float32 (pi softmaxed, inv_s=exp(-log_s)).
    Returns (..., L) uint16 rows per the v7 table spec. Stays in HBM;
    XLA fuses the (K x L) evaluation per pixel. (A hand-written Pallas
    alternative measured 2.5-4.5x slower than XLA's fusion on the real
    chip and is quarantined in tools/pallas_cdf.py.)
    """
    t = (jnp.arange(L, dtype=jnp.float32) * np.float32(bin_w)
         + np.float32(x_min - bin_w / 2.0))                  # (L,) edges
    c = edge_cdf(pi, mu, inv_s, t)                           # (..., L)
    return edge_quantize(c, jnp.arange(L, dtype=jnp.int32), L)\
        .astype(jnp.uint16)


def uniform_cdf_row(L: int) -> np.ndarray:
    """Closed-form uniform table (coarsest scale)."""
    l = np.arange(L, dtype=np.uint64)
    return ((l << 16) // L).astype(np.uint16)


def table_lookup_symbol(table: jnp.ndarray, syms: jnp.ndarray, L: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known symbols — compare-based, no gathers.

    table: (..., L) uint16, syms: (...,) int32. start = max over entries
    with index <= s; high = min over entries with index > s (or 65536).
    """
    row = table.astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)
    le = idx <= syms[..., None]
    start = jnp.max(jnp.where(le, row, 0), axis=-1)
    top = jnp.int32(65536)
    high = jnp.min(jnp.where(le, top, row), axis=-1)
    high = jnp.where(syms == L - 1, top, jnp.minimum(high, top))
    return start.astype(jnp.uint32), (high - start).astype(jnp.uint32)


# ------------------------------------------------------------- encoding


def _divmod_by_freq(x1: jnp.ndarray, fs: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (x1 // fs, x1 % fs) for the rANS encode step, computed with
    two f32 divisions instead of a u32 hardware division (which XLA
    expands into a long shift-subtract sequence on the VPU — the single
    most expensive op in the encode scan body).

    Exactness argument (all quantities are exact f32 values):
      inputs:  1 <= fs < 2^16;  x1 < fs * 2^16  (the rANS renorm
               invariant: either x1 < fs<<16 held pre-step, or x1 was
               just shifted to < 2^16 <= fs<<16).
      split    x1 = hi * 2^16 + lo,  hi < fs (from the invariant),
               lo < 2^16. hi and fs are integers < 2^16 => exact f32;
               hi * 65536f is a power-of-two scale => exact f32.
      step 1   q2 = floor(fl(hi*2^16 / fs)). True quotient < 2^16 (as
               hi < fs), so q2's magnitude keeps f32 ulp <= 2^-7: even
               a several-ulp division error is < 1/64 absolute, so
               floor is off by AT MOST 1 either way. The integer fixup
               below (remainder computed exactly in u32) corrects +-1.
      step 2   r2 = hi*2^16 - q2*fs < fs, num = r2 + lo < 2^17, exact
               f32; q3 = floor(fl(num / fs)) with true quotient < 2^17
               => same <=+-1 floor error, same exact fixup.
      result   x1 // fs = q2 + q3,  x1 % fs = num - q3*fs.
    A wrapped (negative) u32 remainder after an overestimated quotient
    is detected via r >= 2^31 (legit remainders are < 2^16).
    Masked-off lanes (padding, fs pinned to 1) may violate the
    invariant; their outputs are finite garbage and discarded by the
    caller's `where`. Verified exhaustively against numpy divmod in
    tests/test_codec2.py (adversarial boundaries + random sweep).
    """
    big = jnp.uint32(0x80000000)
    hi_sc = x1 & jnp.uint32(0xFFFF0000)          # hi * 2^16, exact
    lo = x1 & jnp.uint32(0xFFFF)
    fsf = fs.astype(jnp.float32)
    q2 = jnp.floor((x1 >> 16).astype(jnp.float32) * jnp.float32(65536.0)
                   / fsf).astype(jnp.uint32)
    r2 = hi_sc - q2 * fs                          # may wrap if q2 high
    over = r2 >= big
    q2 = jnp.where(over, q2 - 1, q2)
    r2 = jnp.where(over, r2 + fs, r2)
    under = r2 >= fs
    q2 = jnp.where(under, q2 + 1, q2)
    r2 = jnp.where(under, r2 - fs, r2)
    num = r2 + lo                                 # < 2^17
    q3 = jnp.floor(num.astype(jnp.float32) / fsf).astype(jnp.uint32)
    r3 = num - q3 * fs
    over = r3 >= big
    q3 = jnp.where(over, q3 - 1, q3)
    r3 = jnp.where(over, r3 + fs, r3)
    under = r3 >= fs
    q3 = jnp.where(under, q3 + 1, q3)
    r3 = jnp.where(under, r3 - fs, r3)
    return q2 + q3, r3


def rans_encode(start: jnp.ndarray, freq: jnp.ndarray,
                mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (NS, T) u32 (start, freq) pairs into rANS streams.

    mask: (NS, T) bool — False slots are skipped (tail padding).
    Returns (words (NS, T+2) uint16, lengths (NS,) int32 in words).
    Words are already in DECODE order: [state_lo, state_hi, renorm words].
    """
    ns, T = start.shape
    n_steps = T // UNROLL
    assert n_steps * UNROLL == T, (T, UNROLL)

    # rANS encodes in reverse symbol order; arrange (steps, U, NS)
    def arrange(a):
        return a[:, ::-1].T.reshape(n_steps, UNROLL, ns)

    xs = (arrange(start), arrange(freq), arrange(mask))

    def step(x, xs_t):
        st_u, f_u, m_u = xs_t
        emits = []
        words = []
        for u in range(UNROLL):
            st, f, m = st_u[u], f_u[u], m_u[u]
            emit = jnp.logical_and(m, x >= (f << 16))
            w = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
            x1 = jnp.where(emit, x >> 16, x)
            fs = jnp.maximum(f, 1)  # padded slots carry f=0
            if ENC_DIV == "int":      # hardware u32 divide (A/B only)
                q, r = x1 // fs, x1 % fs
            else:
                q, r = _divmod_by_freq(x1, fs)
            x2 = (q << 16) + r + st
            x = jnp.where(m, x2, x)
            emits.append(emit)
            words.append(w)
        return x, (jnp.stack(emits), jnp.stack(words))

    x0 = jnp.full((ns,), RANS_L, jnp.uint32)
    xf, (emits, words) = jax.lax.scan(step, x0, xs)
    # (steps, U, NS) -> (NS, T) chronological (reversed-symbol) order
    emits = emits.reshape(T, ns).T
    words = words.reshape(T, ns).T
    n_emit = jnp.sum(emits, axis=1).astype(jnp.int32)       # (NS,)
    # Pack emitted words into decode order: the word emitted at chrono
    # position t lands at stream index n_emit - cum_t, i.e. reading the
    # emitted words in REVERSE chrono order compacts them to the front.
    # A per-lane variable-position write is a scatter (slow serial unit
    # on TPU); two scatter-free packers:
    #   sort    — bitonic network over (pos, word) pairs, O(T log^2 T)
    #             compare/selects (the original v5 packer)
    #   shift   — log2(T) passes of static-rotation compaction (default;
    #             O(T log T) selects, ~4x less element work; proof at
    #             _compact_left)
    if PACKER == "sort":
        cum = jnp.cumsum(emits.astype(jnp.int32), axis=1)   # inclusive
        pos = jnp.where(emits, n_emit[:, None] - cum, T + 1)
        _, packed = jax.lax.sort(
            (pos, words.astype(jnp.int32)), dimension=1, num_keys=1)
    else:
        packed = _compact_left(words[:, ::-1].astype(jnp.int32),
                               emits[:, ::-1])
    state = jnp.stack(
        [(xf & jnp.uint32(0xFFFF)).astype(jnp.uint16),
         (xf >> 16).astype(jnp.uint16)], axis=1)            # (NS, 2)
    out = jnp.concatenate([state, packed.astype(jnp.uint16)],
                          axis=1)
    return out[:, : T + 2], n_emit + 2


def _compact_left(a: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Stable left-compaction of kept elements along axis 1 without a
    sort or scatter: log2(T) passes of static rotations + selects.

    Element t's target is t - s_t where s_t = #dropped before t
    (exclusive cumsum of ~keep), non-decreasing in t. Shifts are applied
    bit by bit, LSB first; after pass k every kept element sits at
    t - (s_t mod 2^(k+1)).

    No-collision invariant: for kept t < u, the new positions differ by
    (u - t) - (s_u mod 2^(k+1) - s_t mod 2^(k+1)); since t is kept,
    s_u - s_t <= u - t - 1, and a wrapped mod difference only moves u
    further right — so kept elements never collide. A mover lands only
    on dropped/vacated slots (it overwrites them); a slot vacated with
    nothing incoming is killed (S := 0) so its stale copy can never
    move again. Slots past the kept count hold garbage; callers slice
    by the true per-lane lengths.
    """
    T = a.shape[1]
    col = jnp.arange(T, dtype=jnp.int32)[None, :]
    s = jnp.cumsum((~keep).astype(jnp.int32), axis=1) \
        - (~keep).astype(jnp.int32)                   # exclusive
    s = jnp.where(keep, s, 0)                          # dropped: inert
    k = 0
    while (1 << k) < T:
        step_ = 1 << k
        bit = (s >> k) & 1                             # mover this pass
        # arriving at i = mover at i + 2^k; mask the wraparound tail
        # with an iota compare (an .at[].set would lower to a scatter —
        # a slow serial unit on TPU)
        inc = jnp.where(col < T - step_,
                        jnp.roll(bit, -step_, axis=1), 0)
        a = jnp.where(inc == 1, jnp.roll(a, -step_, axis=1), a)
        s_in = jnp.roll(s, -step_, axis=1) - step_     # applied 2^k
        # vacated with nothing incoming -> dead (bit set, no arrival)
        s = jnp.where(inc == 1, s_in, jnp.where(bit == 1, 0, s))
        k += 1
    return a


# ------------------------------------------------------------- decoding


def _decode_symbol(x: jnp.ndarray, row: jnp.ndarray, win: jnp.ndarray,
                   loc: jnp.ndarray, m: jnp.ndarray, L: int,
                   w16_iota: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One rANS symbol decode for every lane: searchsorted the CDF row,
    advance the state, renorm from the 16-word window. THE single
    expression of the decode step, factored out so every decode path
    (channel-sequential or any future fused scan) stays bit-identical.

    x (NS,) u32 states; row (L, NS) int32 CDF edges (LANE-MAJOR: the
    searchsorted reductions run over the leading L axis as L slices of
    fully-tiled (NS,) work — the (NS, L) minor-L layout wasted 7/8 of
    every vector tile at L=16); win (NS, 16) i32 window words; loc
    (NS,) i32 position of each lane's next word in its window; m (NS,)
    bool active mask.
    Returns (s (NS,) i32 symbols, x' updated states, consumed (NS,) i32
    0/1 words consumed)."""
    top = jnp.int32(65536)
    cf = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
    le = row <= cf[None, :]
    s = jnp.maximum(jnp.sum(le.astype(jnp.int32), axis=0) - 1, 0)
    start = jnp.max(jnp.where(le, row, 0), axis=0)
    high = jnp.minimum(jnp.min(jnp.where(le, top, row), axis=0), top)
    high = jnp.where(s == L - 1, top, high)
    f = (high - start).astype(jnp.uint32)
    x1 = f * (x >> 16) + (x & jnp.uint32(0xFFFF)) \
        - start.astype(jnp.uint32)
    need = x1 < RANS_L
    w = jnp.max(jnp.where(w16_iota[None, :] == loc[:, None], win, 0),
                axis=1)
    x2 = jnp.where(need, (x1 << 16) | w.astype(jnp.uint32), x1)
    consumed = jnp.logical_and(m, need).astype(jnp.int32)
    return s, jnp.where(m, x2, x), consumed


def _window_fetch(words_ch: jnp.ndarray, ch_iota: jnp.ndarray,
                  cur: jnp.ndarray, n_wch: int) -> jnp.ndarray:
    """Fetch each lane's 8*n_wch-word window starting at its aligned
    chunk (one O(W) pass per scan step; see rans_decode)."""
    c0 = cur >> 3
    return jnp.concatenate(
        [jnp.sum(jnp.where(
            (ch_iota[None, :] == (c0 + j)[:, None])[..., None],
            words_ch, 0), axis=1) for j in range(n_wch)],
        axis=1)


def chunk_words(words: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray, int]:
    """(NS, W) u16 decode-order words -> the 8-word chunk layout the
    window fetch reads, plus its iotas (shared by rans_decode and the
    fused RGB scan)."""
    ns, W = words.shape
    n_wch = -(-(7 + UNROLL) // 8)          # window chunks (2 for U=8)
    n_ch = -(-W // 8) + n_wch              # chunk overrun slack
    words_ch = jnp.pad(words.astype(jnp.int32),
                       ((0, 0), (0, n_ch * 8 - W))
                       ).reshape(ns, n_ch, 8)
    ch_iota = jnp.arange(n_ch, dtype=jnp.int32)
    w16_iota = jnp.arange(8 * n_wch, dtype=jnp.int32)
    return words_ch, ch_iota, w16_iota, n_wch


def rans_decode(tables: jnp.ndarray, words: jnp.ndarray,
                mask_t: jnp.ndarray, L: int) -> jnp.ndarray:
    """Decode streams against per-position CDF rows.

    tables:   (L, NS, T) uint16 rows, LANE-MAJOR. They are relaid once
              to (steps, U, L, NS) and fed as scan xs, so each step's
              block is a contiguous leading-axis slice and every
              per-symbol row is a fully-tiled (L, NS) array (a minor-
              axis U or L dim would waste most of each 128-lane tile).
    words:    (NS, W) uint16 stream words (decode order)
    mask_t:   (steps, U, NS) bool
    Returns syms (NS, T) int32.
    """
    ns, W = words.shape
    n_steps = mask_t.shape[0]
    tbl = tables.reshape(L, ns, n_steps, UNROLL).transpose(2, 3, 0, 1)
    x0 = (words[:, 0].astype(jnp.uint32)
          | (words[:, 1].astype(jnp.uint32) << 16))
    cur0 = jnp.full((ns,), 2, jnp.int32)

    # Word reads are per-lane dynamic indices. A gather
    # (take_along_axis) on the (NS, W) array costs ~10 ns/element on
    # TPU (20x a one-hot select), and a per-SYMBOL one-hot select is
    # O(W) work per symbol — quadratic in stream length. Instead fetch
    # a 16-word WINDOW once per scan STEP: each lane consumes at most
    # UNROLL (<= 8) words per step, so the two 8-aligned chunks around
    # cur cover every read of the step. The window fetch is the only
    # O(W) pass (2 chunk one-hots); the per-symbol selects are one-hots
    # over 16 — ~8x less select work at UNROLL=8.
    words_ch, ch_iota, w16_iota, n_wch = chunk_words(words)

    def step(carry, xs_t):
        x, cur = carry
        rows_t, m_u = xs_t                                   # (U, L, NS)
        win = _window_fetch(words_ch, ch_iota, cur, n_wch)
        loc = cur & 7                                        # (NS,)
        ss = []
        for u in range(UNROLL):
            s, x, upd = _decode_symbol(
                x, rows_t[u].astype(jnp.int32), win, loc, m_u[u],
                L, w16_iota)
            cur = cur + upd
            loc = loc + upd
            ss.append(s)
        return (x, cur), jnp.stack(ss)

    (_, _), syms = jax.lax.scan(step, (x0, cur0), (tbl, mask_t))
    return syms.reshape(n_steps * UNROLL, ns).T.astype(jnp.int32)


# --------------------------------------------------- channel-level API


def encode_channels(tables: jnp.ndarray, syms: jnp.ndarray, L: int,
                    lay: StreamLayout):
    """tables (C*n, L) u16, syms (C*n,) int32 -> (words, lengths).

    One fused scan over all channels' streams (per-channel aligned)."""
    start, freq = table_lookup_symbol(
        tables.reshape(lay.C, lay.n, L), syms.reshape(lay.C, lay.n), L)
    return encode_sf(start, freq, lay)


def encode_sf(start: jnp.ndarray, freq: jnp.ndarray, lay: StreamLayout):
    """rANS-encode PRECOMPUTED (start, freq) u32 pairs (channel-major
    (C*n,) or (C, n)) — the v8 2-edge-lookup encode path, which never
    materializes L-wide tables."""
    mask = jnp.asarray(_mask_for(lay))
    return rans_encode(_to_streams(start, lay), _to_streams(freq, lay),
                       mask)


def decode_channels(tables: jnp.ndarray, words: jnp.ndarray, L: int,
                    lay: StreamLayout) -> jnp.ndarray:
    """tables (L, C*n) u16 LANE-MAJOR, words (lanes, T+2)
    -> syms (C, n) int32."""
    t = tables.reshape(L, lay.C, lay.n)
    t = jnp.pad(t, ((0, 0), (0, 0), (0, lay.pad)))
    mask = jnp.asarray(_mask_for(lay))
    mask_t = mask.reshape(lay.lanes, lay.T // UNROLL, UNROLL)\
        .transpose(1, 2, 0)
    syms = rans_decode(t.reshape(L, lay.lanes, lay.T), words, mask_t, L)
    return _from_streams(syms, lay)


def encode_uniform(syms: jnp.ndarray, L: int, lay: StreamLayout):
    """All channels under the uniform prior, one fused scan."""
    row = jnp.asarray(uniform_cdf_row(L))
    tables = jnp.broadcast_to(row, (lay.C * lay.n, L))
    return encode_channels(tables, syms.reshape(-1), L, lay)


def decode_uniform(words: jnp.ndarray, L: int, lay: StreamLayout
                   ) -> jnp.ndarray:
    row = jnp.asarray(uniform_cdf_row(L))
    tables = jnp.broadcast_to(row[:, None], (L, lay.C * lay.n))
    return decode_channels(tables, words, L, lay)


# ------------------------------------------- two-level RGB (format v3)
#
# For L=256 RGB symbols, coding s directly needs 256 CDF edges per pixel.
# Splitting s = 16*a + b into a coarse symbol a (16 values) and a fine
# symbol b (16 values, conditional on a) needs only 17 + 17 edges:
#   p(a)   ~ C(t_{16(a+1)}) - C(t_{16a})          (coarse table, L=16)
#   p(b|a) ~ [C(t_{16a+b+1}) - C(t_{16a+b})] / p(a)   (fine table, L=16)
# The product reproduces the original discretized mixture up to one extra
# 16-bit quantization. 8x less table math and 16x smaller searchsorted
# rows; the chain costs one extra rANS symbol per pixel.

FINE_BITS = 4
N_COARSE = 16  # 256 >> FINE_BITS


def _quantize_rows(c: jnp.ndarray, L: int) -> jnp.ndarray:
    """float CDF rows (..., L) -> uint16 per the v7 table spec.

    Column 0 is PINNED to 0: symbol 0 absorbs the open lower tail, the
    implicit 65536 top gives symbol L-1 the upper tail — matching the
    reference's coding CDF that always spans [0, 1]
    (logistic_mixture.py cdf construction / torchac convention) and the
    DMLL's open-tail bitcost. Without the pin, a confident model that
    pushes mu below x_min (how DMLL expresses "x = x_min") leaves ~all
    mass BELOW edge 0 and the true symbol got freq 1 => 16 bits against
    a ~0-bit theory cost (observed +108% file size on a dark image).
    The +2l slack (no cummax) is what lets the encoder skip building
    rows entirely — see the module-docstring spec."""
    return edge_quantize(c, jnp.arange(L, dtype=jnp.int32), L)\
        .astype(jnp.uint16)


def _channel_params_packed(spec, packed, c, decoded):
    """(pi, mu~, inv_s) for channel c from PRE-PACKED params.

    `packed` = dmll.pack_coder_params output (pi softmaxed, raw mu,
    inv_s, sigmoid'd lam). Packing once per scale (inside the shared
    get_P program) instead of once per builder saves re-running the
    softmax/exp over ALL channels' mixture params 6x per RGB scale —
    measured ~2x on the coarse-table stage at the bench shape."""
    pi, mu, inv_s, lam = packed
    mu_c = mu[..., c, :]
    if spec.rgb_scale and c > 0 and decoded is not None:
        if c == 1:
            mu_c = mu_c + lam[..., 0, :] * decoded[..., 0:1]
        else:
            mu_c = (mu_c + lam[..., 1, :] * decoded[..., 0:1]
                    + lam[..., 2, :] * decoded[..., 1:2])
    n = int(np.prod(mu_c.shape[:-1]))
    K = mu_c.shape[-1]
    return (pi[..., c, :].reshape(n, K), mu_c.reshape(n, K),
            inv_s[..., c, :].reshape(n, K))


def _channel_params(spec, l, c, C, decoded):
    """(pi, mu~, inv_s) for channel c with lambda conditioning applied."""
    return _channel_params_packed(
        spec, dmll_mod.pack_coder_params(spec, l, C), c, decoded)


def rgb_coarse_tables(spec, l, c, C, decoded) -> jnp.ndarray:
    """(n, 16) uint16 coarse tables for channel c (packs `l` itself;
    hot path: rgb_coarse_tables_packed with a pre-packed scale)."""
    return rgb_coarse_tables_packed(
        spec, dmll_mod.pack_coder_params(spec, l, C), c, decoded)


def rgb_coarse_tables_packed(spec, packed, c, decoded) -> jnp.ndarray:
    """(n, 16) uint16 coarse tables for channel c from PACKED params."""
    pi, mu, inv_s = _channel_params_packed(spec, packed, c, decoded)
    cvals = edge_cdf(pi, mu, inv_s, _coarse_edge_targets(spec))
    return _quantize_rows(cvals, N_COARSE)


def _coarse_edge_targets(spec) -> jnp.ndarray:
    """(N_COARSE,) float32 coarse edge targets t_{16a} (shared
    expression: integer-valued f32 edge index * bin_width + t0)."""
    e = jnp.arange(N_COARSE, dtype=jnp.float32) * np.float32(1 << FINE_BITS)
    return (e * np.float32(spec.bin_width)
            + np.float32(spec.x_min - spec.bin_width / 2.0))


def rgb_fine_tables(spec, l, c, C, decoded, a: jnp.ndarray) -> jnp.ndarray:
    """(n, 16) uint16 fine tables for channel c (packs `l` itself;
    hot path: rgb_fine_tables_packed with a pre-packed scale)."""
    return rgb_fine_tables_packed(
        spec, dmll_mod.pack_coder_params(spec, l, C), c, decoded, a)


def rgb_fine_tables_packed(spec, packed, c, decoded, a: jnp.ndarray
                           ) -> jnp.ndarray:
    """(n, 16) uint16 fine tables conditional on coarse symbols a (n,)."""
    pi, mu, inv_s = _channel_params_packed(spec, packed, c, decoded)
    n = pi.shape[0]
    bw = np.float32(spec.bin_width)
    t0 = np.float32(spec.x_min - spec.bin_width / 2.0)
    FINE = 1 << FINE_BITS
    k = jnp.arange(FINE + 1, dtype=jnp.float32)               # 0..16
    base = (a.reshape(n).astype(jnp.float32)
            * np.float32(1 << FINE_BITS))
    t = (base[:, None] + k) * bw + t0                         # (n, 17)
    cvals = edge_cdf(pi, mu, inv_s, t)                        # (n, 17)
    cond = _fine_conditional(cvals[:, :FINE], cvals[:, :1],
                             cvals[:, -1:], a.reshape(n, 1))
    return _quantize_rows(cond, FINE)


def _fine_conditional(c_e, c_lo, c_hi, a):
    """Conditional CDF values for fine edges given raw mixture-CDF
    values: c_e the edge values, (c_lo, c_hi) the enclosing coarse-bin
    edges, a the coarse symbols (broadcastable int).

    Tail absorption in the CONDITIONAL too: the first coarse bin's
    window opens at -inf (C := 0) and the last closes at +inf (C := 1),
    so mass the model places outside [x_min, x_max] lands in the edge
    fine symbols instead of being normalized away — the exact
    conditional counterpart of _quantize_rows' edge-0 pin. Shared
    expression between decode's 17-edge rows and encode's 2-edge
    lookups (edge_quantize clips, so no clip here)."""
    lo = jnp.where(a == 0, 0.0, c_lo)
    hi = jnp.where(a == N_COARSE - 1, 1.0, c_hi)
    denom = jnp.maximum(hi - lo, 1e-9)
    return (c_e - lo) / denom


# ----------------------------------------------- mixture-scale helpers


def mixture_tables_for_channel(spec: dmll_mod.DMLLSpec, l: jnp.ndarray,
                               c: int, C: int,
                               decoded: Optional[jnp.ndarray]
                               ) -> jnp.ndarray:
    """CDF table for channel c of a scale, conditioned on decoded chans.

    l: (1,H,W,Kp) network output; decoded: (1,H,W,C) float values of
    already-decoded channels (only columns < c are read; RGB lambda
    autoregression, logistic_mixture.py:248-275).
    Returns (H*W, L) uint16.
    """
    return mixture_tables_for_channel_packed(
        spec, dmll_mod.pack_coder_params(spec, l, C), c, decoded)


def mixture_tables_for_channel_packed(
        spec: dmll_mod.DMLLSpec, packed, c: int,
        decoded: Optional[jnp.ndarray]) -> jnp.ndarray:
    """mixture_tables_for_channel from PRE-PACKED scale params."""
    pi, mu, inv_s, lam = packed
    mu_c = mu[..., c, :]
    if spec.rgb_scale and c > 0 and decoded is not None:
        if c == 1:
            mu_c = mu_c + lam[..., 0, :] * decoded[..., 0:1]
        else:
            mu_c = (mu_c + lam[..., 1, :] * decoded[..., 0:1]
                    + lam[..., 2, :] * decoded[..., 1:2])
    pi_c, mu_c, inv_c = _maybe_topk(pi[..., c, :], mu_c,
                                    inv_s[..., c, :])
    table = build_cdf_table(pi_c, mu_c, inv_c,
                            spec.x_min, spec.bin_width, spec.L)
    return table.reshape(-1, spec.L)


def _maybe_topk(pi_c, mu_c, inv_c):
    """Optional top-K mixture truncation (CODER_TOPK; default off).
    Shared by the decode-row builder and the encode edge lookup so both
    sides code against the same truncated distribution."""
    K = pi_c.shape[-1]
    if CODER_TOPK and K > CODER_TOPK:
        top_pi, idx = jax.lax.top_k(pi_c, CODER_TOPK)
        pi_c = top_pi / jnp.sum(top_pi, axis=-1, keepdims=True)
        mu_c = jnp.take_along_axis(mu_c, idx, axis=-1)
        inv_c = jnp.take_along_axis(inv_c, idx, axis=-1)
    return pi_c, mu_c, inv_c


def mixture_tables_all_channels(spec: dmll_mod.DMLLSpec, l: jnp.ndarray,
                                C: int,
                                decoded: Optional[jnp.ndarray]
                                ) -> jnp.ndarray:
    """Tables for ALL channels stacked channel-major: (C*H*W, L) u16."""
    return mixture_tables_all_channels_packed(
        spec, dmll_mod.pack_coder_params(spec, l, C), C, decoded)


def mixture_tables_all_channels_packed(
        spec: dmll_mod.DMLLSpec, packed, C: int,
        decoded: Optional[jnp.ndarray]) -> jnp.ndarray:
    """All channels' tables from ONE pre-packed scale: (C*H*W, L) u16."""
    tabs = [mixture_tables_for_channel_packed(spec, packed, c, decoded)
            for c in range(C)]
    return jnp.concatenate(tabs, axis=0)
