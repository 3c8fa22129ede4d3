"""Fully on-TPU rANS entropy codec: vectorized streams under lax.scan.

This is the TPU-native successor to both torchac backends: instead of
evaluating CDFs on the host (ops/coder.py, the portable CPU backend) or
shipping per-pixel CDF tables across the host link (the reference's CUDA
managed-memory design, torchac_kernel.cu:80-84), the ENTIRE entropy coder
runs on the TPU:

- Each channel's pixels are split into many independent rANS streams
  (T=256 symbols each => ~1000+ streams for a 512x512 scale). One
  lax.scan steps all streams in lockstep; every scan step is a wide VPU
  op across streams. Sequential-per-stream, parallel-across-streams.
- rANS32: uint32 state, 16-bit probabilities, 16-bit word renorm. At
  most one emitted/consumed word per symbol (state < 2^32 => one shift
  reaches < 2^16 <= freq<<16). All-integer => bit-exact by construction;
  no float determinism contract needed between encode and decode.
- Quantized CDF tables are computed on device (models.dmll params ->
  uint16 rows) and NEVER leave HBM. Decode finds each symbol with a
  vectorized compare/sum/min/max "searchsorted" over the row — no
  gathers in the hot loop.
- Only the compressed words + per-stream lengths cross the host link.

Table spec (format v2): for L symbols, row entries l = 0..L-1:
    CQ(l) = cummax_l( round(cdf(t_l) * (65536 - L)) ) + l
with the implicit top 65536 for symbol L-1. Strictly increasing (the +l
term), so freq >= 1 always; cummax makes monotonicity unconditional
without needing a monotone float evaluator (cf. the host backend's
provably-monotone sigmoid — here the table is computed once and shared).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dmll as dmll_mod

T_STREAM = 256          # symbols per rANS stream
RANS_L = 1 << 16        # state lower bound
PROB_BITS = 16


class StreamLayout(NamedTuple):
    n_streams: int
    n_pad: int            # padded symbol slots in the last stream

    @property
    def padded(self) -> int:
        return self.n_streams * T_STREAM


def layout_for(n_symbols: int) -> StreamLayout:
    ns = -(-n_symbols // T_STREAM)
    return StreamLayout(n_streams=ns, n_pad=ns * T_STREAM - n_symbols)


def _to_streams(flat: jnp.ndarray, lay: StreamLayout) -> jnp.ndarray:
    """(n,) -> (NS, T) with zero padding."""
    return jnp.pad(flat, (0, lay.n_pad)).reshape(lay.n_streams, T_STREAM)


def _mask_for(lay: StreamLayout) -> np.ndarray:
    m = np.ones((lay.n_streams, T_STREAM), bool)
    if lay.n_pad:
        m.reshape(-1)[-lay.n_pad:] = False
    return m


# --------------------------------------------------------------- tables


def build_cdf_table(pi: jnp.ndarray, mu: jnp.ndarray, inv_s: jnp.ndarray,
                    x_min: float, bin_w: float, L: int) -> jnp.ndarray:
    """Quantized CDF rows from mixture params.

    pi, mu, inv_s: (..., K) float32 (pi softmaxed, inv_s=exp(-log_s)).
    Returns (..., L) uint16 rows per the format-v2 table spec. Stays in
    HBM; XLA fuses the (K x L) evaluation per pixel, or the fused Pallas
    kernel does it explicitly when L3C_PALLAS_CDF=1 (encode and decode
    pick the same path, preserving the shared-table contract).
    """
    from . import pallas_cdf
    if pallas_cdf.pallas_cdf_enabled():
        return pallas_cdf.build_cdf_table_pallas(pi, mu, inv_s, x_min,
                                                 bin_w, L)
    lvals = np.arange(L, dtype=np.float32)
    t = jnp.asarray(lvals * np.float32(bin_w)
                    + np.float32(x_min - bin_w / 2.0))       # (L,) edges
    z = (t - mu[..., None]) * inv_s[..., None]               # (...,K,L)
    c = jnp.sum(pi[..., None] * jax.nn.sigmoid(z), axis=-2)  # (...,L)
    M = np.float32(65536 - L)
    q = jnp.floor(jnp.minimum(c, 1.0) * M + 0.5).astype(jnp.int32)
    q = jax.lax.cummax(q, axis=q.ndim - 1)
    q = q + jnp.arange(L, dtype=jnp.int32)
    return q.astype(jnp.uint16)


def uniform_cdf_row(L: int) -> np.ndarray:
    """Closed-form uniform table (coarsest scale)."""
    l = np.arange(L, dtype=np.uint64)
    return ((l << 16) // L).astype(np.uint16)


def table_lookup_symbol(table: jnp.ndarray, syms: jnp.ndarray, L: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, freq) u32 for known symbols (encode side).

    table: (..., L) uint16, syms: (...,) int32.
    """
    t32 = table.astype(jnp.uint32)
    start = jnp.take_along_axis(t32, syms[..., None].astype(jnp.int32),
                                axis=-1)[..., 0]
    top = jnp.uint32(65536)
    nxt = jnp.take_along_axis(
        t32, jnp.minimum(syms + 1, L - 1)[..., None].astype(jnp.int32),
        axis=-1)[..., 0]
    high = jnp.where(syms == L - 1, top, nxt)
    return start, high - start


# ------------------------------------------------------------- encoding


def rans_encode(start: jnp.ndarray, freq: jnp.ndarray,
                mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (NS, T) u32 (start, freq) pairs into rANS streams.

    mask: (NS, T) bool — False slots are skipped (tail padding).
    Returns (words (NS, T+2) uint16, lengths (NS,) int32 in words).
    Words are already in DECODE order: [state_lo, state_hi, renorm words].
    """
    ns = start.shape[0]
    # rANS encodes in reverse symbol order
    start_r = start[:, ::-1].T        # (T, NS) scan xs
    freq_r = freq[:, ::-1].T
    mask_r = mask[:, ::-1].T

    def step(x, xs):
        st, f, m = xs
        emit = jnp.logical_and(m, x >= (f << 16))
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(emit, x >> 16, x)
        fs = jnp.maximum(f, 1)  # padded slots carry f=0; avoid div-by-0
        x2 = ((x1 // fs) << 16) + (x1 % fs) + st
        x = jnp.where(m, x2, x)
        return x, (emit, w)

    x0 = jnp.full((ns,), RANS_L, jnp.uint32)
    xf, (emits, words) = jax.lax.scan(step, x0, (start_r, freq_r, mask_r))
    # emits/words: (T, NS) in chronological (reversed-symbol) order.
    # Final stream order: [state words] + reverse(chronological).
    emits = emits.T                   # (NS, T)
    words = words.T
    n_emit = jnp.sum(emits, axis=1).astype(jnp.int32)       # (NS,)
    # word from chrono position t lands at index 2 + (n_emit - cumsum_t)
    cum = jnp.cumsum(emits.astype(jnp.int32), axis=1)       # inclusive
    pos = 2 + (n_emit[:, None] - cum)
    pos = jnp.where(emits, pos, T_STREAM + 2)               # drop slot
    out = jnp.zeros((ns, T_STREAM + 3), jnp.uint16)
    rows = jnp.broadcast_to(jnp.arange(ns)[:, None], pos.shape)
    out = out.at[rows, pos].set(words, mode="drop")
    out = out.at[:, 0].set((xf & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    out = out.at[:, 1].set((xf >> 16).astype(jnp.uint16))
    return out[:, : T_STREAM + 2], n_emit + 2


# ------------------------------------------------------------- decoding


def rans_decode(tables_t: jnp.ndarray, words: jnp.ndarray,
                mask_t: jnp.ndarray, L: int) -> jnp.ndarray:
    """Decode (NS,) streams against per-position CDF rows.

    tables_t: (T, NS, L) uint16 rows (scan xs — position-major)
    words:    (NS, W) uint16 stream words (decode order)
    mask_t:   (T, NS) bool
    Returns syms (NS, T) int32.
    """
    ns = words.shape[0]
    x0 = (words[:, 0].astype(jnp.uint32)
          | (words[:, 1].astype(jnp.uint32) << 16))
    cur0 = jnp.full((ns,), 2, jnp.int32)

    top = jnp.int32(65536)

    def step(carry, xs):
        x, cur = carry
        row16, m = xs
        row = row16.astype(jnp.int32)                       # (NS, L)
        cf = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)     # (NS,)
        le = row <= cf[:, None]                             # (NS, L)
        s = jnp.maximum(jnp.sum(le, axis=1) - 1, 0)
        start = jnp.max(jnp.where(le, row, 0), axis=1)
        high = jnp.minimum(jnp.min(jnp.where(le, top, row), axis=1), top)
        high = jnp.where(s == L - 1, top, high)
        f = (high - start).astype(jnp.uint32)
        x1 = f * (x >> 16) + (x & jnp.uint32(0xFFFF)) \
            - start.astype(jnp.uint32)
        need = x1 < RANS_L
        w = jnp.take_along_axis(words, cur[:, None], axis=1)[:, 0]
        x2 = jnp.where(need, (x1 << 16) | w.astype(jnp.uint32), x1)
        cur1 = cur + need.astype(jnp.int32)
        x = jnp.where(m, x2, x)
        cur = jnp.where(m, cur1, cur)
        return (x, cur), s

    (_, _), syms = jax.lax.scan(step, (x0, cur0), (tables_t, mask_t))
    return syms.T.astype(jnp.int32)                          # (NS, T)


# --------------------------------------------------- channel-level API


def encode_channel(table: jnp.ndarray, syms_flat: jnp.ndarray, L: int,
                   lay: StreamLayout):
    """table (n, L) u16, syms (n,) int32 -> (words, lengths)."""
    start, freq = table_lookup_symbol(table, syms_flat, L)
    mask = jnp.asarray(_mask_for(lay))
    return rans_encode(_to_streams(start, lay),
                       _to_streams(freq, lay), mask)


def decode_channel(table: jnp.ndarray, words: jnp.ndarray, L: int,
                   lay: StreamLayout, n: int) -> jnp.ndarray:
    """table (n, L) u16, words (NS, T+2) -> syms (n,) int32."""
    pad = ((0, lay.n_pad), (0, 0))
    tables = jnp.pad(table, pad).reshape(lay.n_streams, T_STREAM, -1)
    tables_t = tables.transpose(1, 0, 2)                     # (T, NS, L)
    mask_t = jnp.asarray(_mask_for(lay)).T
    syms = rans_decode(tables_t, words, mask_t, L)
    return syms.reshape(-1)[:n]


def encode_uniform_channel(syms_flat: jnp.ndarray, L: int,
                           lay: StreamLayout):
    row = jnp.asarray(uniform_cdf_row(L))
    n = syms_flat.shape[0]
    table = jnp.broadcast_to(row, (n, L))
    return encode_channel(table, syms_flat, L, lay)


def decode_uniform_channel(words: jnp.ndarray, L: int, lay: StreamLayout,
                           n: int) -> jnp.ndarray:
    row = jnp.asarray(uniform_cdf_row(L))
    table = jnp.broadcast_to(row, (lay.padded, L))
    tables_t = table.reshape(lay.n_streams, T_STREAM, L).transpose(1, 0, 2)
    mask_t = jnp.asarray(_mask_for(lay)).T
    syms = rans_decode(tables_t, words, mask_t, L)
    return syms.reshape(-1)[:n]


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
    pi, mu, inv_s, lam = dmll_mod.pack_coder_params(spec, l, C)
    mu_c = mu[..., c, :]
    if spec.rgb_scale and c > 0 and decoded is not None:
        if c == 1:
            mu_c = mu_c + lam[..., 0, :] * decoded[..., 0:1]
        else:
            mu_c = (mu_c + lam[..., 1, :] * decoded[..., 0:1]
                    + lam[..., 2, :] * decoded[..., 1:2])
    table = build_cdf_table(pi[..., c, :], mu_c, inv_s[..., c, :],
                            spec.x_min, spec.bin_width, spec.L)
    return table.reshape(-1, spec.L)
