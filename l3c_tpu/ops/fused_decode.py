"""Fully-fused RGB scale decode: all 6 rANS streams in ONE lax.scan.

The channel-sequential decode (codec.bitcoding2._decode_rgb) runs six
sequential scans at the RGB scale — (coarse, fine) x 3 channels — of
T/UNROLL steps each, across three chained programs. But the lambda
chain's only cross-channel dependency is on the SAME pixel: channel c's
CDF row for pixel i needs channels <c of pixel i only (reference
net/prob_clf.py lambda conditioning), and the fine row for pixel i
needs that pixel's coarse symbol only. Every stream decodes pixel i at
the same scan step t, so one scan can advance all six stream states per
step, building each CDF row in-body right after the symbols it depends
on are decoded in the SAME step:

    step t, unroll u, for c in 0,1,2:
        v' = apply_lambda_chain(v_c, x_{<c} of this step)   # int_coder
        coarse row from (p,sc,v') -> decode a_c  (stream 2c)
        fine row from (p,a,sc,v',a_c) -> decode b_c (stream 2c+1)
        x_c = 16*a_c + b_c

Sequential scan steps at the RGB scale drop 6x (6 scans of T/U steps ->
one scan of T/U steps) and the three channel programs collapse to one
dispatch with no intermediate decoded-image round-trips. Per-step
element work is identical — the row expressions (int_coder._coarse_cdf,
_fine_cond_q14, quantize_edges + the u16 cast) and the symbol step
(tpu_coder._decode_symbol) are the same functions the channel-
sequential path calls, so the decoded images are bit-identical by
construction (tests/test_fused_decode.py asserts it).

The cost is streaming raw mixture params through the scan instead of
prebuilt u16 rows (~4x the HBM traffic of the rows, a few ms at HBM
bandwidth) — a good trade wherever scan-step overhead dominates, which
is the regime the per-channel microbench showed at serving shapes.
Env-gate: L3C_DEC_FUSED=1 (A/B against the channel-sequential default).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import int_coder as ic
from . import tpu_coder as tc


def _stream_params(x: jnp.ndarray, lay: tc.StreamLayout) -> jnp.ndarray:
    """(F, h, w, 3, K) channel-last params -> (3, NS, steps, U, K) in
    stream order (the same pixel->-(lane, t) map as tc._to_streams)."""
    F, h, w_, C, K = x.shape
    n = h * w_
    n_steps = lay.T // tc.UNROLL
    xc = jnp.moveaxis(x.reshape(F, n, C, K), 2, 0)        # (3, F, n, K)
    xc = jnp.pad(xc, ((0, 0), (0, 0), (0, lay.pad), (0, 0)))
    return xc.reshape(C, lay.lanes, n_steps, tc.UNROLL, K)


def rgb_decode_fused(ip: ic.IntParams, w_coarse: jnp.ndarray,
                     w_fine: jnp.ndarray, T: int, h: int, w: int, F: int
                     ) -> jnp.ndarray:
    """Decode one RGB scale from its 6 stream groups in one scan.

    ip: IntParams with shapes (F, h, w, 3, K) (+ w lambda slots);
    w_coarse/w_fine: (3 * F * ns_c, W) uint16 channel-major decode-order
    words (the same slices _dec_rgb_channel consumes).
    Returns decoded symbols (F, h, w, 3) int32.
    """
    n = h * w
    lay = tc.layout_for(n, F, T)
    NS = lay.lanes
    n_steps = T // tc.UNROLL
    K = ip.p.shape[-1]

    p_s = _stream_params(ip.p, lay)
    a_s = _stream_params(ip.a, lay)
    sc_s = _stream_params(ip.sc, lay)
    v_s = _stream_params(ip.v, lay)
    w_s = _stream_params(ip.w, lay)          # lambda slots, slot-major

    mask = jnp.asarray(tc._mask_for(lay))
    mask_t = mask.reshape(NS, n_steps, tc.UNROLL).transpose(1, 2, 0)

    # 6 stream groups: (coarse c, fine c) for c in 0..2, channel-major
    # rows within each words array (bitcoding2 upload layout)
    def group(words, c):
        wg = jax.lax.slice_in_dim(words, c * NS, (c + 1) * NS, axis=0)
        x0 = (wg[:, 0].astype(jnp.uint32)
              | (wg[:, 1].astype(jnp.uint32) << 16))
        return wg, x0

    groups = [group(w_coarse, c) for c in range(3)] \
        + [group(w_fine, c) for c in range(3)]
    chunked = [tc.chunk_words(wg) for wg, _ in groups]
    w16_iota = chunked[0][2]
    n_wch = chunked[0][3]
    x0 = jnp.stack([x for _, x in groups])                  # (6, NS)
    cur0 = jnp.full((6, NS), 2, jnp.int32)

    iota_c = jnp.broadcast_to(
        jnp.arange(tc.N_COARSE, dtype=jnp.float32)[None],
        (NS, tc.N_COARSE))
    iota_f = jnp.broadcast_to(
        jnp.arange(1 << tc.FINE_BITS, dtype=jnp.float32)[None],
        (NS, 1 << tc.FINE_BITS))
    edges_c = jnp.arange(tc.N_COARSE, dtype=jnp.float32)
    edges_f = jnp.arange(1 << tc.FINE_BITS, dtype=jnp.float32)

    def row_i32(q):
        # mirror the channel-sequential path's u16 storage cast exactly
        return q.astype(jnp.uint16).astype(jnp.int32)

    def step(carry, xs_t):
        x6, cur6 = carry
        t_idx, m_u = xs_t

        def blk(ps):
            b = jax.lax.dynamic_slice_in_dim(ps, t_idx, 1, axis=2)
            return b[:, :, 0]                      # (3, NS, U, K)
        p_b, a_b, sc_b, v_b, w_b = map(blk, (p_s, a_s, sc_s, v_s, w_s))

        wins = [tc._window_fetch(ch, io, cur6[g], n_wch)
                for g, (ch, io, _, _) in enumerate(chunked)]
        locs = [cur6[g] & 7 for g in range(6)]
        xs = [x6[g] for g in range(6)]
        curs = [cur6[g] for g in range(6)]

        out_u = []
        for u in range(tc.UNROLL):
            m = m_u[u]
            dec_syms: Tuple[jnp.ndarray, ...] = ()
            sym_cs = []
            for c in range(3):
                p = p_b[c, :, u]
                a = a_b[c, :, u]
                sc_ = sc_b[c, :, u]
                v = ic.apply_lambda_chain(
                    v_b[c, :, u], c,
                    (w_b[0, :, u], w_b[1, :, u], w_b[2, :, u]),
                    dec_syms)
                cd = ic._coarse_cdf(p, sc_, v, iota_c)
                a_sym, xs[c], upd = tc._decode_symbol(
                    xs[c], row_i32(ic.quantize_edges(
                        cd, edges_c, tc.N_COARSE)),
                    wins[c], locs[c], m, tc.N_COARSE, w16_iota)
                curs[c] = curs[c] + upd
                locs[c] = locs[c] + upd
                cond = ic._fine_cond_q14(p, a, sc_, v, a_sym, iota_f)
                g = 3 + c
                b_sym, xs[g], upd = tc._decode_symbol(
                    xs[g], row_i32(ic.quantize_edges(
                        cond, edges_f, 1 << tc.FINE_BITS)),
                    wins[g], locs[g], m, 1 << tc.FINE_BITS, w16_iota)
                curs[g] = curs[g] + upd
                locs[g] = locs[g] + upd
                sym_c = (a_sym << tc.FINE_BITS) | b_sym
                sym_cs.append(sym_c)
                dec_syms = dec_syms + (sym_c,)
            out_u.append(jnp.stack(sym_cs))        # (3, NS)
        return (jnp.stack(xs), jnp.stack(curs)), jnp.stack(out_u)

    (_, _), syms = jax.lax.scan(
        step, (x0, cur0),
        (jnp.arange(n_steps, dtype=jnp.int32), mask_t))
    # (steps, U, 3, NS) -> per channel (NS, T) -> (F, n) -> image
    syms = syms.transpose(2, 3, 0, 1).reshape(3, NS, T)
    chans = [tc._from_streams(syms[c], lay).reshape(F, h, w)
             for c in range(3)]
    return jnp.stack(chans, axis=-1).astype(jnp.int32)
