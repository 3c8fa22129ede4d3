"""Format-v2 codec: the entropy coder runs entirely on the accelerator.

Successor to codec.bitcoding (format v1, host C++ rANS): all CDF tables
AND the rANS coding itself run on-device (ops.tpu_coder), so the only
host<->device traffic is the padded image up and the compressed words
down (and vice versa on decode). On the axon-tunneled TPU this cuts per-
image transfer from ~170MB of mixture parameters to ~1-6MB of streams.

Determinism contract (sharper than v1's): every FLOAT-producing stage —
get_P network application and per-channel table construction — is one
jitted function SHARED by encode and decode, so both sides read
bit-identical uint16 tables; the remaining stages (rANS scans) are pure
uint32 integer programs whose results are exact by construction.

Scale coding structure (one file "unit" per line):
  unit 0:            coarsest bottleneck, uniform prior, all channels
                     in ONE fused scan
  per scale coarse->fine, one unit each:
    bn scales:       all q.C channels fused (independent given l)
    RGB scale:       encode fuses all 3 channels (targets known);
                     decode replays channel slices sequentially so the
                     lambda autoregression can condition on decoded
                     channels — streams are channel-aligned to allow it

File format v2:
  magic 'L3TP' | version=2 u8 | num_scales u8 | T_stream u16
  | padL,padR,padT,padB u16*4 | padded H u16 | W u16
  per unit: n_streams u32 | lengths u16*n_streams (words) | words u16[]
  magic separator u32 after every unit.
"""
from __future__ import annotations

import os
import struct
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import blueprint
from ..config import MsConfig
from ..models import grids, layers
from ..models.network import MultiscaleNetwork
from ..ops import tpu_coder as tc
from ..utils import pad as pad_mod
from ..utils.jaxtools import ensure_compile_cache
from ..eval.timer import NoOpTimer
from . import auto_crop, part_suffix
from .bitcoding import MAGIC, MAGIC_SEP, DecodeError


class TpuBitcoding:
    """Encode/decode images with the fully on-device coder (format v2)."""

    VERSION = 2

    def __init__(self, cfg: MsConfig, net: MultiscaleNetwork, params,
                 times=None):
        ensure_compile_cache()
        self.cfg = cfg
        self.net = net
        self.params = params
        self.times = times if times is not None else NoOpTimer()

        self._rgb = blueprint.rgb_spec(cfg)
        self._bn = blueprint.bn_spec(cfg)
        lo, hi = cfg.q.levels_range
        self._bn_levels = jnp.asarray(grids.levels(lo, hi, cfg.q.L))

        # ---- shared float-producing jits (encode AND decode use these)
        self._enc_forward = jax.jit(self._enc_forward_impl)
        self._get_P = {
            s: jax.jit(lambda p, bn, decF, s=s: self.net.apply(
                p, s, bn, decF, method=MultiscaleNetwork.get_P))
            for s in range(cfg.num_scales)
        }
        self._tables_bn = jax.jit(
            lambda l: tc.mixture_tables_all_channels(
                self._bn, l, cfg.q.C, None))
        self._table_rgb = {
            c: jax.jit(lambda l, dec, c=c: tc.mixture_tables_for_channel(
                self._rgb, l, c, 3, dec))
            for c in range(3)
        }
        self._tables_rgb_all = jax.jit(
            lambda l, dec: tc.mixture_tables_all_channels(
                self._rgb, l, 3, dec))

        # ---- integer coder jits (side-specific; exact by construction)
        self._encode_unit = jax.jit(
            lambda tables, syms, L, n, C: tc.encode_channels(
                tables, syms, L, tc.layout_for(n, C)),
            static_argnums=(2, 3, 4))
        self._decode_unit = jax.jit(
            lambda tables, words, L, n, C: tc.decode_channels(
                tables, words, L, tc.layout_for(n, C)),
            static_argnums=(2, 3, 4))
        self._enc_uni = jax.jit(
            lambda syms, L, n, C: tc.encode_uniform(
                syms, L, tc.layout_for(n, C)),
            static_argnums=(1, 2, 3))
        self._dec_uni = jax.jit(
            lambda words, L, n, C: tc.decode_uniform(
                words, L, tc.layout_for(n, C)),
            static_argnums=(1, 2, 3))

    def _enc_forward_impl(self, params, x):
        enc_outs = self.net.apply(params, layers.sub_rgb_mean(x),
                                  method=MultiscaleNetwork.enc_forward)
        return [(eo.syms, eo.bn_q) for eo in enc_outs]

    # ------------------------------------------------------------ encode

    def encode(self, img: np.ndarray, pout: str) -> float:
        if img.ndim == 3:
            img = img[None]
        assert img.shape[0] == 1 and img.shape[3] == 3, img.shape
        assert not os.path.isfile(pout), pout

        if auto_crop.needs_crop(img):
            comb = auto_crop.CropLossCombinator()
            for i, crop in enumerate(auto_crop.iter_crops(img)):
                bpsp = self.encode(crop,
                                   pout + part_suffix.make_part_suffix(i))
                comb.add(bpsp, int(np.prod(crop.shape[1:3])))
            return comb.get_bpsp()

        padded, pad_tuple = pad_mod.pad(np.asarray(img),
                                        self.cfg.padding_fac, "constant")
        _, H, W, _ = padded.shape
        x = jnp.asarray(padded.astype(np.float32))
        S = self.cfg.num_scales
        C_bn = self.cfg.q.C

        with self.times.run("[-] encode forwardpass"):
            per_scale = self._enc_forward(self.params, x)

        units: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        # coarsest: uniform prior over all channels, one fused scan
        syms_c = per_scale[S - 1][0]                    # (1,h,w,C)
        n_u = syms_c.shape[1] * syms_c.shape[2]
        with self.times.run("uniform encode"):
            units.append(self._enc_uni(
                _chw_flat(syms_c), self._bn.L, n_u, C_bn))

        dec_F_prev = None
        bn_prev = per_scale[S - 1][1]
        for scale in reversed(range(S)):
            with self.times.prefix_scope(f"[{scale}]"):
                with self.times.run("get_P"):
                    l, dec_F_prev = self._get_P[scale](
                        self.params, bn_prev, dec_F_prev)
                if scale == 0:
                    target = jnp.asarray(padded.astype(np.int32))
                    decoded_vals = target.astype(jnp.float32)
                    with self.times.run("tables+rans"):
                        tables = self._tables_rgb_all(l, decoded_vals)
                        units.append(self._encode_unit(
                            tables, _chw_flat(target), self._rgb.L,
                            H * W, 3))
                else:
                    target = per_scale[scale - 1][0]
                    bn_prev = per_scale[scale - 1][1]
                    n = target.shape[1] * target.shape[2]
                    with self.times.run("tables+rans"):
                        tables = self._tables_bn(l)
                        units.append(self._encode_unit(
                            tables, _chw_flat(target), self._bn.L, n,
                            C_bn))

        # ---- single sync point: fetch all units, then write the file
        with self.times.run("fetch+write"):
            units_np = jax.device_get(units)
            with open(pout, "wb") as fout:
                fout.write(MAGIC)
                fout.write(struct.pack("<BBH", self.VERSION, S,
                                       tc.T_STREAM))
                fout.write(struct.pack("<4H", *pad_tuple))
                fout.write(struct.pack("<HH", H, W))
                for words, lens in units_np:
                    _write_unit(fout, words, lens)
                    fout.write(struct.pack("<I", MAGIC_SEP))

        return os.path.getsize(pout) * 8 / float(np.prod(padded.shape))

    # ------------------------------------------------------------ decode

    def decode(self, pin: str, _recurse_part: bool = True) -> np.ndarray:
        if _recurse_part and part_suffix.contains_part_suffix(pin):
            parts = [self.decode(p, _recurse_part=False)
                     for p in part_suffix.iter_part_paths(pin)]
            return auto_crop.stitch(parts)

        with open(pin, "rb") as fin:
            if fin.read(4) != MAGIC:
                raise DecodeError("bad magic")
            version, S, t_stream = struct.unpack("<BBH", fin.read(4))
            if version != self.VERSION:
                raise DecodeError(f"file is format v{version}; this is "
                                  f"the v{self.VERSION} (TPU) decoder")
            if S != self.cfg.num_scales:
                raise DecodeError("scale count mismatch")
            if t_stream != tc.T_STREAM:
                raise DecodeError(
                    f"stream length {t_stream} != built-in {tc.T_STREAM}")
            pad_tuple = struct.unpack("<4H", fin.read(8))
            H, W = struct.unpack("<HH", fin.read(4))

            units = []
            for _ in range(S + 1):
                units.append(_read_unit(fin))
                _expect_sep(fin)

        C_bn = self.cfg.q.C
        h, w = H >> S, W >> S
        with self.times.run("uniform decode"):
            syms = self._dec_uni(jnp.asarray(units[0]), self._bn.L,
                                 h * w, C_bn)                # (C, h*w)
            syms = _chw_unflat(syms, h, w)
        bn_prev = self._bn_levels[syms]

        dec_F_prev = None
        img = None
        for i, scale in enumerate(reversed(range(S)), start=1):
            with self.times.prefix_scope(f"[{scale}]"):
                with self.times.run("get_P"):
                    l, dec_F_prev = self._get_P[scale](
                        self.params, bn_prev, dec_F_prev)
                hs, ws = H >> scale, W >> scale
                words = jnp.asarray(units[i])
                with self.times.run("tables+rans"):
                    if scale == 0:
                        img = self._decode_rgb(l, words, hs, ws)
                    else:
                        tables = self._tables_bn(l)
                        syms = self._decode_unit(
                            tables, words, self._bn.L, hs * ws, C_bn)
                        bn_prev = self._bn_levels[
                            _chw_unflat(syms, hs, ws)]

        img = np.asarray(img).astype(np.uint8)[None]
        if any(pad_tuple):
            img = pad_mod.undo_pad(img, *pad_tuple)
        return img

    def _decode_rgb(self, l, words, hs, ws):
        """Channel-sequential RGB decode with lambda conditioning.

        The fused encode wrote channel-aligned streams; decode slices
        channel c's stream rows and decodes them against a table built
        from the already-decoded channels.
        """
        n = hs * ws
        lay1 = tc.layout_for(n, 1)
        decoded = jnp.zeros((1, hs, ws, 3), jnp.float32)
        ch_syms = []
        for c in range(3):
            table = self._table_rgb[c](l, decoded)
            w_c = words[c * lay1.ns_c: (c + 1) * lay1.ns_c]
            s_c = self._decode_unit(table, w_c, self._rgb.L, n, 1)
            s_c = s_c.reshape(1, hs, ws)
            ch_syms.append(s_c)
            decoded = decoded.at[..., c].set(s_c.astype(jnp.float32))
        return jnp.stack(ch_syms, axis=-1)[0]


# ------------------------------------------------------------------ io


def _chw_flat(nhwc: jnp.ndarray) -> jnp.ndarray:
    """(1,H,W,C) -> (C*H*W,) channel-major int32."""
    return nhwc[0].transpose(2, 0, 1).reshape(-1).astype(jnp.int32)


def _chw_unflat(syms_cn: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(C, n) -> (1,h,w,C)."""
    C = syms_cn.shape[0]
    return syms_cn.reshape(C, h, w).transpose(1, 2, 0)[None]


def _write_unit(fout, words: np.ndarray, lengths: np.ndarray):
    """words (NS, T+2) u16 padded; lengths (NS,) words used."""
    ns = words.shape[0]
    fout.write(struct.pack("<I", ns))
    fout.write(lengths.astype("<u2").tobytes())
    payload = np.concatenate(
        [words[i, : int(lengths[i])] for i in range(ns)])
    fout.write(payload.astype("<u2").tobytes())


def _read_unit(fin) -> np.ndarray:
    """-> words (NS, T+2) u16 padded for the decoder."""
    ns, = struct.unpack("<I", fin.read(4))
    if ns == 0 or ns > 1 << 24:
        raise DecodeError(f"bad stream count {ns}")
    lengths = np.frombuffer(fin.read(2 * ns), "<u2").astype(np.int64)
    total = int(lengths.sum())
    payload = np.frombuffer(fin.read(2 * total), "<u2")
    if payload.size != total:
        raise DecodeError("truncated stream payload")
    words = np.zeros((ns, tc.T_STREAM + 2), np.uint16)
    off = 0
    for i2 in range(ns):
        ln = int(lengths[i2])
        words[i2, :ln] = payload[off:off + ln]
        off += ln
    return words


def _expect_sep(fin):
    sep, = struct.unpack("<I", fin.read(4))
    if sep != MAGIC_SEP:
        raise DecodeError("magic separator mismatch — corrupt stream")
