"""File encode/decode: the codec runtime tying TPU forward to host rANS.

TPU-native redesign of /root/reference/src/bitcoding/bitcoding.py +
coders.py + coders_helpers.py. Key architectural differences:

- Per scale, the TPU emits a packed (pi, mu, inv_s[, lam]) parameter
  tensor ONCE (models.dmll.pack_coder_params + transpose, jitted); the C++
  backend then codes ALL channels of the scale in one host call, applying
  the RGB lambda autoregression itself from decoded symbols. The
  reference's per-channel loop with per-channel GPU->CPU CDF transfers
  (bitcoding.py:268-294, coders.py:38-90) disappears.
- Determinism contract: encode computes every `l` through the SAME
  per-scale jitted get_P functions decode uses (never through the fused
  training forward), so both sides see bit-identical mixture parameters
  and the bitstream round-trips exactly. Bottleneck values are
  reconstructed from symbols through one shared grid formula
  (models.grids), identical on both sides by construction.
- Decode is S sequential {TPU get_P -> host rANS} steps — one network
  application per scale, like the reference (bitcoding.py:143-155), so
  decode ~= encode speed.

File format (ours, version 2):
  magic 'L3TP' | version u8 | num_scales u8 | n_chunks u8 | flags u8
  | padL,padR,padT,padB u16*4 | padded H u16 | W u16
  then per scale coarse->fine:
    [uniform coarsest]   n_chunks   * u32 chunk lengths | streams
    [mixture scales]   C*n_chunks   * u32 chunk lengths | streams
  each scale terminated by the magic separator u32 (decode validated,
  reference bitcoding.py:36,106,154).
"""
from __future__ import annotations

import os
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import blueprint
from ..config import MsConfig
from ..models import dmll, grids, layers
from ..models.network import MultiscaleNetwork
from ..ops import coder as coder_mod
from ..utils import pad as pad_mod
from ..utils.jaxtools import ensure_compile_cache
from ..eval.timer import NoOpTimer
from . import auto_crop, part_suffix

MAGIC = b"L3TP"
MAGIC_SEP = 0x4C334353  # 'L3CS'
VERSION = 2  # v2: coding CDF pins edge 0 to 0 (lower-tail
             # absorption); v1 streams are undecodable here


class DecodeError(Exception):
    pass


class Bitcoding:
    """Encode/decode images against a trained model's parameters."""

    VERSION = VERSION  # format version byte (module constant)

    def __init__(self, cfg: MsConfig, net: MultiscaleNetwork, params,
                 times=None, n_chunks: int = coder_mod.DEFAULT_CHUNKS,
                 compare_with_theory: bool = False,
                 coder_profile=None):  # v1 streams are chunked, not T-split

        ensure_compile_cache()
        self.cfg = cfg
        self.net = net
        # commit to device: numpy pytrees re-upload per jit call
        self.params = jax.device_put(params)
        self.times = times if times is not None else NoOpTimer()
        self.n_chunks = n_chunks
        self.compare_with_theory = compare_with_theory

        self._rgb = blueprint.rgb_spec(cfg)
        self._bn = blueprint.bn_spec(cfg)
        lo, hi = cfg.q.levels_range
        self._bn_levels = grids.levels(lo, hi, cfg.q.L)

        self._enc_forward = jax.jit(self._enc_forward_impl)
        # ONE jitted get_P+pack per scale — shared by encode and decode
        # (the determinism contract).
        self._get_P = {
            s: jax.jit(lambda p, bn, decF, s=s: self._get_P_impl(s, p, bn,
                                                                 decF))
            for s in range(cfg.num_scales)
        }

    # ----------------------------------------------------- jitted pieces

    def _enc_forward_impl(self, params, x):
        """x (1,H,W,3) float -> per-scale (syms, bn_q), fine->coarse."""
        enc_outs = self.net.apply(params, layers.sub_rgb_mean(x),
                                  method=MultiscaleNetwork.enc_forward)
        return [(eo.syms, eo.bn_q) for eo in enc_outs]

    def _get_P_impl(self, scale: int, params, bn_q, dec_F_prev):
        l, dec_F = self.net.apply(params, scale, bn_q, dec_F_prev,
                                  method=MultiscaleNetwork.get_P)
        baseline = self.cfg.rgb_bicubic_baseline
        spec = self._rgb if (scale == 0 or baseline) else self._bn
        C = 3 if (scale == 0 or baseline) else self.cfg.q.C
        pi, mu, inv_s, lam = dmll.pack_coder_params(spec, l, C)
        # (1,H,W,C,K) -> (C, HW, K) for the native coder
        def to_chwk(a):
            _, H, W, Cc, K = a.shape
            return a.reshape(H * W, Cc, K).transpose(1, 0, 2)
        packed = (to_chwk(pi), to_chwk(mu), to_chwk(inv_s),
                  to_chwk(lam) if lam is not None else None)
        return l, dec_F, packed

    # ------------------------------------------------------------ encode

    def encode(self, img: np.ndarray, pout: str) -> float:
        """Encode uint8 image (H,W,3) or (1,H,W,3) to `pout`; returns bpsp."""
        if img.ndim == 3:
            img = img[None]
        assert img.ndim == 4 and img.shape[0] == 1 and img.shape[3] == 3, \
            img.shape
        assert not os.path.isfile(pout), pout

        if auto_crop.needs_crop(img):
            comb = auto_crop.CropLossCombinator()
            for i, crop in enumerate(auto_crop.iter_crops(img)):
                bpsp = self.encode(crop,
                                   pout + part_suffix.make_part_suffix(i))
                comb.add(bpsp, int(np.prod(crop.shape[1:3])))
            return comb.get_bpsp()

        fac = self.cfg.padding_fac
        padded, pad_tuple = pad_mod.pad(np.asarray(img), fac,
                                        mode="constant")
        _, H, W, _ = padded.shape
        x = jnp.asarray(padded.astype(np.float32))

        with self.times.run("[-] encode forwardpass"):
            per_scale = self._enc_forward(self.params, x)
            per_scale = [(np.asarray(s), bq) for s, bq in per_scale]

        S = self.cfg.num_scales
        total_bytes = 0
        scale_bytes = []
        with open(pout, "wb") as fout:
            fout.write(MAGIC)
            fout.write(struct.pack("<BBBB", VERSION, S, self.n_chunks,
                                   coder_mod.eval_variant()))
            fout.write(struct.pack("<4H", *pad_tuple))
            fout.write(struct.pack("<HH", H, W))

            # coarsest scale: uniform prior (bitcoding.py:171-186).
            # RGB baselines: the coarsest bottleneck is the bicubic
            # RGB pyramid top (L=256 symbols, 3 channels).
            baseline = self.cfg.rgb_bicubic_baseline
            uni_L = self._rgb.L if baseline else self._bn.L
            syms_coarse = per_scale[S - 1][0]  # (1,h,w,C)
            with self.times.prefix_scope(f"[{S}]"):
                with self.times.run("uniform encode"):
                    ucoder = coder_mod.UniformCoder(uni_L, self.n_chunks)
                    syms_cf = _to_chw(syms_coarse)
                    data, lens = ucoder.encode(syms_cf.reshape(-1))
                _write_scale(fout, lens, data)
                scale_bytes.append(len(data))

            # finer scales coarse->fine via get_P (bitcoding.py:212-246)
            dec_F_prev = None
            bn_prev = per_scale[S - 1][1]
            for scale in reversed(range(S)):
                with self.times.prefix_scope(f"[{scale}]"):
                    with self.times.run("get_P"):
                        _, dec_F_prev, packed = self._get_P[scale](
                            self.params, bn_prev, dec_F_prev)
                        pi, mu, inv_s, lam = [
                            np.asarray(a) if a is not None else None
                            for a in packed]
                    if scale == 0:
                        target_syms = _to_chw(padded.astype(np.int32))
                        mcoder = coder_mod.MixtureCoder(
                            self._rgb.L, self._rgb.x_min, self._rgb.x_max,
                            self.n_chunks)
                    elif baseline:
                        # RGB pyramid scale: 256-ary RGB symbols with
                        # the lambda autoregression at every scale
                        target_syms = _to_chw(per_scale[scale - 1][0])
                        mcoder = coder_mod.MixtureCoder(
                            self._rgb.L, self._rgb.x_min, self._rgb.x_max,
                            self.n_chunks)
                        bn_prev = per_scale[scale - 1][1]
                    else:
                        target_syms = _to_chw(per_scale[scale - 1][0])
                        mcoder = coder_mod.MixtureCoder(
                            self._bn.L, self._bn.x_min, self._bn.x_max,
                            self.n_chunks)
                        bn_prev = per_scale[scale - 1][1]
                    with self.times.run("entropy encode"):
                        C = target_syms.shape[0]
                        data, lens = mcoder.encode(
                            pi, mu, inv_s, lam,
                            target_syms.reshape(C, -1))
                    _write_scale(fout, lens, data)
                    scale_bytes.append(len(data))

        # bpsp over the ORIGINAL (pre-pad) subpixels (reference
        # bitcoding.py:108) — padded pixels are codec overhead.
        num_subpixels = int(np.prod(img.shape))
        actual_bytes = os.path.getsize(pout)
        actual_bpsp = actual_bytes * 8 / num_subpixels

        if self.compare_with_theory:
            out = self.net.apply(self.params, x, train=False)
            loss = blueprint.compute_loss(
                self.cfg, out, num_subpixels_before_pad=num_subpixels)
            theory = float(blueprint.total_bpsp(loss))
            assumed = sum(scale_bytes) * 8 / num_subpixels
            print(f"Bitrates: theory {theory:.4f} | streams {assumed:.4f} "
                  f"[{(assumed / theory - 1) * 100:+.2f}%] | actual "
                  f"{actual_bpsp:.4f} [{actual_bytes} bytes]")
        return actual_bpsp

    # ------------------------------------------------------------ decode

    def decode(self, pin: str, _recurse_part: bool = True) -> np.ndarray:
        """Decode `pin` to a (1,H,W,3) uint8 image."""
        if _recurse_part and part_suffix.contains_part_suffix(pin):
            parts = [self.decode(p, _recurse_part=False)
                     for p in part_suffix.iter_part_paths(pin)]
            return auto_crop.stitch(parts)

        with open(pin, "rb") as fin:
            if fin.read(4) != MAGIC:
                raise DecodeError("bad magic")
            version, S, n_chunks, ev = struct.unpack("<BBBB",
                                                     fin.read(4))
            if version != VERSION:
                raise DecodeError(f"unsupported version {version}")
            if ev != coder_mod.eval_variant():
                raise DecodeError(
                    f"file was encoded with CDF evaluator variant {ev}; "
                    f"this backend implements variant "
                    f"{coder_mod.eval_variant()} — decoding would corrupt "
                    f"symbols")
            if S != self.cfg.num_scales:
                raise DecodeError(
                    f"stream has {S} scales, model {self.cfg.num_scales}")
            pad_tuple = struct.unpack("<4H", fin.read(8))
            H, W = struct.unpack("<HH", fin.read(4))

            baseline = self.cfg.rgb_bicubic_baseline
            C_bn = 3 if baseline else self.cfg.q.C
            uni_L = self._rgb.L if baseline else self._bn.L
            h, w = H >> S, W >> S

            with self.times.prefix_scope(f"[{S}]"):
                with self.times.run("uniform decode"):
                    ucoder = coder_mod.UniformCoder(uni_L, n_chunks)
                    lens, data = _read_scale(fin, n_chunks)
                    syms = ucoder.decode(data, lens, C_bn * h * w)
                    syms = syms.reshape(C_bn, h, w)
            bn_prev = jnp.asarray(_bn_of_syms(
                syms, self._bn_levels, baseline))

            dec_F_prev = None
            img = None
            for scale in reversed(range(S)):
                with self.times.prefix_scope(f"[{scale}]"):
                    with self.times.run("get_P"):
                        _, dec_F_prev, packed = self._get_P[scale](
                            self.params, bn_prev, dec_F_prev)
                        pi, mu, inv_s, lam = [
                            np.asarray(a) if a is not None else None
                            for a in packed]
                    hs, ws = H >> scale, W >> scale
                    with self.times.run("entropy decode"):
                        if scale == 0 or baseline:
                            mcoder = coder_mod.MixtureCoder(
                                self._rgb.L, self._rgb.x_min,
                                self._rgb.x_max, n_chunks)
                        else:
                            mcoder = coder_mod.MixtureCoder(
                                self._bn.L, self._bn.x_min,
                                self._bn.x_max, n_chunks)
                        lens, data = _read_scale(
                            fin, (3 if scale == 0 else C_bn) * n_chunks)
                        syms = mcoder.decode(pi, mu, inv_s, lam, data, lens)
                    if scale == 0:
                        img = syms.reshape(3, hs, ws).transpose(1, 2, 0)
                    else:
                        syms = syms.reshape(C_bn, hs, ws)
                        bn_prev = jnp.asarray(_bn_of_syms(
                            syms, self._bn_levels, baseline))

        img = img[None].astype(np.uint8)
        if any(pad_tuple):
            img = pad_mod.undo_pad(img, *pad_tuple)
        return img


# ------------------------------------------------------------------ helpers


def _bn_of_syms(syms_chw: np.ndarray, bn_levels: np.ndarray,
                baseline: bool) -> np.ndarray:
    """Decoded (C,h,w) symbols -> (1,h,w,C) float conditioning input:
    grid levels for L3C bottlenecks, mean-shifted RGB for the bicubic
    pyramids (matching BicubicDownsamplingEnc's output domain)."""
    nhwc = syms_chw.transpose(1, 2, 0)[None]
    if baseline:
        return nhwc.astype(np.float32) - 255.0 * np.asarray(
            layers.RGB_MEAN, np.float32)
    return bn_levels[nhwc]


def _to_chw(a: np.ndarray) -> np.ndarray:
    """(1,H,W,C) -> (C,H,W) int32 contiguous."""
    return np.ascontiguousarray(
        np.asarray(a)[0].transpose(2, 0, 1).astype(np.int32))


def _write_scale(fout, chunk_lens, data: bytes):
    for ln in np.asarray(chunk_lens).reshape(-1):
        fout.write(struct.pack("<I", int(ln)))
    fout.write(data)
    fout.write(struct.pack("<I", MAGIC_SEP))


def _read_scale(fin, n_lens: int) -> Tuple[np.ndarray, bytes]:
    lens = np.frombuffer(fin.read(4 * n_lens), "<u4").astype(np.int64)
    data = fin.read(int(lens.sum()))
    sep, = struct.unpack("<I", fin.read(4))
    if sep != MAGIC_SEP:
        raise DecodeError("magic separator mismatch — corrupt stream")
    return lens, data
