"""On-device codec (format v6): the entropy coder runs on the accelerator.

Successor to codec.bitcoding (the host C++ rANS backend, v2 byte): all CDF tables
AND the rANS coding itself run on-device (ops.tpu_coder), so the only
host<->device traffic is the padded image up and the compressed words
down (and vice versa on decode). On the axon-tunneled TPU this cuts per-
image transfer from ~170MB of mixture parameters to ~1-6MB of streams.

Determinism contract (since v4): every FLOAT-producing stage — get_P network
application and per-channel table construction — is one jitted function
shared by encode and decode AND always applied at a FIXED PHYSICAL BATCH
`fbatch` recorded in the file header. Programs compiled at different
batch sizes can differ in float results (observed on the CPU backend:
different tilings reassociate conv reductions), but within ONE compiled
program no operator mixes batch slots, so a file encoded in any slot of
the fbatch-sized program decodes bit-exactly in any slot of the same
program. Logical batches smaller than fbatch are padded by repeating
image 0 (encode) / stream 0 (decode); dummy slots are sliced away at the
exit. This replaces the v3 design's per-image B=1 float loops — the
whole float pipeline now runs in O(1) dispatches per scale instead of
O(B), and the table builders batch across images.

The integer rANS scans are exact by construction and always fuse across
the batch. Decoder-side values are reconstructed from committed integer
symbols through the shared grid tables, so they match the encoder
bitwise.

Scale coding structure (per image, one file "unit" per line):
  unit 0:            coarsest bottleneck, uniform prior, all channels
  per scale coarse->fine:
    bn scales:       ONE unit, all q.C channels fused
    RGB scales:      TWO units (two-level coding): 16-ary coarse
                     symbols, then 16-ary fine symbols conditioned on
                     the decoded coarse bin

v8 coder: the coding CDF is the EXACT-INTEGER-IN-F32 evaluator of
ops.int_coder (per-edge +2l spec, no cummax). The mixture params are
quantized to integer fixed point ONCE inside each scale's shared get_P
program; everything downstream is exact-integer f32 math that gives
bit-identical results in ANY program shape and fusion. Consequences:
 - encode evaluates only the 2 CDF edges around each KNOWN symbol
   (O(2K) per pixel instead of O(L*K) full rows) fused into the rANS
   scan program — no standalone table-builder dispatches at all;
 - decode builds full rows INSIDE its scan programs (same exact math);
 - the v6/v7 "same builder programs" constraint narrows to the get_P
   float forward alone (still covered by the fbatch contract above).
A canary over the pack+rows+lookup chain on fixed synthetic params is
stamped into every header; decode rejects a mismatch BEFORE emitting
pixels (the analogue of host v2's evaluator-variant byte). The header
also records the coder's top-k mixture truncation so decode rebuilds
the same truncated distribution.

File format v8:
  magic 'L3TP' | version=8 u8 | num_scales u8 | fbatch u8
  | topk u8 (0 = full mixture) | canary u32
  | padL,padR,padT,padB u16*4 | padded H u16 | W u16
  per unit: T u16 | n_streams u32
            | length block (mode u8: 0 = base u16 + u8 deltas,
                            1 = raw u16 lengths)
            | words u16[] | magic separator u32.
  T is chosen per unit by ops.tpu_coder.t_policy (profile-dependent) at
  encode time; decode always honors the recorded value.
"""
from __future__ import annotations

import os
import struct
import sys
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import blueprint
from ..config import MsConfig
from ..models import dmll as dmll_mod
from ..models import grids, layers
from ..models.quantizer import levels_select
from ..models.network import MultiscaleNetwork
from ..ops import int_coder as ic
from ..ops import tpu_coder as tc
from ..utils import pad as pad_mod
from ..utils.jaxtools import ensure_compile_cache
from ..eval.timer import NoOpTimer
from . import auto_crop, part_suffix
from .bitcoding import MAGIC, MAGIC_SEP, DecodeError

# Allowed physical float-batch sizes. Encode picks the smallest >= the
# logical batch; each value is a separate compiled program per shape.
# Wider batches widen the rANS scans (more streams in lockstep per
# step), amortizing sequential scan depth — the main serving-throughput
# lever on TPU.
FBATCHES = (1, 2, 4, 8, 16, 32)

# L3C_SYNC_TIMES=1: force a device sync (1-element fetch; axon's
# block_until_ready is a no-op) at the end of every timed stage so the
# StackTimer spans measure device execution instead of async dispatch.
_SYNC_TIMES = os.environ.get("L3C_SYNC_TIMES", "0") == "1"


def _sync(x):
    if _SYNC_TIMES and x is not None:
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))
    return x


def fbatch_for(B: int) -> int:
    for f in FBATCHES:
        if f >= B:
            return f
    raise ValueError(f"logical batch {B} > max fbatch {FBATCHES[-1]}; "
                     f"chunk the batch into groups of {FBATCHES[-1]}")


def _group_syms(nhwc: jnp.ndarray) -> jnp.ndarray:
    """(F,h,w,C) -> (C*F*n,) channel-major/batch-minor int32."""
    F, h, w, C = nhwc.shape
    return nhwc.transpose(3, 0, 1, 2).reshape(-1).astype(jnp.int32)


def _ungroup_syms(flat_gn: jnp.ndarray, F: int, h: int, w: int
                  ) -> jnp.ndarray:
    """(C*F, n) -> (F,h,w,C)."""
    G = flat_gn.shape[0]
    C = G // F
    return flat_gn.reshape(C, F, h, w).transpose(1, 2, 3, 0)


def _unpad_dev(flat: jnp.ndarray, hdr_off, rows: int, cols: int
               ) -> jnp.ndarray:
    """Rebuild one unit's padded (rows, cols) scan layout on device.

    `flat` = [u32 row offsets as u16 pairs for ALL rows | dense words |
    slack]; hdr_off (traced scalar) = element index of this unit's
    offset pairs. Each row's words are a contiguous run, so a vmap'd
    dynamic_slice (one per row) re-pads the whole unit in ~10ms where a
    padded host upload cost hundreds of ms of tunnel time. Columns past
    a row's true length hold the NEXT rows' words — harmless: the rANS
    scan's word cursor never advances past the row's own renorm count."""
    pairs = jax.lax.dynamic_slice(flat, (hdr_off,), (2 * rows,))
    offs = (pairs[0::2].astype(jnp.int32)
            | (pairs[1::2].astype(jnp.int32) << 16))
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(flat, (o,), (cols,)))(offs)


_CANARY_CACHE = {}
_TOPK_LOGGED: set = set()


def contract_canary(rgb_spec, bn_spec, C_bn: int, K: int,
                    topk: int) -> int:
    """u32 attestation that THIS process produces the same coder
    numerics as the encoder's did.

    Runs the v8 chain — pack_int_params (the one float stage) + decode
    row builders + encode 2-edge lookups, bn and two-level RGB — on
    fixed synthetic network outputs in one tiny jitted program and
    CRC32s the outputs. With the exact-integer evaluator everything
    after pack is platform-independent by construction, so a mismatch
    can only come from the float pack stage (or a code change in the
    evaluator itself) — exactly what must abort a decode BEFORE any
    pixel is emitted."""
    import zlib
    key = (rgb_spec, bn_spec, C_bn, K, topk)
    if key not in _CANARY_CACHE:
        n_h, n_w = 4, 32                       # 128 canary pixels
        rs = np.random.RandomState(0x13C7)
        Kp_rgb = dmll_mod.non_shared_get_Kp(K, 3)
        Kp_bn = dmll_mod.non_shared_get_Kp(K, C_bn)
        l_rgb = (rs.randn(1, n_h, n_w, Kp_rgb) * 2.0).astype(np.float32)
        l_bn = (rs.randn(1, n_h, n_w, Kp_bn) * 2.0).astype(np.float32)
        t_rgb = rs.randint(0, 256, (1, n_h, n_w, 3)).astype(np.int32)
        t_bn = rs.randint(0, bn_spec.L,
                          (C_bn, n_h * n_w)).astype(np.int32)

        def canary_fn():
            ip_r = ic.pack_int_params(rgb_spec, jnp.asarray(l_rgb), 3,
                                      topk)
            ip_b = ic.pack_int_params(bn_spec, jnp.asarray(l_bn), C_bn,
                                      topk)
            t = jnp.asarray(t_rgb)
            a1 = (t[..., 1] >> tc.FINE_BITS).reshape(-1)
            b1 = (t[..., 1] & 15).reshape(-1)
            dec1 = (t[..., 0].reshape(-1),)
            return (
                ic.rgb_coarse_rows(ip_r, 1, dec1),
                ic.rgb_fine_rows(ip_r, 1, dec1, a1),
                ic.rgb_coarse_lookup(ip_r, 1, dec1, a1),
                ic.rgb_fine_lookup(ip_r, 1, dec1, a1, b1),
                ic.bn_rows(ip_b, C_bn, bn_spec.L),
                ic.bn_lookup(ip_b, jnp.asarray(t_bn), C_bn, bn_spec.L),
            )

        outs = jax.jit(canary_fn)()
        blob = b"".join(np.asarray(o).tobytes()
                        for o in jax.tree_util.tree_leaves(outs))
        _CANARY_CACHE[key] = zlib.crc32(blob) & 0xFFFFFFFF
    return _CANARY_CACHE[key]


class TpuBitcoding:
    """Encode/decode images with the fully on-device coder (format v8)."""

    VERSION = 8  # v8 = exact-integer coding CDF, 2-edge encode, topk

    def __init__(self, cfg: MsConfig, net: MultiscaleNetwork, params,
                 times=None, device=None, coder_profile=None,
                 coder_topk: Optional[int] = None):
        """device: optional jax.Device pinning ALL of this codec's work
        (params, inputs, every jit dispatch) to one chip. Used by
        parallel.fanout.CodecFanout to run one codec instance per mesh
        device — the per-device executables are the same lowering at the
        same shapes, so the v4 fixed-physical-batch determinism contract
        holds across devices of the same platform."""
        ensure_compile_cache()
        self.cfg = cfg
        self.net = net
        self._device = device
        # ALWAYS commit params to device: checkpoint restores hand back
        # numpy pytrees, and jit re-uploads numpy args on EVERY call —
        # ~20MB/dispatch through the host tunnel dwarfs the compute.
        self.params = jax.device_put(params, device)
        self.times = times if times is not None else NoOpTimer()
        self._verify_jit = None

        self._rgb = blueprint.rgb_spec(cfg)
        self._bn = blueprint.bn_spec(cfg)
        lo, hi = cfg.q.levels_range
        self._bn_levels = jnp.asarray(grids.levels(lo, hi, cfg.q.L))

        # ---- shared float-producing jits (encode AND decode use these;
        # always dispatched at a physical batch from FBATCHES — the v4
        # determinism contract).
        self._enc_forward = jax.jit(self._enc_forward_impl)
        self._enc_head = jax.jit(self._enc_head_impl,
                                 static_argnums=(2,))
        # (rows, cols) padded unit view out of the DENSE uploaded word
        # buffer (u32 row-offset header + packed stream words). hdr_off
        # stays a traced scalar so content-dependent offsets never
        # trigger recompiles.
        self._unpad_unit = jax.jit(_unpad_dev, static_argnums=(2, 3))
        # get_P + pack_int_params in ONE shared program per scale: the
        # network forward AND the float->int quantization boundary (the
        # v8 coder's only float stage) run once; every downstream coder
        # program consumes exact-integer IntParams.
        # coder_topk: truncate the coding mixture to the top-k
        # components (renormalized; the host backend's PI_SKIP analogue)
        # — recorded in the header; decode rebuilds per the file's
        # value, so instances can decode files with any topk.
        # Default follows the coder PROFILE: serving profiles
        # (speed/balanced) code with top-4 mixtures — the dominant
        # row-build/lookup cost scales with K, and K=10 -> 4 measured
        # dec rgb scale-0 121 -> 74 ms and enc units 52 -> 24 ms at
        # the bench shape for +0.27% bitrate on the converged model —
        # while the bitrate-headline profile (size) keeps the full
        # mixture. Explicit coder_topk / L3C_CODER_TOPK override both.
        profile = coder_profile or tc.CODER_PROFILE
        default_topk = 0 if profile == "size" else 4
        env_topk = os.environ.get("L3C_CODER_TOPK")
        if coder_topk is not None:
            self.coder_topk = int(coder_topk)
        elif env_topk is not None:
            self.coder_topk = int(env_topk)
        else:
            self.coder_topk = default_topk
        # serving visibility: the effective mixture truncation changes
        # coded bytes (+0.27% at topk4), so say it once per process
        key_log = (profile, self.coder_topk)
        if key_log not in _TOPK_LOGGED:
            _TOPK_LOGGED.add(key_log)
            print(f"[codec v{self.VERSION}] profile={profile} "
                  f"coder_topk={self.coder_topk} "
                  f"({'full mixture' if not self.coder_topk else 'top-'
                     + str(self.coder_topk) + ' renormalized'})",
                  file=sys.stderr)

        def _get_P_int(p, bn, decF, s, topk):
            ls, dec_F = self.net.apply(p, s, bn, decF,
                                       method=MultiscaleNetwork.get_P)
            spec = (self._rgb if (s == 0 or cfg.rgb_bicubic_baseline)
                    else self._bn)
            C = 3 if (s == 0 or cfg.rgb_bicubic_baseline) else cfg.q.C
            return ic.pack_int_params(spec, ls, C, topk), dec_F
        self._get_P_cache = {}

        def get_P(s: int, topk: int):
            key = (s, topk)
            if key not in self._get_P_cache:
                self._get_P_cache[key] = jax.jit(
                    lambda p, bn, decF: _get_P_int(p, bn, decF, s, topk))
            return self._get_P_cache[key]
        self._get_P = get_P
        # per-unit-geometry predicted fetch widths (optimistic single-
        # transfer fetch; see encode_batch_async)
        self._width_pred = {}
        # None -> L3C_CODER_PROFILE/balanced; eval passes 'size'
        self.coder_profile = coder_profile
        self._init_coder_jits()

    def _init_coder_jits(self):
        # ---- coder jits. With the v8 exact-integer evaluator there is
        # no standalone table-builder program left: encode fuses the
        # 2-edge lookups into its rANS scan programs, decode builds full
        # rows inside its scan programs — identical values by
        # construction (ops.int_coder). Grouping/concat/lookup fold into
        # the same programs: each eager op on the axon backend is a
        # separate relay dispatch (~2-6ms). T is per-unit (t_policy on
        # encode, the unit header on decode).
        self._enc_uni = jax.jit(
            lambda syms, L, n, G, T: tc.encode_uniform(
                syms, L, tc.layout_for(n, G, T)),
            static_argnums=(1, 2, 3, 4))
        self._dec_uni = jax.jit(
            lambda words, L, n, G, T: tc.decode_uniform(
                words, L, tc.layout_for(n, G, T)),
            static_argnums=(1, 2, 3, 4))

        def enc_bn_unit(ip, syms_nhwc, T):
            # (F,h,w,C) bottleneck syms -> 2-edge lookups + one fused
            # rANS scan, ONE program (no rows anywhere)
            F, h, w, C = syms_nhwc.shape
            syms_cm = syms_nhwc.transpose(3, 0, 1, 2).reshape(C, -1)
            start, freq = ic.bn_lookup(ip, syms_cm.astype(jnp.int32),
                                       C, self._bn.L)
            return tc.encode_sf(start, freq,
                                tc.layout_for(h * w, C * F, T))
        self._enc_bn_unit = jax.jit(enc_bn_unit, static_argnums=(2,))

        def dec_uni_unit(flat, off, T, h, w, F, C, L, cols, baseline):
            rows = C * F * tc.layout_for(h * w, 1, T).ns_c
            words = _unpad_dev(flat, off, rows, cols)
            syms = tc.decode_uniform(words, L,
                                     tc.layout_for(h * w, C * F, T))
            syms = _ungroup_syms(syms, F, h, w)
            if baseline:
                mean = jnp.asarray(255.0 * layers.RGB_MEAN, jnp.float32)
                return syms.astype(jnp.float32) - mean
            return levels_select(self._bn_levels, syms)
        self._dec_uni_unit = jax.jit(
            dec_uni_unit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))

        def dec_bn_unit(flat, off, ip, T, h, w, F, C, L, cols):
            # unpad + in-program row build + decode scan + ungroup +
            # levels lookup, ONE program
            rows = C * F * tc.layout_for(h * w, 1, T).ns_c
            words = _unpad_dev(flat, off, rows, cols)
            tables = ic.bn_rows(ip, C, L)
            syms = tc.decode_channels(tables, words, L,
                                      tc.layout_for(h * w, C * F, T))
            return levels_select(self._bn_levels,
                                 _ungroup_syms(syms, F, h, w))
        self._dec_bn_unit = jax.jit(
            dec_bn_unit, static_argnums=(3, 4, 5, 6, 7, 8, 9))

        def _dec_syms_of(decoded, c):
            # already-decoded channel symbols for the lambda chain
            return tuple(decoded[..., j].reshape(-1) for j in range(c))

        def dec_rgb_channel(ip, decoded, w_coarse, w_fine, c, T_c, T_f,
                            h, w, F, out="syms"):
            # channel c's FULL two-level decode in ONE program: coarse
            # rows (built in-program from IntParams + decoded channels)
            # + coarse scan -> a, conditional fine rows from a + fine
            # scan -> b, s = 16a + b written into the running symbol
            # image. Exact-integer rows (ops.int_coder) are program-
            # shape-independent, so fusing the two levels cannot change
            # the CDFs — it only removes a dispatch round-trip per
            # channel (6 -> 3 programs on the decode critical path).
            # out (static): the last channel also folds the consumer
            # cast — "u8" (final image) / "bn" (RGB-baseline mean
            # shift) — saving one more dispatch.
            n = h * w
            dec = _dec_syms_of(decoded, c)
            ct = ic.rgb_coarse_rows(ip, c, dec)
            nsc = tc.layout_for(n, 1, T_c).ns_c
            wc = jax.lax.slice_in_dim(w_coarse, c * F * nsc,
                                      (c + 1) * F * nsc, axis=0)
            a_flat = tc.decode_channels(
                ct, wc, tc.N_COARSE,
                tc.layout_for(n, F, T_c)).reshape(-1)
            ft = ic.rgb_fine_rows(ip, c, dec, a_flat)
            nsf = tc.layout_for(n, 1, T_f).ns_c
            wf = jax.lax.slice_in_dim(w_fine, c * F * nsf,
                                      (c + 1) * F * nsf, axis=0)
            b_ = tc.decode_channels(ft, wf, 1 << tc.FINE_BITS,
                                    tc.layout_for(n, F, T_f))
            s_c = ((a_flat.reshape(F, h, w) << tc.FINE_BITS)
                   | b_.reshape(F, h, w))
            # static-channel insert as a concat (an .at[].set lowers to
            # a scatter — slow serial unit — at full image shape)
            decoded = jnp.concatenate(
                [decoded[..., :c], s_c[..., None], decoded[..., c + 1:]],
                axis=-1)
            if out == "u8":                   # final scale-0 channel
                return decoded.astype(jnp.uint8)
            if out == "bn":                   # RGB-baseline inner scale
                mean = jnp.asarray(255.0 * layers.RGB_MEAN, jnp.float32)
                return decoded.astype(jnp.float32) - mean
            return decoded
        self._dec_rgb_channel = jax.jit(
            dec_rgb_channel, static_argnums=(4, 5, 6, 7, 8, 9, 10))

        self._zeros_i32 = jax.jit(
            lambda shape: jnp.zeros(shape, jnp.int32),
            static_argnums=(0,))

        # Both scale-0/RGB units' scans merged into ONE rANS scan over
        # the concatenated lane stack (coarse + fine streams encode
        # independently, so stacking them just widens the scan — half
        # the sequential scan steps of the dominant encode stage).
        # Every lane's stream bytes are unchanged; L3C_ENC_FUSED=0
        # restores the two-scan layout for on-chip A/B.
        enc_fused = os.environ.get("L3C_ENC_FUSED", "1") == "1"

        def enc_rgb_units(ip, target, T):
            # both scale-0/RGB units (coarse + fine) in ONE program:
            # symbol split, per-channel 2-edge lookups with the lambda
            # chain on target symbols, grouping, and the scan(s) —
            # no rows anywhere
            F, h, w, _ = target.shape
            lay = tc.layout_for(h * w, 3 * F, T)
            t_i = target.astype(jnp.int32)
            a = t_i >> tc.FINE_BITS
            bsym = t_i & ((1 << tc.FINE_BITS) - 1)
            sc_, fc_, sf_, ff_ = [], [], [], []
            for c in range(3):
                dec = tuple(t_i[..., j].reshape(-1) for j in range(c))
                a_c = a[..., c].reshape(-1)
                b_c = bsym[..., c].reshape(-1)
                s1, f1 = ic.rgb_coarse_lookup(ip, c, dec, a_c)
                s2, f2 = ic.rgb_fine_lookup(ip, c, dec, a_c, b_c)
                sc_.append(s1), fc_.append(f1)
                sf_.append(s2), ff_.append(f2)
            if enc_fused:
                lay6 = tc.layout_for(h * w, 6 * F, T)
                w6, l6 = tc.encode_sf(jnp.concatenate(sc_ + sf_),
                                      jnp.concatenate(fc_ + ff_), lay6)
                half = 3 * F * lay.ns_c
                return (jax.lax.slice_in_dim(w6, 0, half, axis=0),
                        jax.lax.slice_in_dim(l6, 0, half, axis=0),
                        jax.lax.slice_in_dim(w6, half, 2 * half, axis=0),
                        jax.lax.slice_in_dim(l6, half, 2 * half, axis=0))
            wc, lc = tc.encode_sf(jnp.concatenate(sc_),
                                  jnp.concatenate(fc_), lay)
            wf, lf = tc.encode_sf(jnp.concatenate(sf_),
                                  jnp.concatenate(ff_), lay)
            return wc, lc, wf, lf
        self._enc_rgb_units = jax.jit(enc_rgb_units, static_argnums=(2,))

    def _canary(self) -> int:
        return contract_canary(self._rgb, self._bn, self.cfg.q.C,
                               self.cfg.prob.K, self.coder_topk)

    def _put(self, arr: np.ndarray) -> jnp.ndarray:
        if self._device is not None:
            return jax.device_put(arr, self._device)
        return jnp.asarray(arr)

    def _enc_forward_impl(self, params, x_u8):
        # the image crosses the host link as uint8 (4x less traffic than
        # float32 through the tunnel); all casting happens on device
        x = x_u8.astype(jnp.float32)
        enc_outs = self.net.apply(params, layers.sub_rgb_mean(x),
                                  method=MultiscaleNetwork.enc_forward)
        return [(eo.syms, eo.bn_q) for eo in enc_outs]

    def _enc_head_impl(self, params, x_u8, T_u):
        # forward pyramid + the uniform coarsest unit in one program.
        # The forward's floats only pick the integer syms that get
        # WRITTEN to the file (decode never recomputes them), so unlike
        # get_P/tables it is free to fuse with the exact integer scan.
        per_scale = self._enc_forward_impl(params, x_u8)
        syms_c = per_scale[-1][0]
        n_u = syms_c.shape[1] * syms_c.shape[2]
        uni_L = self._rgb.L if self.cfg.rgb_bicubic_baseline else self._bn.L
        uni_C = 3 if self.cfg.rgb_bicubic_baseline else self.cfg.q.C
        F = syms_c.shape[0]
        uni = tc.encode_uniform(_group_syms(syms_c), uni_L,
                                tc.layout_for(n_u, uni_C * F, T_u))
        return per_scale, uni

    # ------------------------------------------------------------ encode

    def encode(self, img: np.ndarray, pout: str) -> float:
        """Encode one image (auto-crops big ones into .partN files)."""
        if img.ndim == 3:
            img = img[None]
        assert img.shape[0] == 1 and img.shape[3] == 3, img.shape
        if auto_crop.needs_crop(img):
            comb = auto_crop.CropLossCombinator()
            unit_sums: List[int] = []
            for i, crop in enumerate(auto_crop.iter_crops(img)):
                bpsp = self.encode(crop,
                                   pout + part_suffix.make_part_suffix(i))
                comb.add(bpsp, int(np.prod(crop.shape[1:3])))
                part_units = self.last_unit_bytes[0]
                if not unit_sums:
                    unit_sums = list(part_units)
                else:
                    unit_sums = [a + b for a, b in
                                 zip(unit_sums, part_units)]
            # whole-image per-unit bytes = sum over the part files
            self.last_unit_bytes = [unit_sums]
            return comb.get_bpsp()
        return self.encode_batch([img], [pout])[0]

    def encode_batch(self, imgs: Sequence[np.ndarray],
                     pouts: Sequence[str]) -> List[float]:
        """Encode B same-shape images together (one fused device pass)."""
        handle = self.encode_batch_async(imgs, pouts)
        return self.encode_batch_finish(handle)

    def stage_batch(self, imgs: Sequence[np.ndarray]):
        """Pad + upload a batch of same-shape images ONCE; the returned
        staging handle feeds encode_batch_async(staged=...) and
        verify_batch_async. For device-resident serving pipelines
        (decoded pixels consumed by a TPU model, never fetched) and the
        bench's device-ceiling mode: pixel bytes cross the host link
        exactly once instead of once per use."""
        B = len(imgs)
        F = fbatch_for(B)
        padded_list, pad_tuples = [], []
        for im in imgs:
            im = im if im.ndim == 4 else im[None]
            pd, tup = pad_mod.pad(np.asarray(im), self.cfg.padding_fac,
                                  "constant")
            padded_list.append(pd[0])
            pad_tuples.append(tup)
        # pad the batch to the physical fbatch by repeating image 0;
        # dummy slots are coded too (their streams are never written).
        padded = np.stack(padded_list + [padded_list[0]] * (F - B))
        # ONE uint8 upload; float/int views are derived on device
        return dict(x=self._put(padded), pad_tuples=pad_tuples,
                    B=B, F=F)

    def encode_batch_async(self, imgs: Optional[Sequence[np.ndarray]],
                           pouts: Sequence[str], staged=None):
        """Dispatch the device work for a batch; returns a handle for
        encode_batch_finish. Dispatch batch i+1 before finishing batch i
        to overlap device compute with host fetch/write (pipelining).
        Pass staged=stage_batch(...) (imgs=None) to encode from
        device-resident pixels without re-uploading them."""
        if staged is None:
            assert imgs is not None and len(imgs) == len(pouts)
            staged = self.stage_batch(imgs)
        B, F = staged["B"], staged["F"]
        assert B == len(pouts)
        pad_tuples = staged["pad_tuples"]
        for p in pouts:
            assert not os.path.isfile(p), p
        x = staged["x"]
        _, H, W, _ = x.shape
        S = self.cfg.num_scales
        C_bn = self.cfg.q.C

        baseline = self.cfg.rgb_bicubic_baseline
        units = []       # (words, lens)
        units_C = []     # channels per unit, for the per-image file split
        uni_C = 3 if baseline else C_bn
        units_T = []     # per-unit stream length (written to the file)
        T_uni = tc.t_policy((H >> S) * (W >> S), self.coder_profile)
        with self.times.run("[-] forward+uniform"):
            per_scale, uni = self._enc_head(self.params, x, T_uni)
            units.append(uni)
            units_C.append(uni_C)
            units_T.append(T_uni)
            _sync(uni[0])

        dec_F_prev = None
        bn_prev = per_scale[S - 1][1]
        for scale in reversed(range(S)):
            with self.times.prefix_scope(f"[{scale}]"):
                with self.times.run("get_P"):
                    ip, dec_F_prev = self._get_P(scale, self.coder_topk)(
                        self.params, bn_prev, dec_F_prev)
                    _sync(ip.p)
                if scale == 0:
                    target = x  # the uint8 upload; split on device
                else:
                    target = per_scale[scale - 1][0]
                    bn_prev = per_scale[scale - 1][1]
                n = target.shape[1] * target.shape[2]
                with self.times.run("lookups+rans"):
                    T_u = tc.t_policy(n, self.coder_profile)
                    if scale == 0 or baseline:
                        # RGB targets, two-level: coarse + fine 2-edge
                        # lookups (lambda chain on the true channel
                        # symbols) + both scans, ONE dispatch
                        wc, lc, wf, lf = self._enc_rgb_units(
                            ip, target, T_u)
                        units.append((wc, lc))
                        units_C.append(3)
                        units_T.append(T_u)
                        units.append((wf, lf))
                        units_C.append(3)
                        units_T.append(T_u)
                    else:
                        units.append(self._enc_bn_unit(
                            ip, target, T_u))
                        units_C.append(C_bn)
                        units_T.append(T_u)
                _sync(units[-1][0])

        # ---- optimistic single-transfer fetch plan: slice every unit's
        # word array to a PREDICTED width (last batch's used width for
        # the same unit geometry; full width when unseen) and dispatch
        # ONE device-side concat of [all lengths (as u16 pairs), all
        # sliced words] right here — the device packs while the host is
        # still writing the previous batch, and finish() pays a single
        # sync instead of two (each sync is a full tunnel round-trip).
        # If a unit's true max length overflows the prediction, finish()
        # refetches just that unit (rare: widths drift slowly across
        # batches of similar content).
        shapes = []
        parts = [jnp.concatenate(
            [u[1].astype(jnp.uint32).view(jnp.uint16).reshape(-1)
             for u in units])]
        lens_words = parts[0].shape[0]
        for ui, (words, _) in enumerate(units):
            full = words.shape[1]
            key = (ui, words.shape[0], full)
            ml = self._width_pred.get(key, full)
            shapes.append((words.shape[0], ml, full, key))
            parts.append(jax.lax.slice_in_dim(words, 0, ml,
                                              axis=1).reshape(-1))
        flat_fut = jnp.concatenate(parts)

        return dict(units=units, units_C=units_C, units_T=units_T,
                    pouts=pouts, B=B, F=F, S=S, H=H, W=W,
                    pad_tuples=pad_tuples, flat_fut=flat_fut,
                    shapes=shapes, lens_words=lens_words)

    def encode_batch_finish(self, handle) -> List[float]:
        units, units_C = handle["units"], handle["units_C"]
        units_T = handle["units_T"]
        pouts, B, F = handle["pouts"], handle["B"], handle["F"]
        S, H, W = handle["S"], handle["H"], handle["W"]
        pad_tuples = handle["pad_tuples"]
        shapes, lens_words = handle["shapes"], handle["lens_words"]
        with self.times.run("fetch"):
            flat = np.asarray(handle["flat_fut"])  # the single sync
            lens_np = []
            off = 0
            for words, _ in units:
                ns = words.shape[0]
                lens_np.append(flat[off:off + 2 * ns].view(np.uint32)
                               .astype(np.int32))
                off += 2 * ns
            assert off == lens_words, (off, lens_words)
            words_np = []
            for ui, ((words, _), (ns, ml, full, key)) in enumerate(
                    zip(units, shapes)):
                need = max(2, int(lens_np[ui].max()))
                # record the bucketed width for the NEXT batch's plan
                self._width_pred[key] = min(-(-need // 32) * 32, full)
                if need > ml:
                    # prediction overflowed: refetch this unit in full
                    words_np.append(np.asarray(words[:, :need]))
                    off += ns * ml
                    continue
                words_np.append(
                    flat[off:off + ns * ml].reshape(ns, ml)[:, :need])
                off += ns * ml
        with self.times.run("write"):
            bpsps = []
            # per-file, per-unit payload bytes (streams + framing), for
            # the --compare_theory per-scale breakdown
            self.last_unit_bytes: List[List[int]] = []
            for b, pout in enumerate(pouts):
                unit_bytes = []
                with open(pout, "wb") as fout:
                    fout.write(MAGIC)
                    fout.write(struct.pack("<BBBB", self.VERSION, S, F,
                                           self.coder_topk & 0xFF))
                    fout.write(struct.pack("<I", self._canary()))
                    fout.write(struct.pack("<4H", *pad_tuples[b]))
                    fout.write(struct.pack("<HH", H, W))
                    for ui, (words, lens) in enumerate(
                            zip(words_np, lens_np)):
                        C = units_C[ui]
                        ns_c = words.shape[0] // (C * F)
                        w_b = words.reshape(C, F, ns_c, -1)[:, b]
                        l_b = lens.reshape(C, F, ns_c)[:, b]
                        at = fout.tell()
                        _write_unit(fout, w_b.reshape(-1, w_b.shape[-1]),
                                    l_b.reshape(-1), units_T[ui])
                        # exclude the separator from the per-unit byte
                        # count used by --compare_theory (framing, not
                        # coded payload)
                        unit_bytes.append(fout.tell() - at)
                        fout.write(struct.pack("<I", MAGIC_SEP))
                # bpsp over the ORIGINAL (pre-pad) subpixels, matching
                # the reference (bitcoding.py:108) — padded pixels are a
                # codec overhead, not image content.
                pl_, pr_, pt_, pb_ = pad_tuples[b]
                n_sp = (H - pt_ - pb_) * (W - pl_ - pr_) * 3
                bpsps.append(os.path.getsize(pout) * 8 / float(n_sp))
                self.last_unit_bytes.append(unit_bytes)
            return bpsps

    def unit_scale_map(self) -> List[str]:
        """Label per file unit with the scale it codes, aligned with
        last_unit_bytes: ['uniform', 'scale_{S-1}', ..., 'scale_0',
        'scale_0'] (RGB scales contribute two units: coarse+fine)."""
        S = self.cfg.num_scales
        baseline = self.cfg.rgb_bicubic_baseline
        labels = ["uniform"]
        for s in reversed(range(S)):
            if s == 0 or baseline:
                labels += [f"scale_{s}", f"scale_{s}"]
            else:
                labels += [f"scale_{s}"]
        return labels

    # ------------------------------------------------------------ decode

    def decode(self, pin: str, _recurse_part: bool = True) -> np.ndarray:
        if _recurse_part and part_suffix.contains_part_suffix(pin):
            parts = [self.decode(p, _recurse_part=False)
                     for p in part_suffix.iter_part_paths(pin)]
            return auto_crop.stitch(parts)
        return self.decode_batch([pin])[0]

    def decode_batch(self, pins: Sequence[str]) -> List[np.ndarray]:
        """Decode B same-shape v4 files together."""
        return self.decode_batch_finish(self.decode_batch_async(pins))

    def decode_batch_async(self, pins: Sequence[str]):
        """Dispatch all device work for a batch of files; returns a
        handle for decode_batch_finish (pipeline across batches)."""
        B = len(pins)
        S_cfg = self.cfg.num_scales
        baseline0 = self.cfg.rgb_bicubic_baseline
        n_units = 1 + sum(2 if (s == 0 or baseline0) else 1
                          for s in range(S_cfg))
        headers, per_file_units = [], []
        for pin in pins:
            hdr, units = _read_file(pin, S_cfg, n_units)
            headers.append(hdr)
            per_file_units.append(units)
        S, H, W = headers[0]["S"], headers[0]["H"], headers[0]["W"]
        F = headers[0]["F"]
        for hdr in headers:
            if (hdr["S"], hdr["H"], hdr["W"]) != (S, H, W):
                raise DecodeError("decode_batch needs same-shape files")
            if hdr["F"] != F:
                raise DecodeError(
                    "decode_batch needs files with the same fbatch "
                    f"(got {hdr['F']} and {F}); decode them separately")
        if B > F:
            raise DecodeError(
                f"decoding {B} files of fbatch {F} together would change "
                f"float programs; decode in groups of <= {F}")
        topks = {hdr["topk"] for hdr in headers}
        if len(topks) != 1:
            raise DecodeError("decode_batch needs files with one "
                              f"coder topk (got {sorted(topks)})")
        topk = topks.pop()
        want = contract_canary(self._rgb, self._bn, self.cfg.q.C,
                               self.cfg.prob.K, topk)
        for pin, hdr in zip(pins, headers):
            if hdr["canary"] != want:
                raise DecodeError(
                    f"{pin}: coder-numerics canary mismatch (file "
                    f"{hdr['canary']:#010x}, this build {want:#010x}) — "
                    "the file was written by a build whose coder-"
                    "numerics contract (pack reductions / XLA lowering "
                    "/ platform) differs from this one; the file is NOT "
                    "corrupt, but this build cannot decode it without "
                    "corrupting pixels. Decode it with the build that "
                    "wrote it.")

        C_bn = self.cfg.q.C

        # DENSE single upload: only real stream words (plus a u32 per
        # row header of word offsets) cross the host link; the padded
        # (rows, cols) scan layouts are rebuilt on device by a vmap'd
        # dynamic_slice per unit (~10ms for the largest unit vs
        # hundreds of ms of tunnel time for pow2-padded uploads).
        # Row order per unit: channel-major/batch-minor, dummy physical
        # slots b >= B repeating file 0 (decoded then discarded).
        unit_Cs = [3 if baseline0 else C_bn]
        for s in reversed(range(S_cfg)):
            unit_Cs += [3, 3] if (s == 0 or baseline0) else [C_bn]
        host_units = []          # (rows, cols_b, C, T_u)
        dense_parts = []         # row payload blocks, global row order
        lens_rows = []           # per-row lengths, global row order
        for ui in range(n_units):
            Ts = {per_file_units[b][ui][0] for b in range(B)}
            if len(Ts) != 1:
                raise DecodeError(
                    f"unit {ui}: files use different stream lengths "
                    f"{sorted(Ts)}; decode them separately")
            T_u = Ts.pop()
            C = unit_Cs[ui]
            payloads = [per_file_units[b][ui][1] for b in range(B)]
            lens = [per_file_units[b][ui][2] for b in range(B)]
            ns = lens[0].shape[0]
            for ln in lens:
                if ln.shape[0] != ns:
                    raise DecodeError("stream-count mismatch in batch")
            if ns % C:
                raise DecodeError(f"unit {ui}: {ns} streams not "
                                  f"divisible by {C} channels")
            ns_c = ns // C
            cums = [np.concatenate([[0], np.cumsum(ln)]) for ln in lens]
            cols = max(2, max(int(ln.max()) for ln in lens))
            # cols is the device scan width: bucket to pow2 (bounds the
            # compile count; the decode scan's word select is O(cols))
            cols_b = 32
            while cols_b < cols:
                cols_b *= 2
            cols_b = min(cols_b, T_u + 2)
            for c in range(C):
                for bp in range(F):
                    b = bp if bp < B else 0
                    lo = int(cums[b][c * ns_c])
                    hi = int(cums[b][(c + 1) * ns_c])
                    dense_parts.append(payloads[b][lo:hi])
                    lens_rows.append(lens[b][c * ns_c:(c + 1) * ns_c])
            host_units.append((C * F * ns_c, cols_b, C, T_u))
        lens_all = np.concatenate(lens_rows).astype(np.int64)
        n_rows_total = int(lens_all.shape[0])
        hdr_words = 2 * n_rows_total
        # element offset of each row's words inside the uploaded buffer
        row_offs = (hdr_words
                    + np.concatenate([[0], np.cumsum(lens_all)])[:-1]
                    ).astype(np.uint32)
        max_cols = max(cb for _, cb, _, _ in host_units)
        flat_np = np.concatenate([
            np.stack([(row_offs & 0xFFFF).astype(np.uint16),
                      (row_offs >> 16).astype(np.uint16)],
                     axis=1).reshape(-1),
            np.concatenate(dense_parts),
            # slack so every row's (off, cols) dynamic_slice stays
            # in-bounds without clamping into earlier rows' data
            np.zeros(max_cols, np.uint16)])
        # pad the flat transfer to a power-of-two bucket: only the
        # BUCKETED length is a compile-relevant shape
        flat_len = 1 << 16
        while flat_len < flat_np.size:
            flat_len *= 2
        flat_dev = self._put(np.concatenate(
            [flat_np, np.zeros(flat_len - flat_np.size, np.uint16)]))
        unit_row_starts = np.cumsum(
            [0] + [rows for rows, _, _, _ in host_units])

        def unit_geom(ui: int, C: int) -> Tuple[int, int, int]:
            rows, cols_b, C_u, T_u = host_units[ui]
            assert C == C_u, (ui, C, C_u)
            return 2 * int(unit_row_starts[ui]), cols_b, T_u

        def unit_words(ui: int, C: int) -> Tuple[jnp.ndarray, int]:
            hdr_off, cols_b, T_u = unit_geom(ui, C)
            rows = host_units[ui][0]
            return self._unpad_unit(flat_dev, hdr_off, rows, cols_b), T_u

        baseline = self.cfg.rgb_bicubic_baseline
        h, w = H >> S, W >> S
        with self.times.run("uniform decode"):
            C0 = 3 if baseline else C_bn
            L0 = self._rgb.L if baseline else self._bn.L
            off, cols_b, T0 = unit_geom(0, C0)
            bn_prev = self._dec_uni_unit(flat_dev, off, T0, h, w, F, C0,
                                         L0, cols_b, baseline)
            _sync(bn_prev)

        dec_F_prev = None
        imgs = None
        ui = 1
        for scale in reversed(range(S)):
            with self.times.prefix_scope(f"[{scale}]"):
                with self.times.run("get_P"):
                    ip, dec_F_prev = self._get_P(scale, topk)(
                        self.params, bn_prev, dec_F_prev)
                    _sync(ip.p)
                hs, ws_ = H >> scale, W >> scale
                with self.times.run("rows+rans"):
                    if scale == 0 or baseline:
                        w_coarse, T_c = unit_words(ui, 3)
                        w_fine, T_f = unit_words(ui + 1, 3)
                        ui += 2
                        # uint8 on device for scale 0: the decoded
                        # image crosses the host link at 1 byte per
                        # subpixel; the cast/mean-shift is fused into
                        # the last channel's program
                        rgb = self._decode_rgb(
                            ip, w_coarse, w_fine, F, hs, ws_, T_c, T_f,
                            out="u8" if scale == 0 else "bn")
                        if scale == 0:
                            imgs = rgb
                        else:
                            bn_prev = rgb
                    else:
                        off, cols_b, T_u = unit_geom(ui, C_bn)
                        ui += 1
                        bn_prev = self._dec_bn_unit(
                            flat_dev, off, ip, T_u, hs, ws_, F,
                            C_bn, self._bn.L, cols_b)
                    _sync(imgs if scale == 0 else bn_prev)

        return dict(imgs=imgs, headers=headers, B=B)

    def decode_batch_finish(self, handle) -> List[np.ndarray]:
        B = handle["B"]
        with self.times.run("fetch images"):
            imgs = np.asarray(handle["imgs"][:B])  # uint8 on device
        out = []
        for b in range(B):
            im = imgs[b:b + 1]
            tup = handle["headers"][b]["pad"]
            if any(tup):
                im = pad_mod.undo_pad(im, *tup)
            out.append(im)
        return out

    def verify_batch_async(self, dec_handle, staged):
        """On-device round-trip verification: compare the decoded
        device-resident images against the staged originals WITHOUT
        fetching pixels — only 8 bytes (all-equal flag + a u32 content
        hash of the decoded buffer) ever cross the host link. This is
        the consumer of record for device-resident serving (decoded
        pixels feeding a TPU model stay in HBM; the reference's decode
        always lands in host RAM because its consumer is the CPU)."""
        if self._verify_jit is None:
            @jax.jit
            def vfn(dec, ref):
                eq = jnp.all(dec == ref)
                flat = dec.astype(jnp.uint32).reshape(-1)
                w = (jnp.arange(flat.size, dtype=jnp.uint32)
                     * jnp.uint32(2654435761)) | jnp.uint32(1)
                h = jnp.sum(flat * w, dtype=jnp.uint32)  # wraps mod 2^32
                return jnp.stack([eq.astype(jnp.uint32), h])
            self._verify_jit = vfn
        return self._verify_jit(dec_handle["imgs"], staged["x"])

    @staticmethod
    def verify_batch_finish(vh) -> Tuple[bool, int]:
        out = np.asarray(vh)
        return bool(out[0]), int(out[1])

    def _decode_rgb(self, ip, w_coarse, w_fine, F, hs, ws, T_c, T_f,
                    out="syms"):
        """Channel-sequential two-level RGB decode with the lambda
        chain on decoded SYMBOLS: per channel, build the 16-entry
        coarse rows in-program and decode a, build the conditional fine
        rows from a and decode b, reconstruct s = 16a + b. All exact-
        integer math (ops.int_coder) — rows equal the encoder's 2-edge
        lookups by construction. out: consumer cast fused into the
        last channel's program ("u8" image / "bn" mean-shifted).

        (A fully-fused single-scan variant — all 6 streams advanced
        per step — measured 17% SLOWER on device: in-scan row math
        wastes VPU width vs the embarrassingly-parallel prebuild
        programs; RESULTS.md round-3 session 4. Deleted in round 4.)"""
        decoded = self._zeros_i32((F, hs, ws, 3))
        for c in range(3):
            decoded = self._dec_rgb_channel(
                ip, decoded, w_coarse, w_fine, c, T_c, T_f,
                hs, ws, F, out if c == 2 else "syms")
        return decoded


# ------------------------------------------------------------------ io


def _write_unit(fout, words: np.ndarray, lengths: np.ndarray, T: int):
    """words (NS, >=max(len)) u16 padded; lengths (NS,) words used.

    v5 unit header: T u16 | n_streams u32 | length block | payload.
    Length block: mode u8 — 0: base u16 + per-stream u8 deltas (the
    common case; halves the per-stream length overhead vs raw u16),
    1: raw u16 lengths (delta spread > 255)."""
    ns, cols = words.shape
    fout.write(struct.pack("<HI", T, ns))
    lengths = lengths.astype(np.int64)
    base = int(lengths.min()) if ns else 0
    spread = int(lengths.max() - base) if ns else 0
    if spread <= 255:
        fout.write(struct.pack("<BH", 0, base))
        fout.write((lengths - base).astype(np.uint8).tobytes())
    else:
        fout.write(struct.pack("<B", 1))
        fout.write(lengths.astype("<u2").tobytes())
    mask = np.arange(cols)[None, :] < lengths[:, None]
    fout.write(words[mask].astype("<u2").tobytes())  # stream-major


def _read_unit(fin):
    """-> (T, payload u16 DENSE stream-major, lengths int64 per stream).

    The payload stays dense: the decoder uploads it as-is and re-pads
    to the (rows, cols) scan layout ON DEVICE (vmap'd dynamic_slice),
    so only real stream bytes cross the host link."""
    T, ns = struct.unpack("<HI", fin.read(6))
    if ns == 0 or ns > 1 << 24:
        raise DecodeError(f"bad stream count {ns}")
    if T < 8 or T % 8:
        raise DecodeError(f"bad stream length {T}")
    mode, = struct.unpack("<B", fin.read(1))
    if mode == 0:
        base, = struct.unpack("<H", fin.read(2))
        deltas = np.frombuffer(fin.read(ns), np.uint8)
        lengths = base + deltas.astype(np.int64)
    elif mode == 1:
        lengths = np.frombuffer(fin.read(2 * ns), "<u2").astype(np.int64)
    else:
        raise DecodeError(f"bad length-block mode {mode}")
    total = int(lengths.sum())
    payload = np.frombuffer(fin.read(2 * total), "<u2")
    if payload.size != total:
        raise DecodeError("truncated stream payload")
    if (lengths < 2).any():
        raise DecodeError("stream shorter than its rANS state")
    return T, payload, lengths


def _read_file(pin: str, expect_scales: int, n_units: int):
    with open(pin, "rb") as fin:
        if fin.read(4) != MAGIC:
            raise DecodeError("bad magic")
        version, S, F, topk = struct.unpack("<BBBB", fin.read(4))
        if version != TpuBitcoding.VERSION:
            raise DecodeError(f"file is format v{version}; this is "
                              f"the v{TpuBitcoding.VERSION} (TPU) decoder")
        if S != expect_scales:
            raise DecodeError("scale count mismatch")
        if F not in FBATCHES:
            raise DecodeError(f"bad fbatch {F}")
        canary, = struct.unpack("<I", fin.read(4))
        pad_tuple = struct.unpack("<4H", fin.read(8))
        H, W = struct.unpack("<HH", fin.read(4))
        units = []
        for _ in range(n_units):
            units.append(_read_unit(fin))
            _expect_sep(fin)
    return {"S": S, "H": H, "W": W, "F": F, "pad": pad_tuple,
            "canary": canary, "topk": topk}, units


def _expect_sep(fin):
    sep, = struct.unpack("<I", fin.read(4))
    if sep != MAGIC_SEP:
        raise DecodeError("magic separator mismatch — corrupt stream")
