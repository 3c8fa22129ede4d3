"""The multiscale L3C network as a single flax module (NHWC, jit-first).

TPU-native redesign of /root/reference/src/modules/multiscale_network.py,
net.py, head.py and prob_clf.py. Differences from the reference that matter:

- One flax module tree; the full forward (all encoders fine->coarse, all
  decoders coarse->fine, all probability classifiers) is ONE jittable
  function returning an `Out` pytree — no Python-side module orchestration
  at step time, XLA sees the whole graph and fuses across scales.
- setup()-style submodules so the same parameters serve three entry points:
  `__call__` (training/eval forward), `enc_forward` (codec encode side),
  and `get_P` (codec decode side, one decoder+classifier application per
  scale, multiscale_network.py:308-322).
- NHWC layout; the bottleneck C=5 and parameter channels Kp ride the lane
  axis.

Structure per scale s (net.py:89-184):
  head:  conv(k=3) -> Cf channels (RGB scale: x/128 normalize first,
         head.py:26-59)
  enc:   conv5x5/s2 -> 8 ResBlocks + skip -> 1x1 -> C=5 -> quantizer
  dec:   1x1 C->Cf -> [+ fused finer-from-coarser feature] -> 8 ResBlocks
         + skip -> conv+pixel-shuffle x2
  clf:   3 dilated convs (1,2,4) concat -> 1x1 -> Kp  (prob_clf.py:29-74)
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import MsConfig
from . import dmll, grids, layers, quantizer


def _cdtype(cfg: MsConfig):
    """Compute dtype for conv stacks (params always float32)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


class EncOut(NamedTuple):
    """Per-scale encoder result (net.py:36-41). L lives in the config."""
    bn: jax.Array     # STE bottleneck: forward==hard, grad==soft
    bn_q: jax.Array   # hard bottleneck
    syms: jax.Array   # int32 symbols
    F: Optional[jax.Array]  # pre-quantization feature (feed_F input)
    # raw 1x1-conv bottleneck activations BEFORE quantization — the
    # signal the reference's HistogramPlot taps (net.py:114-119)
    raw: Optional[jax.Array] = None


class Out(NamedTuple):
    """Network output pytree (multiscale_network.py:54-130).

    Tuples run fine->coarse. S[0] is the int image; S[i>=1] the bottleneck
    symbols. P[i] parameterizes the mixture predicting scale i's target.
    bn[0] is the float image (the RGB-scale conditioning target).
    The coarsest scale's uniform-prior cost has no P entry — it is
    closed-form (log L per symbol).
    """
    S: Tuple[jax.Array, ...]
    bn: Tuple[jax.Array, ...]
    P: Tuple[jax.Array, ...]


class EDSRLikeEnc(nn.Module):
    """Strided downsampling encoder + quantizer (net.py:89-148)."""
    cfg: MsConfig

    def setup(self):
        c = self.cfg
        dt = _cdtype(c)
        self.down = layers.conv(c.Cf, 5, stride=2, name="down", dtype=dt)
        self.blocks = [layers.ResBlock(c.Cf, c.kernel_size, dtype=dt,
                                       name=f"block{i}")
                       for i in range(c.enc.num_blocks)]
        self.body_out = layers.conv(c.Cf, c.kernel_size, name="body_out",
                                    dtype=dt)
        self.to_q = layers.conv(c.q.C, 1, name="to_q")  # f32: bottleneck
        lo, hi = c.q.levels_range
        self.levels = jnp.asarray(grids.levels(lo, hi, c.q.L))

    def __call__(self, x) -> EncOut:
        x = self.down(x)
        r = x
        for b in self.blocks:
            r = b(r)
        r = self.body_out(r)
        F = x + r
        raw = self.to_q(F.astype(jnp.float32))
        q = quantizer.quantize(raw, self.levels, self.cfg.q.sigma)
        return EncOut(bn=q.bn, bn_q=q.bn_q, syms=q.syms, F=F, raw=raw)


class BicubicDownsamplingEnc(nn.Module):
    """RGB-pyramid encoder for the RGB baselines (net.py:65-80).

    Downsamples the (mean-shifted) image bicubically on-device; output is
    detached (stop_gradient) exactly like the reference.
    """
    cfg: MsConfig

    def __call__(self, x) -> EncOut:
        mean = jnp.asarray(255.0 * layers.RGB_MEAN, x.dtype)
        img = jnp.clip(jnp.round(x + mean), 0.0, 255.0)
        img_ds = layers.bicubic_downsample_x2(img)
        syms = img_ds.astype(jnp.int32)
        x_ds = jax.lax.stop_gradient(img_ds - mean)
        return EncOut(bn=x_ds, bn_q=x_ds, syms=syms, F=None)


class EDSRDec(nn.Module):
    """Upsampling decoder with optional fused feature (net.py:151-184)."""
    cfg: MsConfig

    def setup(self):
        c = self.cfg
        dt = _cdtype(c)
        self.head = layers.conv(c.Cf, 1, name="head", dtype=dt)
        self.blocks = [layers.ResBlock(c.Cf, c.kernel_size, dtype=dt,
                                       name=f"block{i}")
                       for i in range(c.dec.num_blocks)]
        self.body_out = layers.conv(c.Cf, c.kernel_size, name="body_out",
                                    dtype=dt)
        self.tail = layers.Upsampler(c.Cf, 2, dtype=dt, name="tail")

    def __call__(self, x, features_to_fuse=None):
        x = self.head(x)
        if features_to_fuse is not None:
            x = x + features_to_fuse
        r = x
        for b in self.blocks:
            r = b(r)
        r = self.body_out(r)
        return self.tail(x + r)


class Head(nn.Module):
    """Cin -> Cf conv; RGB variant normalizes by 128 first (head.py)."""
    cfg: MsConfig
    rgb: bool = False

    @nn.compact
    def __call__(self, x):
        if self.rgb:
            x = x / 128.0
        return layers.conv(self.cfg.Cf, self.cfg.kernel_size, name="conv",
                           dtype=_cdtype(self.cfg))(x)


class AtrousProbabilityClassifier(nn.Module):
    """Decoder feature -> mixture parameters l (prob_clf.py:29-74)."""
    cfg: MsConfig
    C: int
    rates: Tuple[int, ...] = (1, 2, 4)

    @nn.compact
    def __call__(self, x):
        Kp = dmll.non_shared_get_Kp(self.cfg.prob.K, self.C)
        return layers.StackedAtrousConvs(
            self.rates, self.cfg.Cf, Kp, self.cfg.kernel_size,
            dtype=_cdtype(self.cfg), name="atrous")(x)


class MultiscaleNetwork(nn.Module):
    """The L3C model: heads + per-scale enc/dec + prob classifiers.

    multiscale_network.py:168-322. For the RGB baselines
    (rgb_bicubic_baseline): identity heads, bicubic encoders, C=3
    classifiers, no decoder skip, optional auto-recursion of the last
    scale (RGB Shared trains one scale applied repeatedly).
    """
    cfg: MsConfig

    def setup(self):
        c = self.cfg
        S = c.num_scales
        if not c.rgb_bicubic_baseline:
            self.heads = [Head(c, rgb=(s == 0), name=f"head{s}")
                          for s in range(S)]
            self.encs = [EDSRLikeEnc(c, name=f"enc{s}") for s in range(S)]
            self.prob_clfs = [
                AtrousProbabilityClassifier(
                    c, C=(3 if s == 0 else c.q.C), name=f"clf{s}")
                for s in range(S)]
        else:
            self.heads = [None] * S
            self.encs = [BicubicDownsamplingEnc(c, name=f"enc{s}")
                         for s in range(S)]
            self.prob_clfs = [
                AtrousProbabilityClassifier(c, C=3, name=f"clf{s}")
                for s in range(S)]
        self.decs = [EDSRDec(c, name=f"dec{s}") for s in range(S)]

    # ----------------------------------------------------------- forward

    def _apply_head(self, scale: int, x):
        head = self.heads[scale]
        return x if head is None else head(x)

    def enc_forward(self, x, auto_recurse: int = 0) -> List[EncOut]:
        """Run all encoders fine->coarse. `x` is mean-subtracted NHWC."""
        forward_scales = (list(range(self.cfg.num_scales))
                          + [-1] * auto_recurse)
        enc_outs = []
        inp = x
        for scale in forward_scales:
            inp = self._apply_head(scale, inp)
            eo = self.encs[scale](inp)
            enc_outs.append(eo)
            inp = eo.F if self.cfg.enc.feed_F else eo.bn
        return enc_outs

    def dec_forward(self, dec_inputs: List[jax.Array],
                    forward_scales: List[int]) -> List[jax.Array]:
        """Run decoders coarse->fine with feature fusion; returns feats
        fine->coarse (multiscale_network.py:286-301)."""
        fuse_feat = self.cfg.dec.skip
        dec_Fs: List[jax.Array] = []
        max_scale = max(forward_scales)
        for i, scale in reversed(list(enumerate(forward_scales))):
            if (not fuse_feat) or scale == -1 or scale == max_scale:
                features_to_fuse = None
            else:
                features_to_fuse = dec_Fs[0]
            F = self.decs[scale](dec_inputs[i], features_to_fuse)
            dec_Fs.insert(0, F)
        return dec_Fs

    def __call__(self, x, train: bool = False, auto_recurse: int = 0) -> Out:
        """Full forward. `x`: NHWC float image in [0, 255]."""
        forward_scales = (list(range(self.cfg.num_scales))
                          + [-1] * auto_recurse)
        img_syms = jnp.round(x).astype(jnp.int32)
        x = layers.sub_rgb_mean(x)
        if self.cfg.rgb_bicubic_baseline:
            x = jax.lax.stop_gradient(x)

        enc_outs = self.enc_forward(x, auto_recurse)
        dec_inputs = [eo.bn if train else eo.bn_q for eo in enc_outs]
        dec_Fs = self.dec_forward(dec_inputs, forward_scales)

        Ps = tuple(self.prob_clfs[scale](dec_Fs[i])
                   for i, scale in enumerate(forward_scales))

        S = (img_syms,) + tuple(eo.syms for eo in enc_outs)
        bn = (img_syms.astype(jnp.float32),) + tuple(
            eo.bn if train else eo.bn_q for eo in enc_outs)
        return Out(S=S, bn=bn, P=Ps)

    # ------------------------------------------------------------- codec

    def get_P(self, scale: int, bn_q, dec_F_prev=None):
        """One decoder+classifier application for decode-side coding
        (multiscale_network.py:308-322). Returns (l, dec_F)."""
        assert 0 <= scale < self.cfg.num_scales
        F = self.decs[scale](bn_q, dec_F_prev)
        return self.prob_clfs[scale](F), F

    # ---------------------------------------------------------- sampling

    def sample_forward(self, x, rng, sample_scales: Tuple[int, ...],
                       partial_final: Optional[Tuple[int, ...]] = None):
        """Generative sampling (multiscale_network.py:328-406).

        Scales in `sample_scales` feed a SAMPLED bottleneck to their
        decoder instead of the encoder output; scale 0's RGB output is
        always sampled from the final mixture. With sample_scales=() only
        the RGB reconstruction is sampled; adding coarser scales samples
        more of the hierarchy (paper Fig. 5). `partial_final` keeps the
        listed channels of the coarsest sampled bottleneck real.
        Returns the sampled image in [0, 255] (N,H,W,3).
        """
        from . import dmll as dmll_mod
        cfg = self.cfg
        x = layers.sub_rgb_mean(x)
        enc_outs = self.enc_forward(x)
        S = cfg.num_scales

        rgb_spec = dmll_mod.DMLLSpec(rgb_scale=True)
        lo, hi = cfg.q.levels_range
        bn_sp = (rgb_spec if cfg.rgb_bicubic_baseline else
                 dmll_mod.DMLLSpec(rgb_scale=False, x_min=lo, x_max=hi,
                                   L=cfg.q.L))
        levels = jnp.asarray(grids.levels(lo, hi, cfg.q.L))

        prev_sample = None
        features_to_fuse = None
        out = None
        for scale in reversed(range(S)):
            if scale in sample_scales:
                if prev_sample is None:
                    # coarsest sampled scale: uniform fake bottleneck,
                    # quantized to the level grid (mn.py:382-389)
                    rng, sub = jax.random.split(rng)
                    fake = jax.random.uniform(
                        sub, enc_outs[-1].bn_q.shape, minval=-1.0,
                        maxval=1.0)
                    fake = levels[jnp.argmin(
                        (fake[..., None] - levels) ** 2, axis=-1)]
                    if partial_final:
                        for c in partial_final:
                            fake = fake.at[..., c].set(
                                enc_outs[scale].bn_q[..., c])
                    prev_sample = fake
                dec_inp = prev_sample
            else:
                dec_inp = enc_outs[scale].bn_q
            F = self.decs[scale](
                dec_inp, features_to_fuse if cfg.dec.skip else None)
            if cfg.dec.skip:
                features_to_fuse = F
            P = self.prob_clfs[scale](F)
            if scale == 0 or (scale - 1) in sample_scales:
                spec = rgb_spec if scale == 0 else bn_sp
                C = 3 if scale == 0 else cfg.q.C
                rng, sub = jax.random.split(rng)
                prev_sample = dmll_mod.sample(spec, P, C, sub)
        return prev_sample
