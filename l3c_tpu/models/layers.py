"""Building-block layers: torch-semantics convs, ResBlock, pixel-shuffle.

TPU-native equivalents of /root/reference/src/modules/edsr.py (ResBlock,
Upsampler, MeanShift) and pytorch_ext.default_conv (pytorch_ext.py:57-61).
Everything is NHWC (TPU-preferred layout: the channel dim rides the 128-lane
axis and convs lower onto the MXU).

Conv semantics match torch's `Conv2d(padding=k//2 if rate==1 else rate,
dilation=rate, stride=s)` via explicit padding tuples (XLA's 'SAME' differs
for stride 2, so we never use it). Kernel init is the kaiming-uniform
equivalent (variance_scaling(1/3, fan_in, uniform) == U(+-1/sqrt(fan_in))),
matching torch Conv2d defaults so training dynamics line up.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# U(+-sqrt(3 * (1/3) / fan_in)) == U(+-1/sqrt(fan_in)), torch's kaiming
# uniform with a=sqrt(5) on conv weights.
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")

# RGB statistics used for input normalization (multiscale_network.py:181,
# net.py:69-70; values from EDSR / DIV2K, scaled by 255 at use sites).
RGB_MEAN = np.asarray((0.4488, 0.4371, 0.4040), np.float32)


def conv(features: int, kernel_size: int, stride: int = 1, rate: int = 1,
         use_bias: bool = True, name: Optional[str] = None,
         dtype=None) -> nn.Conv:
    """default_conv equivalent: same-pad (dilation-aware), NHWC.

    dtype: compute dtype (params stay float32); bfloat16 runs the MXU
    at full rate."""
    pad = kernel_size // 2 if rate == 1 else rate
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(rate, rate),
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        dtype=dtype,
        name=name,
    )


class ResBlock(nn.Module):
    """conv-ReLU-conv with identity skip (edsr.py:63-89, bn/atrous off)."""
    n_feats: int
    kernel_size: int = 3
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        r = conv(self.n_feats, self.kernel_size, name="conv1",
                 dtype=self.dtype)(x)
        r = nn.relu(r)
        r = conv(self.n_feats, self.kernel_size, name="conv2",
                 dtype=self.dtype)(r)
        return x + r


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel shuffle with torch channel-ordering semantics.

    torch (NCHW): out[n, c, r*h+i, r*w+j] = in[n, c*r*r + i*r + j, h, w].
    Here the trailing channel index decomposes the same way so imported
    checkpoints produce identical images.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


class Upsampler(nn.Module):
    """conv(C -> 4C, 3x3) + PixelShuffle(2) per x2 factor (edsr.py:92-119)."""
    n_feats: int
    scale: int = 2
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        assert self.scale & (self.scale - 1) == 0, "power-of-two scales only"
        n_ups = int(np.log2(self.scale))
        for i in range(n_ups):
            x = conv(4 * self.n_feats, 3, name=f"up{i}",
                     dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
        return x


class StackedAtrousConvs(nn.Module):
    """Parallel dilated convs (rates 1,2,4) concat + 1x1 projection.

    Mirrors prob_clf.StackedAtrousConvs (prob_clf.py:55-73); the concat
    ordering follows the rate order for checkpoint-import parity.
    """
    rates: Sequence[int]
    Cin: int
    Cout: int
    kernel_size: int = 3
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        branches = [conv(self.Cin, self.kernel_size, rate=r,
                         name=f"atrous{i}", dtype=self.dtype)(x)
                    for i, r in enumerate(self.rates)]
        x = jnp.concatenate(branches, axis=-1)
        # final projection back in float32: the Kp mixture parameters
        # keep full precision even under bfloat16 compute
        return conv(self.Cout, 1, name="lin")(x.astype(jnp.float32))


def sub_rgb_mean(x: jax.Array) -> jax.Array:
    """x - 255*rgb_mean: input normalization (multiscale_network.py:241)."""
    return x - jnp.asarray(255.0 * RGB_MEAN, x.dtype)


def add_rgb_mean(x: jax.Array) -> jax.Array:
    return x + jnp.asarray(255.0 * RGB_MEAN, x.dtype)


def bicubic_downsample_x2(x_rgb_0_255: jax.Array) -> jax.Array:
    """Bicubic x0.5 downsample of an NHWC [0,255] image, on-device.

    Bit-exact replica of PIL's two-pass BICUBIC reduction — the
    preprocessing the reference's RGB baselines were trained on
    (net.py:65-80, images_loader.py:277-288) — so imported released
    RGB/RGB-Shared checkpoints see EXACTLY the inputs they expect.
    All-integer (Pillow's own fixed-point algorithm): per-pass 22-bit
    integer coefficients, int32 accumulate, horizontal pass clipped to
    uint8 BEFORE the vertical pass. A float jax.image.resize matches
    only to ~3 LSB on ~0.05% of pixels (measured) precisely because it
    skips that intermediate quantization; integer math is also
    program-shape-independent, the same determinism contract as
    ops.int_coder. Keeping it on-device removes a host round-trip per
    scale.
    """
    n, h, w, c = x_rgb_0_255.shape
    x = jnp.clip(jnp.round(x_rgb_0_255.astype(jnp.float32)), 0, 255)\
        .astype(jnp.int32)
    t = _pil_pass_x2(x, axis=2)                  # horizontal (PIL order)
    return _pil_pass_x2(t, axis=1).astype(jnp.float32)


_PIL_PREC = 22  # Pillow PRECISION_BITS = 32 - 8 - 2


def _pil_x2_rows(in_size: int) -> list:
    """Pillow precompute_coeffs for BICUBIC at exactly x2: per output
    pixel (xmin, int32 coefficient vector), weights normalized over the
    clipped window then rounded to 22-bit fixed point (ResampleHorizontal
    in Pillow's Resample.c). At x2 every interior output shares one
    8-tap kernel; only the first/last two differ."""
    out_size = in_size // 2
    assert in_size == 2 * out_size, "PIL-exact path needs even extents"

    def keys(t, a=-0.5):
        t = abs(t)
        if t < 1.0:
            return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
        if t < 2.0:
            return (((t - 5.0) * t + 8.0) * t - 4.0) * a
        return 0.0

    rows = []
    for i in range(out_size):
        center = 2.0 * i + 1.0
        xmin = max(0, int(center - 4.0 + 0.5))     # C trunc-toward-zero
        xmax = min(in_size, int(center + 4.0 + 0.5))
        w = np.array([keys((x - center + 0.5) / 2.0)
                      for x in range(xmin, xmax)])
        w = w / w.sum()
        k = np.where(w < 0, w * (1 << _PIL_PREC) - 0.5,
                     w * (1 << _PIL_PREC) + 0.5).astype(np.int32)
        rows.append((xmin, k))
    return rows


def _pil_pass_x2(x: jax.Array, axis: int) -> jax.Array:
    """One Pillow resample pass (int32 in, uint8-valued int32 out).

    acc range: 255 * sum|k| + 2^21 <= 255 * 1.3 * 2^22 + 2^21 < 2^31,
    so int32 accumulation is exact; >> is arithmetic (floor), and
    Pillow's clip8 returns 0 for any acc <= 0, which clip-after-shift
    reproduces (negative floor-shift stays negative)."""
    in_size = x.shape[axis]
    rows = _pil_x2_rows(in_size)
    out_size = len(rows)
    half = jnp.int32(1 << (_PIL_PREC - 1))

    def window(start, taps, stride=1):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + stride * (taps - 1) + 1, stride)
        return x[tuple(idx)]

    def one_output(xmin, k):
        acc = half
        for d in range(len(k)):
            acc = acc + jnp.int32(int(k[d])) * window(xmin + d, 1)
        return acc

    # outputs whose window is clipped at a border (first/last two);
    # everything between shares the full 8-tap kernel at offset 2i-3
    special = {i for i in range(out_size)
               if rows[i][0] != 2 * i - 3 or len(rows[i][1]) != 8}
    interior = [i for i in range(out_size) if i not in special]
    pieces = []
    i = 0
    while i < out_size:
        if i in special:
            pieces.append(one_output(*rows[i]))
            i += 1
        else:
            i0, i1 = interior[0], interior[-1]
            k = rows[i0][1]
            acc = half
            for d in range(8):
                acc = acc + jnp.int32(int(k[d])) \
                    * window(2 * i0 - 3 + d, i1 - i0 + 1, stride=2)
            pieces.append(acc)
            i = i1 + 1
    out = jnp.concatenate(pieces, axis=axis)
    return jnp.clip(jnp.right_shift(out, _PIL_PREC), 0, 255)
