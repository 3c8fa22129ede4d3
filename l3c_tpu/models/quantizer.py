"""Soft-to-hard vector quantization with a straight-through estimator.

TPU-native reimplementation of the reference Quantizer
(/root/reference/src/modules/quantizer.py:50-90, from imgcomp-cvpr):
distances to L fixed levels, phi_soft = softmax(-sigma * d^2), soft value
sum(l * phi), hard value = nearest level. The reference implements the STE
via `x_soft.data = x_hard` (forward hard, gradient soft); here that is the
standard JAX `soft + stop_gradient(hard - soft)`.

Everything is NHWC and shaped for the VPU: the level dimension L is the
trailing axis so the softmax/reduction vectorizes over lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

SIGMA_HARD = 1e7  # parity with quantizer.py:35 (unused hard-sigma mode)


class QuantOut(NamedTuple):
    """Mirrors the reference's (x_soft, x_hard, symbols_hard) triple.

    bn:   straight-through value — forward == hard, gradient == soft.
          (In the reference, x_soft.data = x_hard makes x_soft behave
          exactly like this; it is used both as decoder input and as the
          loss target during training, quantizer.py:89-90.)
    bn_q: hard value (levels[symbols]), no gradient.
    syms: integer symbol indices, int32.
    """
    bn: jax.Array
    bn_q: jax.Array
    syms: jax.Array


def quantize(x: jax.Array, levels: jax.Array, sigma: float) -> QuantOut:
    """Quantize x (N,H,W,C) against `levels` (L,) with softness `sigma`."""
    d = (x[..., None] - levels) ** 2                    # (N,H,W,C,L)
    phi_soft = jax.nn.softmax(-sigma * d, axis=-1)      # (N,H,W,C,L)
    x_soft = jnp.sum(levels * phi_soft, axis=-1)        # (N,H,W,C)
    syms = jnp.argmin(d, axis=-1).astype(jnp.int32)     # (N,H,W,C)
    x_hard = levels_select(levels, syms)                # (N,H,W,C)
    x_ste = x_soft + jax.lax.stop_gradient(x_hard - x_soft)
    return QuantOut(bn=x_ste, bn_q=x_hard, syms=syms)


def levels_select(levels: jax.Array, syms: jax.Array) -> jax.Array:
    """levels[syms] without a gather: one-hot select + sum.

    A gather at activation shapes costs ~10 ns/element on TPU (it was
    the single largest stage inside enc_forward — 6 gathers across the
    pyramid); the one-hot masked sum is a pure VPU pass over (..., L).
    Selection copies the PRECOMPUTED table values bit-exactly (adding
    0.0 to a selected value is the identity; levels never contain -0.0
    since grids builds them as s*bw + x_min with x_min != -0), so the
    value<->symbol contract (models/grids.py) is untouched — unlike an
    inline `syms*bw + x_min`, which XLA could FMA-contract into values
    that differ from the table by 1 ulp."""
    iota = jnp.arange(levels.shape[0], dtype=syms.dtype)
    return jnp.sum(jnp.where(syms[..., None] == iota, levels, 0.0),
                   axis=-1)
