"""Symbol/level grids shared by the quantizer, the loss, and the codec.

These are THE single source of truth for the value<->symbol mapping. The
encoder network, the decode-side symbol reconstruction, and the C++ coder
must all agree bit-exactly on `levels[s] == to_bn(s)`; we guarantee that by
deriving every level table from the same elementary float32 expression
`s * bin_width + x_min` (one IEEE mul + one IEEE add, identical in numpy,
XLA and C++), instead of linspace (whose endpoint arithmetic differs).

Reference semantics: /root/reference/src/modules/quantizer.py:38-47 (to_sym /
to_bn), net.py:121-127 (levels = linspace(levels_range, L)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bin_width(x_min: float, x_max: float, L: int) -> float:
    """Spacing between adjacent levels, as a float32 value."""
    return float(np.float32(np.float32(x_max - x_min) / np.float32(L - 1)))


def levels(x_min: float, x_max: float, L: int) -> np.ndarray:
    """The L quantization levels as float32: levels[s] = s*bw + x_min.

    For RGB (x_min=0, x_max=255, L=256) this is exactly 0..255.
    For L3C bottlenecks (x_min=-1, x_max=1, L=25) this spans [-1, 1].
    """
    bw = np.float32(bin_width(x_min, x_max, L))
    s = np.arange(L, dtype=np.float32)
    return (s * bw + np.float32(x_min)).astype(np.float32)


def to_sym(x, x_min: float, x_max: float, L: int):
    """Map values -> integer symbol indices by uniform binning (round).

    jnp version; works on numpy arrays too. Mirrors quantizer.py:38-41.
    """
    bw = bin_width(x_min, x_max, L)
    x = jnp.clip(x, x_min, x_max)
    return jnp.round((x - x_min) / bw).astype(jnp.int32)


def to_bn(S, x_min: float, x_max: float, L: int):
    """Map integer symbols -> float32 values; inverse of to_sym on the grid.

    Bit-identical to `levels(...)[S]` by construction (same expression).
    Mirrors quantizer.py:44-47.
    """
    bw = np.float32(bin_width(x_min, x_max, L))
    return S.astype(jnp.float32) * bw + np.float32(x_min)


def to_bn_np(S: np.ndarray, x_min: float, x_max: float, L: int) -> np.ndarray:
    """Host-side (numpy) to_bn — IEEE-identical to the jnp version."""
    bw = np.float32(bin_width(x_min, x_max, L))
    return S.astype(np.float32) * bw + np.float32(x_min)


def targets_grid(x_min: float, x_max: float, L: int) -> np.ndarray:
    """The L+1 CDF evaluation points: bin edges t_l = x_min - bw/2 + l*bw.

    Mirrors coders_helpers.py:31-40 (linspace(x_min-bw/2, x_max+bw/2, L+1)),
    but again built from the single mul+add expression for determinism.
    """
    bw = np.float32(bin_width(x_min, x_max, L))
    lo = np.float32(np.float32(x_min) - bw / np.float32(2))
    l = np.arange(L + 1, dtype=np.float32)
    return (l * bw + lo).astype(np.float32)
