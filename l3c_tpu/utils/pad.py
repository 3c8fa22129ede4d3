"""Pad H,W of an NHWC image to a multiple of `fac`; undo on the way out.

Mirrors /root/reference/src/helpers/pad.py:23-59 (split padding top/bottom
and left/right, return the padding tuple) but in NHWC and as pure functions.
The codec records the tuple in the bitstream header and undoes it after
decoding (bitcoding.py:74-81, 158-161).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

PadTuple = Tuple[int, int, int, int]  # (left, right, top, bottom)


def padding_for(h: int, w: int, fac: int) -> PadTuple:
    pad_h = fac - (h % fac)
    pad_w = fac - (w % fac)
    top = bottom = left = right = 0
    if pad_h != fac:
        top = pad_h // 2
        bottom = pad_h - top
    if pad_w != fac:
        left = pad_w // 2
        right = pad_w - left
    return (left, right, top, bottom)


def pad(img, fac: int, mode: str = "replicate"):
    """Pad NHWC `img` so H and W divide `fac`.

    mode: 'replicate' (edge) or 'constant' (zeros) — the blueprint uses
    'constant' for eval/codec (multiscale_blueprint.py:140-142), the
    generic helper defaults to 'replicate' (pad.py:23).
    Returns (padded, (left, right, top, bottom)).
    """
    _, h, w, _ = img.shape
    left, right, top, bottom = padding_for(h, w, fac)
    if (left, right, top, bottom) == (0, 0, 0, 0):
        return img, (0, 0, 0, 0)
    np_mode = {"replicate": "edge", "constant": "constant"}[mode]
    widths = ((0, 0), (top, bottom), (left, right), (0, 0))
    if isinstance(img, np.ndarray):
        padded = np.pad(img, widths, mode=np_mode)
    else:
        padded = jnp.pad(img, widths, mode=np_mode)
    return padded, (left, right, top, bottom)


def undo_pad(img, left: int, right: int, top: int, bottom: int):
    """Crop an NHWC image back; inverse of `pad` (pad.py:52-59)."""
    return img[:, top : img.shape[1] - bottom, left : img.shape[2] - right, :]
