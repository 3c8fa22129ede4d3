"""Codec backends.

Two interchangeable implementations of the same capability (mirroring the
reference's torchac cpu/gpu backend split, torchac.py:39-54):

- format v2 (`TpuBitcoding`, default): entropy coding fully on-device —
  vectorized rANS streams under lax.scan; fastest on TPU, runs anywhere
  JAX runs.
- format v1 (`Bitcoding`): host C++ rANS with on-the-fly CDF evaluation;
  the portable backend, no accelerator needed beyond the network passes.

Files carry a version byte; `open_decoder` dispatches on it.
"""
from __future__ import annotations

import struct

from .bitcoding import MAGIC, Bitcoding, DecodeError
from .bitcoding2 import TpuBitcoding


def make_bitcoding(cfg, net, params, backend: str = "auto", times=None,
                   **kw):
    """backend: 'auto'|'tpu' -> format v2; 'host'|'cpu' -> format v1."""
    if backend in ("auto", "tpu", "v2"):
        return TpuBitcoding(cfg, net, params, times=times, **kw)
    if backend in ("host", "cpu", "v1"):
        return Bitcoding(cfg, net, params, times=times, **kw)
    raise ValueError(f"unknown codec backend {backend!r}")


def file_version(path: str) -> int:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise DecodeError(f"{path}: bad magic")
        return struct.unpack("<B", f.read(1))[0]


def open_decoder(path: str, cfg, net, params, times=None):
    v = file_version(path)
    if v == TpuBitcoding.VERSION:
        return TpuBitcoding(cfg, net, params, times=times)
    if v == Bitcoding.VERSION:
        return Bitcoding(cfg, net, params, times=times)
    raise DecodeError(f"{path}: unsupported format version {v}")
