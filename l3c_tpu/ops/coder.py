"""ctypes binding + on-demand build of the C++ rANS entropy backend.

Replaces the reference's torchac extension packaging (torchac/setup.py +
torchac.py dispatch shim): instead of a pip-installed libtorch extension we
compile a small self-contained .so with g++ on first use (no torch, no
pybind11 — plain C ABI over numpy buffers) and cache it next to the source.

Build flags: -O3 but with -ffp-contract=off and no -ffast-math — the CDF
evaluation must be deterministic, bit-identical between the encode and
decode calls (see csrc/l3c_coder.cpp header comment).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "l3c_coder.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "libl3c_coder.so")
_BUILD_LOCK = threading.Lock()
_libs = {}

# Chunked sub-streams per channel: lets a multi-core host code chunks in
# parallel (format supports it today; execution is serial on this 1-core
# host). Kept small — each chunk costs ~8 bytes of rANS flush overhead.
DEFAULT_CHUNKS = 4


def _build(lib_path: str, force_scalar: bool) -> None:
    # -march=native is safe for stream portability: the 8-lane-tree+FMA
    # evaluator spec (csrc header comment) makes the AVX2 and scalar
    # builds bit-identical, and the v1 header's evaluator-variant byte
    # rejects any future divergence at decode instead of corrupting.
    cmd = [
        "g++", "-O3", "-shared", "-fPIC",
        "-ffp-contract=off", "-fno-unsafe-math-optimizations",
        "-march=native",
        "-o", lib_path, _SRC,
    ]
    if force_scalar:
        cmd.insert(-3, "-DL3C_FORCE_SCALAR")
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    # L3C_CODER_FORCE_SCALAR=1 selects the scalar build (tests verify it
    # produces bit-identical streams to the vectorized build).
    force_scalar = os.environ.get("L3C_CODER_FORCE_SCALAR", "0") == "1"
    if force_scalar in _libs:
        return _libs[force_scalar]
    with _BUILD_LOCK:
        if force_scalar in _libs:
            return _libs[force_scalar]
        lib_path = (_LIB.replace(".so", "_scalar.so") if force_scalar
                    else _LIB)
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
            _build(lib_path, force_scalar)
        lib = ctypes.CDLL(lib_path)
        c_i64 = ctypes.c_longlong
        c_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        c_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

        lib.l3c_encode_mixture.restype = c_i64
        lib.l3c_encode_mixture.argtypes = [
            c_f32p, c_f32p, c_f32p, ctypes.c_void_p, c_i32p,
            ctypes.c_int, ctypes.c_int, c_i64, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            c_u8p, c_i64, c_i64p]
        lib.l3c_decode_mixture.restype = ctypes.c_int
        lib.l3c_decode_mixture.argtypes = [
            c_f32p, c_f32p, c_f32p, ctypes.c_void_p, c_u8p, c_i64p,
            ctypes.c_int, ctypes.c_int, c_i64, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, c_i32p]
        lib.l3c_encode_uniform.restype = c_i64
        lib.l3c_encode_uniform.argtypes = [
            c_i32p, c_i64, ctypes.c_int, ctypes.c_int,
            c_u8p, c_i64, c_i64p]
        lib.l3c_decode_uniform.restype = ctypes.c_int
        lib.l3c_decode_uniform.argtypes = [
            c_u8p, c_i64p, c_i64, ctypes.c_int, ctypes.c_int, c_i32p]
        lib.l3c_coder_version.restype = ctypes.c_int
        lib.l3c_eval_variant.restype = ctypes.c_int
        _libs[force_scalar] = lib
        return lib


def eval_variant() -> int:
    """CDF evaluator variant of the loaded backend (v1 header byte)."""
    return int(get_lib().l3c_eval_variant())


def _lam_ptr(lam: Optional[np.ndarray]):
    if lam is None:
        return None, None
    lam = np.ascontiguousarray(lam, np.float32)
    # keep a reference alive alongside the pointer
    return lam.ctypes.data_as(ctypes.c_void_p), lam


class MixtureCoder:
    """Codes one scale's channels under a discretized logistic mixture.

    Parameters arrive as (C, HW, K) float32 arrays (pi softmaxed, mu raw,
    inv_s = exp(-clamped log_s)); `lam` is (3, HW, K) sigmoid'd lambda
    coefficients for the RGB scale or None. This mirrors what
    models.dmll.pack_coder_params emits (after an on-device transpose).
    """

    def __init__(self, L: int, x_min: float, x_max: float,
                 n_chunks: int = DEFAULT_CHUNKS):
        self.L = L
        self.x_min = float(x_min)
        self.bin_w = float(
            np.float32(np.float32(x_max - x_min) / np.float32(L - 1)))
        self.n_chunks = n_chunks

    def encode(self, pi: np.ndarray, mu: np.ndarray, inv_s: np.ndarray,
               lam: Optional[np.ndarray], syms: np.ndarray
               ) -> Tuple[bytes, np.ndarray]:
        """Returns (stream_bytes, chunk_lens[C*n_chunks])."""
        lib = get_lib()
        C, HW, K = pi.shape
        assert syms.shape == (C, HW) and syms.dtype == np.int32
        out = np.empty(C * (HW + 2 * self.n_chunks) * 4 + 64, np.uint8)
        chunk_lens = np.zeros(C * self.n_chunks, np.int64)
        lam_ptr, _lam_keepalive = _lam_ptr(lam)
        n = lib.l3c_encode_mixture(
            np.ascontiguousarray(pi), np.ascontiguousarray(mu),
            np.ascontiguousarray(inv_s), lam_ptr,
            np.ascontiguousarray(syms),
            C, K, HW, self.L, self.x_min, self.bin_w,
            self.n_chunks, out, out.size, chunk_lens)
        if n < 0:
            raise RuntimeError(f"l3c_encode_mixture failed: {n}")
        return out[:n].tobytes(), chunk_lens

    def decode(self, pi: np.ndarray, mu: np.ndarray, inv_s: np.ndarray,
               lam: Optional[np.ndarray], data: bytes,
               chunk_lens: Sequence[int]) -> np.ndarray:
        """Returns syms (C, HW) int32."""
        lib = get_lib()
        C, HW, K = pi.shape
        chunk_lens = np.asarray(chunk_lens, np.int64)
        assert chunk_lens.size == C * self.n_chunks
        syms = np.zeros((C, HW), np.int32)
        buf = np.frombuffer(data, np.uint8).copy()  # ensure aligned
        lam_ptr, _lam_keepalive = _lam_ptr(lam)
        r = lib.l3c_decode_mixture(
            np.ascontiguousarray(pi), np.ascontiguousarray(mu),
            np.ascontiguousarray(inv_s), lam_ptr,
            buf, chunk_lens,
            C, K, HW, self.L, self.x_min, self.bin_w,
            self.n_chunks, syms)
        if r != 0:
            raise RuntimeError(f"l3c_decode_mixture failed: {r}")
        return syms


class UniformCoder:
    """Uniform-prior coder for the coarsest scale (closed-form CDF)."""

    def __init__(self, L: int, n_chunks: int = DEFAULT_CHUNKS):
        self.L = L
        self.n_chunks = n_chunks

    def encode(self, syms: np.ndarray) -> Tuple[bytes, np.ndarray]:
        lib = get_lib()
        syms = np.ascontiguousarray(syms.reshape(-1).astype(np.int32))
        out = np.empty(syms.size * 4 + 8 * self.n_chunks + 64, np.uint8)
        chunk_lens = np.zeros(self.n_chunks, np.int64)
        n = lib.l3c_encode_uniform(syms, syms.size, self.L, self.n_chunks,
                                   out, out.size, chunk_lens)
        if n < 0:
            raise RuntimeError(f"l3c_encode_uniform failed: {n}")
        return out[:n].tobytes(), chunk_lens

    def decode(self, data: bytes, chunk_lens: Sequence[int],
               n: int) -> np.ndarray:
        lib = get_lib()
        chunk_lens = np.asarray(chunk_lens, np.int64)
        syms = np.zeros(n, np.int32)
        buf = np.frombuffer(data, np.uint8).copy()
        r = lib.l3c_decode_uniform(buf, chunk_lens, n, self.L,
                                   self.n_chunks, syms)
        if r != 0:
            raise RuntimeError(f"l3c_decode_uniform failed: {r}")
        return syms
