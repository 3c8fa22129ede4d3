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
        c_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.l3c_encode_table.restype = c_i64
        lib.l3c_encode_table.argtypes = [
            c_i32p, c_i64, c_u32p, ctypes.c_int, ctypes.c_int,
            c_u8p, c_i64, c_i64p]
        lib.l3c_decode_table.restype = ctypes.c_int
        lib.l3c_decode_table.argtypes = [
            c_u8p, c_i64p, c_i64, c_u32p, ctypes.c_int, ctypes.c_int,
            c_i32p]
        lib.l3c_med_residuals.restype = None
        lib.l3c_med_residuals.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p]
        lib.l3c_med_reconstruct.restype = None
        lib.l3c_med_reconstruct.argtypes = [
            c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_u8p]
        lib.l3c_encode_table_ctx.restype = c_i64
        lib.l3c_encode_table_ctx.argtypes = [
            c_i32p, c_i32p, c_i64, c_u32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, c_u8p, c_i64, c_i64p]
        lib.l3c_medctx_decode.restype = ctypes.c_int
        lib.l3c_medctx_decode.argtypes = [
            c_u8p, c_i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_u8p]
        lib.l3c_medctx_contexts.restype = None
        lib.l3c_medctx_contexts.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, c_i32p]
        c_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.l3c_medctx_decode_v3.restype = ctypes.c_int
        lib.l3c_medctx_decode_v3.argtypes = [
            c_u8p, c_i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i8p,
            c_u8p]
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


class TableCoder:
    """Static-cumulative-table rANS coder: one shared (L+1) uint32
    table for every symbol of a call (cum[0]=0, cum[L]=65536). The
    entropy backend of the classical MED baseline (eval.classic)."""

    def __init__(self, cum: np.ndarray, n_chunks: int = DEFAULT_CHUNKS):
        cum = np.ascontiguousarray(cum, np.uint32)
        assert cum.ndim == 1 and cum[0] == 0 and cum[-1] == 65536
        assert (np.diff(cum.astype(np.int64)) >= 0).all()
        self.cum = cum
        self.L = cum.size - 1
        self.n_chunks = n_chunks

    def encode(self, syms: np.ndarray) -> Tuple[bytes, np.ndarray]:
        lib = get_lib()
        syms = np.ascontiguousarray(syms.reshape(-1).astype(np.int32))
        out = np.empty(syms.size * 4 + 8 * self.n_chunks + 64, np.uint8)
        chunk_lens = np.zeros(self.n_chunks, np.int64)
        n = lib.l3c_encode_table(syms, syms.size, self.cum, self.L,
                                 self.n_chunks, out, out.size, chunk_lens)
        if n < 0:
            raise RuntimeError(f"l3c_encode_table failed: {n}")
        return out[:n].tobytes(), chunk_lens

    def decode(self, data: bytes, chunk_lens: Sequence[int],
               n: int) -> np.ndarray:
        lib = get_lib()
        chunk_lens = np.asarray(chunk_lens, np.int64)
        syms = np.zeros(n, np.int32)
        buf = np.frombuffer(data, np.uint8).copy()
        r = lib.l3c_decode_table(buf, chunk_lens, n, self.cum, self.L,
                                 self.n_chunks, syms)
        if r != 0:
            raise RuntimeError(f"l3c_decode_table failed: {r}")
        return syms


def med_residuals(img: np.ndarray) -> np.ndarray:
    """uint8 HWC image -> (C, H*W) int32 mod-256 MED residuals."""
    lib = get_lib()
    h, w, c = img.shape
    res = np.zeros((c, h * w), np.int32)
    lib.l3c_med_residuals(np.ascontiguousarray(img), h, w, c, res)
    return res


def med_contexts(img: np.ndarray, n_ctx: int) -> np.ndarray:
    """uint8 HWC image -> (C, H*W) int32 gradient-activity contexts
    (encode side; decode recomputes them inline from reconstruction)."""
    lib = get_lib()
    h, w, c = img.shape
    ctx = np.zeros((c, h * w), np.int32)
    lib.l3c_medctx_contexts(np.ascontiguousarray(img), h, w, c, n_ctx,
                            ctx)
    return ctx


def encode_table_ctx(syms: np.ndarray, ctx: np.ndarray,
                     cums: np.ndarray, n_chunks: int = DEFAULT_CHUNKS
                     ) -> Tuple[bytes, np.ndarray]:
    """Per-symbol context-table rANS encode. cums: (n_ctx, L+1) u32."""
    lib = get_lib()
    n_ctx, L1 = cums.shape
    syms = np.ascontiguousarray(syms.reshape(-1).astype(np.int32))
    ctx = np.ascontiguousarray(ctx.reshape(-1).astype(np.int32))
    assert ctx.size == syms.size
    out = np.empty(syms.size * 4 + 8 * n_chunks + 64, np.uint8)
    chunk_lens = np.zeros(n_chunks, np.int64)
    n = lib.l3c_encode_table_ctx(
        syms, ctx, syms.size, np.ascontiguousarray(cums, np.uint32),
        n_ctx, L1 - 1, n_chunks, out, out.size, chunk_lens)
    if n < 0:
        raise RuntimeError(f"l3c_encode_table_ctx failed: {n}")
    return out[:n].tobytes(), chunk_lens


def medctx_decode(data: bytes, chunk_lens: np.ndarray, h: int, w: int,
                  c: int, cums: np.ndarray, n_chunks: int
                  ) -> np.ndarray:
    """Fused context decode + MED reconstruction.
    cums: (C, n_ctx, L+1) u32; chunk_lens: (C, n_chunks)."""
    lib = get_lib()
    _, n_ctx, L1 = cums.shape
    img = np.zeros((h, w, c), np.uint8)
    buf = np.frombuffer(data, np.uint8).copy()
    r = lib.l3c_medctx_decode(
        buf, np.ascontiguousarray(chunk_lens.reshape(-1), np.int64),
        h, w, c, np.ascontiguousarray(cums, np.uint32), n_ctx, L1 - 1,
        n_chunks, img)
    if r != 0:
        raise RuntimeError(f"l3c_medctx_decode failed: {r}")
    return img


def medctx_decode_v3(data: bytes, chunk_lens: np.ndarray, h: int,
                     w: int, c: int, cums: np.ndarray,
                     alphas: np.ndarray, n_chunks: int) -> np.ndarray:
    """Fused context decode + MED + inter-channel-corrected
    reconstruction (.medl v3). alphas: (C*(C-1)/2,) int8, channel-major
    [a10, a20, a21, ...]."""
    lib = get_lib()
    _, n_ctx, L1 = cums.shape
    img = np.zeros((h, w, c), np.uint8)
    buf = np.frombuffer(data, np.uint8).copy()
    r = lib.l3c_medctx_decode_v3(
        buf, np.ascontiguousarray(chunk_lens.reshape(-1), np.int64),
        h, w, c, np.ascontiguousarray(cums, np.uint32), n_ctx, L1 - 1,
        n_chunks, np.ascontiguousarray(alphas, np.int8), img)
    if r != 0:
        raise RuntimeError(f"l3c_medctx_decode_v3 failed: {r}")
    return img


def med_reconstruct(res: np.ndarray, h: int, w: int) -> np.ndarray:
    """(C, H*W) int32 residuals -> uint8 HWC image (inverse scan)."""
    lib = get_lib()
    c = res.shape[0]
    img = np.zeros((h, w, c), np.uint8)
    lib.l3c_med_reconstruct(np.ascontiguousarray(res, np.int32),
                            h, w, c, img)
    return img


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
