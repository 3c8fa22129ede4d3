"""Pallas TPU kernel: fused per-pixel mixture-CDF table computation.

The TPU-native replacement for the reference CUDA kernel
(torchac_kernel.cu:26-77, which fused logistic-mixture CDF evaluation +
integer renorm into managed memory): for a tile of pixels the kernel
keeps the (TILE_P, L) evaluation entirely in VMEM, accumulating the
K-component sigmoid mixture and quantizing to fixed point in one pass —
no (P, K, L) intermediate ever touches HBM.

    cdf(p, l)  = sum_k pi[p,k] * sigmoid((t_l - mu[p,k]) * inv_s[p,k])
    q(p, l)    = floor(clip(cdf, 0, 1) * (65536 - 2L))

The (cheap, integer) + 2l / edge-0 pin finish runs in XLA afterwards
(ops.tpu_coder table spec). QUARANTINED to tools/ in round 4 (VERDICT
item 9): these kernels are a bench-only A/B path that never affects
the codec — they measured 2.5-4.5x slower than XLA's own fusion on
the real chip (RESULTS.md round-2 device-stage map), and since format
v8 the codec's coding CDF is the exact-integer evaluator
(ops.int_coder), not a float kernel at all. Kept for microbenching and
as the starting point if a future chip shifts the balance.

On non-TPU backends the kernel runs in interpret mode (tests compare it
against the pure-XLA path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 256  # pixels per grid step


def _kernel(t_ref, pi_ref, mu_ref, inv_ref, out_ref, *, K: int, M: float):
    t = t_ref[:]                      # (1, L)
    acc = jnp.zeros(out_ref.shape, jnp.float32)     # (TILE_P, L)
    for k in range(K):                # K is small and static: unrolled
        z = (t - mu_ref[:, k][:, None]) * inv_ref[:, k][:, None]
        acc = acc + pi_ref[:, k][:, None] * jax.nn.sigmoid(z)
    q = jnp.floor(jnp.clip(acc, 0.0, 1.0) * M)
    out_ref[:] = q.astype(jnp.int32)


def mixture_cdf_quantized(pi: jnp.ndarray, mu: jnp.ndarray,
                          inv_s: jnp.ndarray, targets: np.ndarray,
                          L: int, interpret: bool = None) -> jnp.ndarray:
    """(P, K) params + (L,) bin edges -> (P, L) int32 quantized CDF."""
    P, K = pi.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (pl.cdiv(P, TILE_P),)
    t2 = jnp.asarray(targets, jnp.float32).reshape(1, L)
    kernel = functools.partial(_kernel, K=K, M=float(65536 - 2 * L))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_P, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.int32),
        interpret=interpret,
    )(t2, pi, mu, inv_s)


def build_cdf_table_pallas(pi: jnp.ndarray, mu: jnp.ndarray,
                           inv_s: jnp.ndarray, x_min: float, bin_w: float,
                           L: int) -> jnp.ndarray:
    """Drop-in for tpu_coder.build_cdf_table using the fused kernel."""
    lead = pi.shape[:-1]
    K = pi.shape[-1]
    flat = lambda a: a.reshape(-1, K).astype(jnp.float32)
    lvals = np.arange(L, dtype=np.float32)
    targets = lvals * np.float32(bin_w) + np.float32(x_min - bin_w / 2.0)
    q = mixture_cdf_quantized(flat(pi), flat(mu), flat(inv_s), targets, L)
    l_idx = jnp.arange(L, dtype=jnp.int32)
    q = jnp.where(l_idx == 0, 0, q + 2 * l_idx)  # v7 spec finish
    return q.astype(jnp.uint16).reshape(*lead, L)


def _fine_kernel(pi_ref, mu_ref, inv_ref, a_ref, out_ref, *, K: int,
                 bw: float, t0: float, fine: int, n_coarse: int, M: float):
    """Conditional fine-level CDF rows: per pixel, evaluate the mixture
    CDF at the fine+1 edges of the pixel's coarse bin `a` and normalize
    to the bin's mass (tpu_coder.rgb_fine_tables spec). All fine+1
    columns live in registers/VMEM; nothing but the (TILE_P, fine)
    quantized rows is written."""
    base = a_ref[:, 0][:, None] * np.float32(fine)        # (TILE_P, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, fine + 1), 1)\
        .astype(jnp.float32)
    t = (base + k) * np.float32(bw) + np.float32(t0)      # (TILE_P, F+1)
    acc = jnp.zeros(t.shape, jnp.float32)
    for kk in range(K):                                   # static unroll
        z = (t - mu_ref[:, kk][:, None]) * inv_ref[:, kk][:, None]
        acc = acc + pi_ref[:, kk][:, None] * jax.nn.sigmoid(z)
    # tail absorption (tpu_coder.rgb_fine_tables): the first coarse
    # bin's window opens at -inf (lo := 0), the last closes at +inf
    # (hi := 1), so out-of-range mass lands in the edge fine symbols
    a_col = a_ref[:, 0][:, None]
    lo = jnp.where(a_col == 0.0, 0.0, acc[:, :1])
    hi = jnp.where(a_col == np.float32(n_coarse - 1), 1.0, acc[:, -1:])
    denom = jnp.maximum(hi - lo, 1e-9)
    cond = (acc[:, :fine] - lo) / denom
    q = jnp.floor(jnp.clip(cond, 0.0, 1.0) * M)
    out_ref[:] = q.astype(jnp.int32)


def fine_cdf_quantized(pi: jnp.ndarray, mu: jnp.ndarray,
                       inv_s: jnp.ndarray, a: jnp.ndarray,
                       bw: float, t0: float, fine: int, n_coarse: int,
                       interpret: bool = None) -> jnp.ndarray:
    """(P, K) params + (P,) coarse symbols -> (P, fine) int32 quantized
    conditional CDF (pre-monotonicity). `n_coarse` is the coarse-bin
    count (upper-tail absorption triggers at a == n_coarse - 1; it only
    coincides with fine - 1 while both splits are 16)."""
    P, K = pi.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    grid = (pl.cdiv(P, TILE_P),)
    kernel = functools.partial(_fine_kernel, K=K, bw=float(bw),
                               t0=float(t0), fine=fine, n_coarse=n_coarse,
                               M=float(65536 - 2 * fine))
    a2 = a.reshape(P, 1).astype(jnp.float32)
    spec_pk = pl.BlockSpec((TILE_P, K), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_pk, spec_pk, spec_pk,
                  pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_P, fine), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, fine), jnp.int32),
        interpret=interpret,
    )(pi.astype(jnp.float32), mu.astype(jnp.float32),
      inv_s.astype(jnp.float32), a2)


def coarse_cdf_quantized(pi, mu, inv_s, edges: np.ndarray, L: int
                         ) -> jnp.ndarray:
    """Coarse-level rows = the generic kernel at the 16 coarse edges."""
    return mixture_cdf_quantized(pi, mu, inv_s, edges, L)


# --------- A/B drop-ins mirroring the production XLA table builders
# (same v7 +2l / edge-0-pin spec finish, so tests can compare rows)


def rgb_coarse_tables_pallas(spec, packed, c, decoded) -> jnp.ndarray:
    """Pallas counterpart of tpu_coder.rgb_coarse_tables_packed."""
    from l3c_tpu.ops import tpu_coder as tc
    pi, mu, inv_s = tc._channel_params_packed(spec, packed, c, decoded)
    bw = np.float32(spec.bin_width)
    t0 = np.float32(spec.x_min - spec.bin_width / 2.0)
    edges = ((np.arange(tc.N_COARSE) << tc.FINE_BITS)
             .astype(np.float32) * bw + t0)
    q = coarse_cdf_quantized(pi, mu, inv_s, edges, tc.N_COARSE)
    l_idx = jnp.arange(tc.N_COARSE, dtype=jnp.int32)
    return jnp.where(l_idx == 0, 0, q + 2 * l_idx).astype(jnp.uint16)


def rgb_fine_tables_pallas(spec, l, c, C, decoded, a) -> jnp.ndarray:
    """Pallas counterpart of tpu_coder.rgb_fine_tables."""
    from l3c_tpu.models import dmll as dmll_mod
    from l3c_tpu.ops import tpu_coder as tc
    packed = dmll_mod.pack_coder_params(spec, l, C)
    pi, mu, inv_s = tc._channel_params_packed(spec, packed, c, decoded)
    n = pi.shape[0]
    bw = np.float32(spec.bin_width)
    t0 = np.float32(spec.x_min - spec.bin_width / 2.0)
    FINE = 1 << tc.FINE_BITS
    q = fine_cdf_quantized(pi, mu, inv_s, a.reshape(n), bw, t0, FINE,
                           tc.N_COARSE)
    l_idx = jnp.arange(FINE, dtype=jnp.int32)
    return jnp.where(l_idx == 0, 0, q + 2 * l_idx).astype(jnp.uint16)
