"""Probe: cost of the (N,H,W,Kp) -> (Kp, n) relayout feeding the
lane-major pack_int_params, and of candidate replacements.

Variants:
  xpose      plain jnp.transpose (what pack_int_params does today)
  dot-id     transpose as identity-matmul on the MXU (checked for
             value-exactness: f32 identity dot must reproduce inputs
             bitwise or it is unusable for the float pack stage)
  pack-new   full lane-major pack_int_params (transpose included)
  pack-old   round-3 minor-K pack reimplemented locally, for the A/B

Run on the real chip:  python tools/transpose_probe.py [reps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    from l3c_tpu.models import dmll
    from l3c_tpu.ops import int_coder as ic
    from l3c_tpu.utils.jaxtools import ensure_compile_cache

    ensure_compile_cache()
    N, H, W, C, K = 8, 512, 512, 3, 10
    spec = dmll.RGB_SPEC
    Kp = dmll.non_shared_get_Kp(K, C)
    n = N * H * W
    rng = np.random.RandomState(0)
    l_np = (rng.randn(N, H, W, Kp) * 1.5).astype(np.float32)
    l = jnp.asarray(l_np)

    def sync(v):
        np.asarray(jax.device_get(jnp.ravel(v)[:1]))

    def timeit(name, fn):
        fn()
        sync(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        sync(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:40s} {dt:8.1f} ms")
        return dt

    xpose = jax.jit(lambda x: x.reshape(n, Kp).T + jnp.float32(0.0))
    eye = jnp.eye(Kp, dtype=jnp.float32)
    dot_id = jax.jit(lambda x: jax.lax.dot_general(
        eye, x.reshape(n, Kp), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST))

    def pack_old(lv):
        # round-3 layout: all ops with K minor
        lr = lv.reshape(N, H, W, 4, C, K)
        pi = jax.nn.softmax(lr[..., 0, :, :], axis=-1)
        mu = lr[..., 1, :, :]
        inv_s = jnp.exp(-jnp.maximum(lr[..., 2, :, :],
                                     np.float32(dmll.LOG_SCALES_MIN)))
        lam = jax.nn.sigmoid(lr[..., 3, :, :])
        bw = np.float32(spec.bin_width)
        t0_ = np.float32(spec.x_min - spec.bin_width / 2.0)
        a_hat = jnp.clip(inv_s * bw, np.float32(ic.A_MIN),
                         np.float32(ic.A_MAX))
        m_hat = (mu - t0_) / bw
        p_q = jnp.round(pi * np.float32(ic.PI_Q))
        a_q = jnp.round(a_hat * np.float32(1 << ic.ZF))
        sc_q = jnp.round(a_hat * np.float32(16 << ic.ZF))
        v_q = jnp.clip(jnp.round(m_hat * a_hat * np.float32(1 << ic.ZF)),
                       -np.float32(ic.V_CLAMP), np.float32(ic.V_CLAMP))
        tgt = jnp.stack([a_hat[..., 1, :], a_hat[..., 2, :],
                         a_hat[..., 2, :]], axis=-2)
        w_q = jnp.round(lam * tgt * np.float32(1 << ic.ZF))
        return p_q, a_q, sc_q, v_q, w_q

    pack_old_j = jax.jit(pack_old)
    pack_new_j = jax.jit(lambda lv: ic.pack_int_params(spec, lv, C))

    print(f"l: {l.shape} f32 ({l_np.nbytes / 1e6:.0f} MB), reps={reps}")
    timeit("transpose (n,Kp)->(Kp,n)", lambda: xpose(l))
    timeit("dot-identity (Kp,n) on MXU", lambda: dot_id(l))
    timeit("pack NEW lane-major (incl. transpose)",
           lambda: pack_new_j(l))
    timeit("pack OLD minor-K (round-3 layout)", lambda: pack_old_j(l))

    a = np.asarray(xpose(l))
    b = np.asarray(dot_id(l))
    exact = np.array_equal(a, b)
    print(f"dot-identity bitwise exact vs transpose: {exact}")


if __name__ == "__main__":
    main()
