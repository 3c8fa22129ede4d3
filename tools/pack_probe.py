"""Probe pack_int_params realizations: how to produce lane-major
IntParams from the NHWC-minor classifier output cheapest.

Variants (all produce bit-identical IntParams up to layout):
  v1 now       transpose l first, lane-major compute (current impl)
  v2 out-T     old minor-K compute, transpose the 5 OUTPUTS in-jit
  v3 barrier   v1 with an optimization_barrier after the transpose
               (stops XLA from fusing the transpose into every reader)
  v4 slices    per-param-group transposes (4 smaller transposes)

Run on the real chip:  python tools/pack_probe.py [reps]
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
    rng = np.random.RandomState(0)
    l = jnp.asarray((rng.randn(N, H, W, Kp) * 1.5).astype(np.float32))
    n = N * H * W

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
        print(f"{name:44s} {dt:8.1f} ms")
        return dt

    bw = np.float32(spec.bin_width)
    t0_ = np.float32(spec.x_min - spec.bin_width / 2.0)

    def finish(pi, mu, inv_s, lam, ax_c):
        """Shared tail: quantize to IntParams fields. ax_c = channel
        axis of the (..C..K..) arrays for the lambda-target stack."""
        a_hat = jnp.clip(inv_s * bw, np.float32(ic.A_MIN),
                         np.float32(ic.A_MAX))
        m_hat = (mu - t0_) / bw
        p_q = jnp.round(pi * np.float32(ic.PI_Q))
        a_q = jnp.round(a_hat * np.float32(1 << ic.ZF))
        sc_q = jnp.round(a_hat * np.float32(16 << ic.ZF))
        v_q = jnp.clip(
            jnp.round(m_hat * a_hat * np.float32(1 << ic.ZF)),
            -np.float32(ic.V_CLAMP), np.float32(ic.V_CLAMP))
        tgt = jnp.stack(
            [jnp.take(a_hat, 1, ax_c), jnp.take(a_hat, 2, ax_c),
             jnp.take(a_hat, 2, ax_c)], axis=ax_c)
        w_q = jnp.round(lam * tgt * np.float32(1 << ic.ZF))
        return p_q, a_q, sc_q, v_q, w_q

    v1 = jax.jit(lambda lv: ic.pack_int_params(spec, lv, C))

    def pack_out_t(lv):
        lr = lv.reshape(N, H, W, 4, C, K)
        pi = jax.nn.softmax(lr[..., 0, :, :], axis=-1)
        mu = lr[..., 1, :, :]
        inv_s = jnp.exp(-jnp.maximum(lr[..., 2, :, :],
                                     np.float32(dmll.LOG_SCALES_MIN)))
        lam = jax.nn.sigmoid(lr[..., 3, :, :])
        outs = finish(pi, mu, inv_s, lam, ax_c=-2)   # (N,H,W,C,K) each
        return tuple(o.reshape(n, *o.shape[3:]).transpose(1, 2, 0)
                     for o in outs)
    v2 = jax.jit(pack_out_t)

    def pack_barrier(lv):
        lr = lv.reshape(N, H, W, 4, C, K)
        lt = lr.transpose(3, 4, 5, 0, 1, 2).reshape(4, C, K, n)
        lt = jax.lax.optimization_barrier(lt)
        pi = jax.nn.softmax(lt[0], axis=1)
        mu = lt[1]
        inv_s = jnp.exp(-jnp.maximum(lt[2],
                                     np.float32(dmll.LOG_SCALES_MIN)))
        lam = jax.nn.sigmoid(lt[3])
        return finish(pi, mu, inv_s, lam, ax_c=0)
    v3 = jax.jit(pack_barrier)

    def pack_slices(lv):
        lr = lv.reshape(N, H, W, 4, C, K)
        def tp(i):
            return lr[..., i, :, :].transpose(3, 4, 0, 1, 2)\
                .reshape(C, K, n)
        pi = jax.nn.softmax(tp(0), axis=1)
        mu = tp(1)
        inv_s = jnp.exp(-jnp.maximum(tp(2),
                                     np.float32(dmll.LOG_SCALES_MIN)))
        lam = jax.nn.sigmoid(tp(3))
        return finish(pi, mu, inv_s, lam, ax_c=0)
    v4 = jax.jit(pack_slices)

    print(f"l {l.shape} f32, reps={reps}")
    d1 = timeit("v1 transpose-first (current)", lambda: v1(l))
    d2 = timeit("v2 minor-K compute + out transposes", lambda: v2(l))
    d3 = timeit("v3 v1 + optimization_barrier", lambda: v3(l))
    d4 = timeit("v4 per-group slice transposes", lambda: v4(l))

    # value equality across variants (same float ops, layout only —
    # NOT bit-contracted, but must match since the op DAG is identical)
    r1 = v1(l)
    for name, r in (("v2", v2(l)), ("v3", v3(l)), ("v4", v4(l))):
        for aa, bb in zip([r1.p, r1.a, r1.sc, r1.v, r1.w], r):
            assert np.asarray(aa).shape == np.asarray(bb).shape, name
            np.testing.assert_array_equal(np.asarray(aa),
                                          np.asarray(bb), err_msg=name)
    print("variants value-equal: OK")
    print(f"best: {min(d1, d2, d3, d4):.1f} ms")


if __name__ == "__main__":
    main()
