"""Layout A/B probe: where does the v8 row-build time actually go?

Hypothesis (round 4): the (n, K, E) minor-dim layouts of the row
builders and pack_int_params waste VPU lanes — E=16/25 occupies 16/128
lanes per tile and K=10 pads the sublane dim, an ~8-13x tiling waste —
so the same exact-integer math restructured over flat (n,) arrays
(small dims K/E unrolled in Python) should run several times faster.
The v8 evaluator is program-shape-independent by construction, so the
restructured variant must produce BIT-IDENTICAL rows (asserted here).

Run on the real chip:  python tools/layout_probe.py [n_pixels] [reps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 512 * 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp
    from l3c_tpu.ops import int_coder as ic
    from l3c_tpu.utils.jaxtools import ensure_compile_cache

    ensure_compile_cache()
    K, E = 10, 16
    rng = np.random.RandomState(0)
    pi = rng.dirichlet(np.ones(K) * 0.5, n)
    a_hat = np.clip(np.exp(rng.uniform(-6, 5, (n, K))), ic.A_MIN,
                    ic.A_MAX)
    m_hat = rng.uniform(-40, 300, (n, K))
    p_q = np.round(pi * ic.PI_Q).astype(np.float32)
    a_q = np.round(a_hat * (1 << ic.ZF)).astype(np.float32)
    v_q = np.clip(np.round(m_hat * a_hat * (1 << ic.ZF)),
                  -ic.V_CLAMP, ic.V_CLAMP).astype(np.float32)

    p_d, a_d, v_d = (jnp.asarray(x) for x in (p_q, a_q, v_q))
    # lane-major copies: (K, n)
    p_t, a_t, v_t = (jnp.asarray(np.ascontiguousarray(x.T))
                     for x in (p_q, a_q, v_q))

    def sync(v):
        np.asarray(jax.device_get(jnp.ravel(v)[:1]))

    def timeit(name, fn):
        fn()
        sync(fn())
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        sync(r)
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:44s} {dt:8.1f} ms")
        return dt

    # --- variant 1: round-3 (n, K, E) layout (reimplemented locally;
    # int_coder itself is lane-major since round 4) -------------------
    def _cdf_nke(p, a, v, e):
        z = e[:, None, :] * a[..., None] - v[..., None]     # (n, K, E)
        z = jnp.clip(z, np.float32(-ic.Z_SAT), np.float32(ic.Z_SAT))
        sg = ic.int_sigmoid(z)
        terms = ic._fdiv2(p[..., None] * sg, 10)
        acc = terms[..., 0, :]
        for k in range(1, K):
            acc = acc + terms[..., k, :]
        return jnp.clip(acc, np.float32(0), np.float32(ic.C_ONE))

    def rows_cur(p, a, v):
        e = jnp.broadcast_to(
            jnp.arange(E, dtype=jnp.float32)[None], (p.shape[0], E))
        cd = _cdf_nke(p, a, v, e)
        return ic.quantize_edges(
            cd, jnp.arange(E, dtype=jnp.float32), E).astype(jnp.uint16)
    rows_cur_j = jax.jit(rows_cur)

    # --- variant 2: lane-major, (K, n) params, per-(k,e) unrolled ---
    def rows_lm(p, a, v):
        outs = []
        l_idx = np.arange(E, dtype=np.float32)
        for e in range(E):
            acc = None
            for k in range(K):
                z = jnp.clip(np.float32(e) * a[k] - v[k],
                             np.float32(-ic.Z_SAT), np.float32(ic.Z_SAT))
                term = ic._fdiv2(p[k] * ic.int_sigmoid(z), 10)
                acc = term if acc is None else acc + term
            cd = jnp.clip(acc, np.float32(0), np.float32(ic.C_ONE))
            outs.append(ic.quantize_edges(cd, np.float32(l_idx[e]), E))
        return jnp.stack(outs).astype(jnp.uint16)     # (E, n)
    rows_lm_j = jax.jit(rows_lm)

    # --- variant 3: lane-major but vectorized over E as leading dim -
    def rows_lme(p, a, v):
        e = jnp.arange(E, dtype=jnp.float32)[:, None]        # (E, 1)
        acc = None
        for k in range(K):
            z = jnp.clip(e * a[k][None] - v[k][None],
                         np.float32(-ic.Z_SAT), np.float32(ic.Z_SAT))
            term = ic._fdiv2(p[k][None] * ic.int_sigmoid(z), 10)
            acc = term if acc is None else acc + term        # (E, n)
        cd = jnp.clip(acc, np.float32(0), np.float32(ic.C_ONE))
        return ic.quantize_edges(
            cd, jnp.arange(E, dtype=jnp.float32)[:, None], E
        ).astype(jnp.uint16)                                 # (E, n)
    rows_lme_j = jax.jit(rows_lme)

    # --- variant 4: variant 3 + final transpose back to (n, E) ------
    rows_lme_t_j = jax.jit(lambda p, a, v: rows_lme(p, a, v).T)

    # --- variant 5: (K, E, n) full broadcast, no Python unroll ------
    # same tiling win (minor dims (E, n) fully occupied), HLO as small
    # as the current builder
    def rows_ken(p, a, v):
        e = jnp.arange(E, dtype=jnp.float32)[None, :, None]  # (1, E, 1)
        z = jnp.clip(e * a[:, None, :] - v[:, None, :],
                     np.float32(-ic.Z_SAT), np.float32(ic.Z_SAT))
        sg = ic.int_sigmoid(z)                               # (K, E, n)
        terms = ic._fdiv2(p[:, None, :] * sg, 10)
        acc = terms[0]
        for k in range(1, K):
            acc = acc + terms[k]
        cd = jnp.clip(acc, np.float32(0), np.float32(ic.C_ONE))
        return ic.quantize_edges(
            cd, jnp.arange(E, dtype=jnp.float32)[:, None], E
        ).astype(jnp.uint16)                                 # (E, n)
    rows_ken_j = jax.jit(rows_ken)

    # --- 2-edge lookup layouts (the encode hot path) -----------------
    syms = rng.randint(0, E, n).astype(np.float32)
    s_d = jnp.asarray(syms)

    def look_cur(p, a, v, s):
        e = jnp.stack([s, s + np.float32(1)], axis=-1)       # (n, 2)
        cd = _cdf_nke(p, a, v, e)
        q = ic.quantize_edges(cd, e, E)
        return q[:, 0].astype(jnp.uint32), \
            (q[:, 1] - q[:, 0]).astype(jnp.uint32)
    look_cur_j = jax.jit(look_cur)

    def look_lm(p, a, v, s):
        qs = []
        for e_off in (0.0, 1.0):
            e = s + np.float32(e_off)                        # (n,)
            acc = None
            for k in range(K):
                z = jnp.clip(e * a[k] - v[k],
                             np.float32(-ic.Z_SAT), np.float32(ic.Z_SAT))
                t = ic._fdiv2(p[k] * ic.int_sigmoid(z), 10)
                acc = t if acc is None else acc + t
            cd = jnp.clip(acc, np.float32(0), np.float32(ic.C_ONE))
            qs.append(ic.quantize_edges(cd, e, E))
        return qs[0].astype(jnp.uint32), \
            (qs[1] - qs[0]).astype(jnp.uint32)
    look_lm_j = jax.jit(look_lm)

    print(f"n={n}  K={K}  E={E}  reps={reps}")
    d1 = timeit("rows (n,K,E) current", lambda: rows_cur_j(p_d, a_d, v_d))
    d2 = timeit("rows lane-major unrolled (E,n)",
                lambda: rows_lm_j(p_t, a_t, v_t))
    d3 = timeit("rows lane-major E-leading (E,n)",
                lambda: rows_lme_j(p_t, a_t, v_t))
    d4 = timeit("rows lane-major + transpose (n,E)",
                lambda: rows_lme_t_j(p_t, a_t, v_t))
    d5 = timeit("rows (K,E,n) broadcast",
                lambda: rows_ken_j(p_t, a_t, v_t))
    l1 = timeit("2-edge lookup (n,K,2) current",
                lambda: look_cur_j(p_d, a_d, v_d, s_d))
    l2 = timeit("2-edge lookup lane-major",
                lambda: look_lm_j(p_t, a_t, v_t, s_d))

    # bit-exactness across layouts (exact-integer contract)
    r1 = np.asarray(rows_cur_j(p_d, a_d, v_d))
    r3 = np.asarray(rows_lme_j(p_t, a_t, v_t))
    np.testing.assert_array_equal(r1, r3.T)
    r4 = np.asarray(rows_lme_t_j(p_t, a_t, v_t))
    np.testing.assert_array_equal(r1, r4)
    np.testing.assert_array_equal(
        r1, np.asarray(rows_ken_j(p_t, a_t, v_t)).T)
    st1, fr1 = (np.asarray(x) for x in look_cur_j(p_d, a_d, v_d, s_d))
    st2, fr2 = (np.asarray(x) for x in look_lm_j(p_t, a_t, v_t, s_d))
    np.testing.assert_array_equal(st1, st2)
    np.testing.assert_array_equal(fr1, fr2)
    print("bit-exact across layouts: OK")
    print(f"speedups vs current: unrolled {d1/d2:.2f}x  "
          f"E-leading {d1/d3:.2f}x  +transpose {d1/d4:.2f}x  "
          f"(K,E,n) {d1/d5:.2f}x  lookup {l1/l2:.2f}x")


if __name__ == "__main__":
    main()
