"""Probe the top-k serving select inside pack_int_params on-chip.

Round 4 made topk=4 the serving default: it halves every coder stage
but adds +24.5/+10.7/+3.1 ms to get_P[0]/[1]/[2] (the rank select and
the per-rank masked sums land there; RESULTS.md round 4). This probe
times the isolated pack at the bench shape so select variants can be
A/B'd without a full bench run:

  stack   per-rank masked sums (each rank re-streams (C, K, n) x)
  kmajor  one streaming pass routing each element to its rank slot

Both produce BITWISE-identical IntParams (tests/test_int_coder.py);
the only question is device time. Also times topk=0 (no select) and
the rank pass alone to bound what the select can ever save.

Run on the real chip:  python tools/topk_probe.py [reps]
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

    results = {}
    # pack without select: the floor every variant pays anyway
    f0 = jax.jit(lambda lv: ic.pack_int_params(spec, lv, C, topk=0))
    results["pack topk=0 (no select)"] = timeit(
        "pack topk=0 (no select)", lambda: f0(l))

    for variant in ("stack", "kmajor"):
        os.environ["L3C_TOPK_SEL"] = variant
        # fresh closure => fresh trace under the new env var
        fv = jax.jit(lambda lv, _v=variant: ic.pack_int_params(
            spec, lv, C, topk=4))
        results[f"pack topk=4 sel={variant}"] = timeit(
            f"pack topk=4 sel={variant}", lambda: fv(l))

    # the rank pass alone (u8 ranks at the same shape)
    def rank_only(lv):
        lr = dmll._reshape_l(spec, lv, C)
        Nn, Hh, Ww, P, _, Kk = lr.shape
        pl = lr[..., 0, :, :].astype(jnp.float32)\
            .transpose(3, 4, 0, 1, 2).reshape(C, Kk, Nn * Hh * Ww)
        return ic.topk_rank(pl)

    fr = jax.jit(rank_only)
    results["rank pass alone (incl. pi transpose)"] = timeit(
        "rank pass alone (incl. pi transpose)", lambda: fr(l))

    base = results["pack topk=0 (no select)"]
    for k, v in results.items():
        if k.startswith("pack topk=4"):
            print(f"  {k}: select overhead {v - base:+.1f} ms vs topk=0")


if __name__ == "__main__":
    main()
