"""Isolated rANS-scan cost probe (real chip).

Times ONLY tpu_coder.rans_encode / rans_decode at the bench scale-0
shape under variants of the scan body, with N chained dispatches + one
sync. This separates the sequential-scan cost from lookups/sort and
answers: is the encode scan division-bound, step-overhead-bound, or
sort-bound?

    python tools/scan_probe.py [N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    from l3c_tpu.ops import tpu_coder as tc
    from l3c_tpu.utils.jaxtools import ensure_compile_cache
    ensure_compile_cache()

    def sync(v):
        np.asarray(jax.device_get(jnp.ravel(v)[:1]))

    def timeit(name, fn):
        fn()
        sync(fn())
        t0 = time.perf_counter()
        r = None
        for _ in range(N):
            r = fn()
        sync(r)
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{name:46s} {dt:8.1f} ms")
        return dt

    # bench scale-0 geometry: F=8 512^2 images, 3 channels
    F, n, C = 8, 512 * 512, 3
    rng = np.random.RandomState(0)

    for T in (2048, 1024, 512):
        lay = tc.layout_for(n, C * F, T)
        lanes = lay.lanes
        # realistic (start, freq): freq ~ hundreds (3-ish bpsp), start
        # anywhere; mask all-true (bench shapes divide evenly)
        freq = rng.randint(1, 4096, size=(lanes, T)).astype(np.uint32)
        start = rng.randint(0, 60000, size=(lanes, T)).astype(np.uint32)
        start = np.minimum(start, 65536 - freq)
        mask = np.ones((lanes, T), bool)
        fd, sd, md = (jax.device_put(jnp.asarray(a))
                      for a in (freq, start, mask))

        for div in ("float", "int"):
            tc.ENC_DIV = div

            def enc(sd=sd, fd=fd, md=md):
                return tc.rans_encode(sd, fd, md)
            timeit(f"rans_encode lanes={lanes} T={T} div={div}",
                   jax.jit(enc))
        tc.ENC_DIV = "float"
        for packer in ("shift", "sort"):
            tc.PACKER = packer

            def enc(sd=sd, fd=fd, md=md):
                return tc.rans_encode(sd, fd, md)
            timeit(f"rans_encode lanes={lanes} T={T} pack={packer}",
                   jax.jit(enc))
        tc.PACKER = "shift"

        # decode at the same geometry: uniform L=16 rows (realistic
        # ~4 bit/sym consume rate), words produced by the encoder
        L = 16
        syms = rng.randint(0, L, size=(lanes, T)).astype(np.int32)
        row = tc.uniform_cdf_row(L)                      # (L,)
        tblr = jnp.asarray(np.broadcast_to(
            row, (lanes * T, L)).copy())
        st2, fr2 = jax.jit(
            lambda t, s: tc.table_lookup_symbol(
                t.reshape(lanes, T, L), s, L)
        )(tblr, jnp.asarray(syms))
        w2, l2 = jax.jit(tc.rans_encode)(st2, fr2, md)
        maxw = int(np.asarray(l2).max())
        wdev = jax.device_put(jnp.asarray(np.asarray(w2)[:, :maxw]))
        tbl_dec = jax.device_put(tblr)
        mask_t = jnp.asarray(
            np.ones((T // tc.UNROLL, tc.UNROLL, lanes), bool))

        def dec(tb=tbl_dec, wd=wdev, mt=mask_t):
            return tc.rans_decode(
                tb.reshape(lanes, T, L), wd, mt, L)
        timeit(f"rans_decode lanes={lanes} T={T} W={maxw}",
               jax.jit(dec))


if __name__ == "__main__":
    main()
