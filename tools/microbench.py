"""Per-stage device-cost map of the v8 codec at the bench shape.

Each jitted stage is dispatched N times back-to-back and synced ONCE at
the end, so the ~50-100ms axon sync latency amortizes away and the
numbers approximate true device execution time. Run on the real chip:

    python tools/microbench.py [N]

Stages (batch F=8, 512x512 RGB, flagship cr.cf, trained demo model):
  enc_forward        full encoder pyramid
  get_P[s]           per-scale probability networks + int-param pack
  enc rgb units      scale-0 fused 2-edge lookups + both rANS scans
  enc bn unit[s]     scale>0 fused 2-edge lookups + rANS scan
  dec rgb rows       scale-0 DECODE row builds (coarse+fine, 3 ch)
  dec bn rows[s]     scale>0 decode mixture rows
  dec scan           decode-side rANS scan (rows prebuilt)
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
    from l3c_tpu.codec.bitcoding2 import TpuBitcoding, _group_syms
    from l3c_tpu.config import MsConfig
    from l3c_tpu.models.network import MultiscaleNetwork
    from l3c_tpu.ops import int_coder as ic
    from l3c_tpu.ops import tpu_coder as tc
    from l3c_tpu.train.saver import Restorer
    from l3c_tpu.utils.jaxtools import ensure_compile_cache

    ensure_compile_cache()
    cfg = MsConfig(compute_dtype="bfloat16")
    net = MultiscaleNetwork(cfg)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zoo = os.path.join(root, "models_zoo", "0817_1604 cr oi_offline r3long")
    params_t = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3), jnp.float32)))
    _, params = Restorer(zoo).restore_params_only(params_t)
    bc = TpuBitcoding(cfg, net, params)
    topk = bc.coder_topk

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:512, 0:512]
    base = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1)
    F = 8
    padded = np.stack([
        np.clip(base + rng.randint(-8, 8, base.shape), 0,
                255).astype(np.uint8) for _ in range(F)])
    x = jnp.asarray(padded)

    def sync(v):
        np.asarray(jax.device_get(jnp.ravel(v)[:1]))

    # L3C_MB_SKIP=substr1,substr2 skips matching stages (e.g. the full
    # row-build programs, which exceed the remote-compile tunnel's
    # request-size cap and take minutes to buffer-and-fail)
    skips = [s for s in os.environ.get("L3C_MB_SKIP", "").split(",") if s]
    skipped = []   # stage names that returned via a skip path

    def timeit(name, fn, out_of=None):
        if any(s in name for s in skips):
            print(f"{name:34s}   SKIP (L3C_MB_SKIP)")
            skipped.append(name)
            return 0.0
        try:
            fn()  # warm/compile
        except Exception as e:  # a too-large remote-compile (tunnel
            # HTTP 413) on one stage must not kill the rest of the map
            print(f"{name:34s}   SKIP ({type(e).__name__}: "
                  f"{str(e)[:60]})")
            import traceback
            traceback.print_exc(file=sys.stderr)  # full cause: a skip
            # here may also be a real regression, not just the tunnel
            skipped.append(name)
            return 0.0
        sync(fn() if out_of is None else out_of(fn()))
        t0 = time.perf_counter()
        r = None
        for _ in range(N):
            r = fn()
        sync(r if out_of is None else out_of(r))
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{name:34s} {dt:8.1f} ms")
        return dt

    S = cfg.num_scales
    total = 0.0
    total += timeit("enc_forward (pyramid)",
                    lambda: bc._enc_forward(bc.params, x),
                    out_of=lambda r: r[0][0])

    per_scale = bc._enc_forward(bc.params, x)

    # per-scale get_P (+ int-param pack), coldest first like the codec
    dec_F_prev = None
    bn_prev = per_scale[S - 1][1]
    ip_by_scale = {}
    for scale in reversed(range(S)):
        def gp(scale=scale, bn=bn_prev, dF=dec_F_prev):
            return bc._get_P(scale, topk)(bc.params, bn, dF)
        total += timeit(f"get_P[{scale}]", gp, out_of=lambda r: r[0].p)
        ip, dec_F_prev = gp()
        ip_by_scale[scale] = ip
        if scale > 0:
            bn_prev = per_scale[scale - 1][1]

    ip0 = ip_by_scale[0]
    n = 512 * 512
    T_u = tc.t_policy(n)

    # --- encode units (fused 2-edge lookups + scans; no tables)
    total += timeit("enc rgb units (scale 0, 2 scans)",
                    lambda: bc._enc_rgb_units(ip0, x, T_u),
                    out_of=lambda r: r[0])
    for scale in range(1, S):
        ip = ip_by_scale[scale]
        tgt = per_scale[scale - 1][0]
        T_s = tc.t_policy(tgt.shape[1] * tgt.shape[2])
        total += timeit(
            f"enc bn unit (scale {scale})",
            lambda ip=ip, tgt=tgt, T_s=T_s: bc._enc_bn_unit(ip, tgt,
                                                            T_s),
            out_of=lambda r: r[0])

    # --- decode-side row builds
    split = jax.jit(lambda u8: (u8.astype(jnp.int32) >> tc.FINE_BITS,
                                u8.astype(jnp.int32)))
    a, t_i = split(x)

    # one program per channel (the fused 6-builder program is too large
    # for the remote-compile tunnel, which repeatedly dropped it)
    def rgb_rows_c(c, ip0=ip0, t_i=t_i, a=a):
        dec = tuple(t_i[..., j].reshape(-1) for j in range(c))
        return (ic.rgb_coarse_rows(ip0, c, dec),
                ic.rgb_fine_rows(ip0, c, dec, a[..., c].reshape(-1)))
    rows_js = [jax.jit(lambda c=c: rgb_rows_c(c)) for c in range(3)]
    dt_rows = 0.0
    for c in range(3):
        dt_rows += timeit(f"dec rgb rows (coarse+fine, ch {c})",
                          rows_js[c], out_of=lambda r: r[-1])
    total += dt_rows

    def rgb_rows_j():
        return [x for c in range(3) for x in rows_js[c]()]
    bn_rows_j = jax.jit(lambda ip: ic.bn_rows(ip, cfg.q.C, cfg.q.L))
    for scale in range(1, S):
        total += timeit(f"dec bn rows (scale {scale})",
                        lambda s=scale: bn_rows_j(ip_by_scale[s]))

    # --- decode scan (rows prebuilt so the scan is isolated); the row
    # builder feeding it can exceed the remote-compile size cap, so the
    # whole block degrades to SKIP rather than killing the map
    try:
        if any("dec rgb rows" in name for name in skipped):
            # gate on what actually happened, not on the skip patterns:
            # a pattern naming one channel's stage must still stop this
            # block from recompiling all three row builders
            raise RuntimeError("row builder skipped above")
        ct = jnp.concatenate(
            [np.asarray(r) for r in rgb_rows_j()[0::2]], 1)
        enc_c = jax.jit(lambda ip, a: tc.encode_sf(
            *[jnp.concatenate(v) for v in zip(
                *[ic.rgb_coarse_lookup(ip, c, tuple(
                    t_i[..., j].reshape(-1) for j in range(c)),
                    a[..., c].reshape(-1)) for c in range(3)])],
            tc.layout_for(n, 3 * F, T_u)))
        words_c, _ = enc_c(ip0, a)
        dec_scan = jax.jit(lambda tbl, w: tc.decode_channels(
            tbl, w, tc.N_COARSE, tc.layout_for(n, F, T_u)))
        total += timeit(
            "dec scan coarse full-width",
            lambda: dec_scan(ct[:, : F * n],
                             words_c[: words_c.shape[0] // 3]),
            out_of=lambda r: r)
    except Exception as e:
        print(f"{'dec scan coarse full-width':34s}   SKIP "
              f"({type(e).__name__}: {str(e)[:60]})")

    # --- scale-0 decode, end-to-end on REAL words (not added to
    # TOTAL: it re-covers the rows+scan stages above)
    wc_u, _, wf_u, _ = bc._enc_rgb_units(ip0, x, T_u)

    def dec_seq():
        d = bc._zeros_i32((F, 512, 512, 3))
        for c in range(3):
            d = bc._dec_rgb_channel(ip0, d, wc_u, wf_u, c, T_u, T_u,
                                    512, 512, F, "syms")
        return d
    timeit("dec rgb scale-0 channel-seq (3 prog)", dec_seq,
           out_of=lambda r: r)

    note = (f", PARTIAL: {len(skipped)} stage(s) skipped"
            if skipped else "")
    print(f"{'TOTAL (timed stages)':34s} {total:8.1f} ms{note}")


if __name__ == "__main__":
    main()
