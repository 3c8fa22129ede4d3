"""Speed-of-light probe for the model-forward stages (real chip).

Times isolated building blocks with N chained dispatches + one sync
(the microbench discipline) and prints achieved vs roofline cost, to
localize why enc_forward / get_P sit far above their FLOP/HBM bounds.

    python tools/conv_probe.py [N]
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

    from l3c_tpu.utils.jaxtools import ensure_compile_cache
    ensure_compile_cache()

    def sync(v):
        np.asarray(jax.device_get(jnp.ravel(v)[:1]))

    def timeit(name, fn, flops=0.0, bytes_=0.0):
        fn()
        sync(fn())
        t0 = time.perf_counter()
        r = None
        for _ in range(N):
            r = fn()
        sync(r)
        dt = (time.perf_counter() - t0) / N
        # v5e rooflines: ~197 TFLOP/s bf16, ~819 GB/s HBM
        roof = max(flops / 197e12, bytes_ / 819e9)
        note = (f"  roofline {roof * 1e3:7.2f} ms  ({dt / roof:6.1f}x)"
                if roof else "")
        print(f"{name:38s} {dt * 1e3:8.2f} ms{note}")
        return dt

    key = jax.random.PRNGKey(0)
    F = 8

    # --- single 3x3 conv at the pyramid's hot shape (256^2, 64ch, bf16)
    H = 256
    Cc = 64
    x = jax.random.normal(key, (F, H, H, Cc), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, Cc, Cc), jnp.bfloat16)

    def conv1(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
    cflops = 2 * F * H * H * Cc * Cc * 9
    cbytes = 2 * (2 * F * H * H * Cc)
    timeit("conv3x3 256^2 64->64 bf16 (1 conv)", jax.jit(conv1),
           cflops, cbytes)

    # --- 16 chained convs in ONE program (pyramid-like depth)
    def conv16(x):
        y = x
        for _ in range(16):
            y = conv1(y) + x
        return y
    timeit("conv3x3 x16 chained, one program", jax.jit(conv16),
           16 * cflops, 16 * cbytes)

    # --- same in float32 for comparison
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    def conv16f(x):
        y = x
        for _ in range(16):
            y = jax.lax.conv_general_dilated(
                y, wf, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + x
        return y
    timeit("conv3x3 x16 chained, float32", jax.jit(conv16f),
           16 * cflops * 1.0, 16 * 2 * cbytes)

    # --- empty program: pure dispatch floor
    tiny = jnp.zeros((8,), jnp.float32)
    tj = jax.jit(lambda v: v + 1.0)
    timeit("dispatch floor (tiny program)", lambda: tj(tiny))

    # --- the real enc_forward + get_P on the flagship
    from l3c_tpu.codec.bitcoding2 import TpuBitcoding
    from l3c_tpu.config import MsConfig
    from l3c_tpu.models.network import MultiscaleNetwork
    from l3c_tpu.train.saver import Restorer
    cfg = MsConfig(compute_dtype="bfloat16")
    net = MultiscaleNetwork(cfg)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zoo = os.path.join(root, "models_zoo",
                       "0817_1604 cr oi_offline r3long")
    params_t = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3), jnp.float32)))
    _, params = Restorer(zoo).restore_params_only(params_t)
    bc = TpuBitcoding(cfg, net, params)
    img = np.random.RandomState(0).randint(
        0, 256, (F, 512, 512, 3)).astype(np.uint8)
    xi = jax.device_put(jnp.asarray(img))
    timeit("enc_forward (pyramid, flagship)",
           lambda: bc._enc_forward(bc.params, xi),
           flops=0.0, bytes_=0.0)
    # hypothesis: per-dispatch cost scales with the number of argument
    # buffers (param-leaf marshaling through the axon client). Baking
    # the params in as jaxpr constants removes every param argument.
    p_dev = bc.params
    baked = jax.jit(lambda v: bc._enc_forward_impl(p_dev, v))
    timeit("enc_forward, params baked as consts", lambda: baked(xi))
    n_leaves = len(jax.tree_util.tree_leaves(p_dev))
    print(f"# param leaves: {n_leaves}")
    per_scale = bc._enc_forward(bc.params, xi)
    bn2 = per_scale[cfg.num_scales - 1][1]
    gp2 = bc._get_P(cfg.num_scales - 1, 0)
    timeit("get_P[2] (coarsest)", lambda: gp2(bc.params, bn2, None))


if __name__ == "__main__":
    main()
