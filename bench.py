"""Benchmark: full encode+decode throughput of the flagship codec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: encode+decode megapixels/second for 512x512 RGB images through
the complete pipeline — TPU encoder forward, per-scale get_P passes,
TPU->host parameter transfer, host rANS coding, file write, then the full
decode path and a bit-exactness assertion.

Baseline: the reference's published entropy-coder speed, 0.202 s to
encode one 512x512 image on CPU (README.md:290-293 / BASELINE.md) =
1.298 MP/s — a LOWER bound on the reference's true full-pipeline cost
(which also pays the GPU forward passes), so vs_baseline is conservative.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    # real chip: leave JAX_PLATFORMS as the environment provides (axon)
    import jax
    import jax.numpy as jnp

    from l3c_tpu.codec import make_bitcoding
    from l3c_tpu.config import MsConfig
    from l3c_tpu.models.network import MultiscaleNetwork
    from l3c_tpu.utils.jaxtools import ensure_compile_cache

    ensure_compile_cache()
    cfg = MsConfig()  # flagship cr.cf architecture
    net = MultiscaleNetwork(cfg)
    rng = np.random.RandomState(0)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 512, 512, 3), jnp.float32))
    bc = make_bitcoding(cfg, net, params)  # format v2: on-device rANS

    # Mildly structured image (random model => near-worst-case bitrate;
    # throughput is what we measure).
    yy, xx = np.mgrid[0:512, 0:512]
    base = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1)
    img = np.clip(base + rng.randint(-8, 8, base.shape), 0,
                  255).astype(np.uint8)[None]

    with tempfile.TemporaryDirectory() as d:
        # warmup: compile all jits + build the coder .so
        p = os.path.join(d, "warm.l3c")
        bc.encode(img, p)
        out = bc.decode(p)
        assert np.array_equal(out, img), "lossless round-trip FAILED"

        n_rounds = 5
        t_enc = t_dec = 0.0
        for i in range(n_rounds):
            pi = os.path.join(d, f"img{i}.l3c")
            t0 = time.perf_counter()
            bc.encode(img, pi)
            t_enc += time.perf_counter() - t0
            t0 = time.perf_counter()
            out = bc.decode(pi)
            t_dec += time.perf_counter() - t0
            assert np.array_equal(out, img)

    mp = 512 * 512 / 1e6
    mps = n_rounds * mp / (t_enc + t_dec)
    baseline_mps = (512 * 512 / 1e6) / 0.202  # reference entropy-coder enc
    result = {
        "metric": "encode+decode throughput, 512x512 RGB, full pipeline",
        "value": round(mps, 4),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline_mps, 4),
    }
    print(json.dumps(result))
    print(f"# enc {t_enc / n_rounds * 1000:.0f}ms "
          f"dec {t_dec / n_rounds * 1000:.0f}ms per image",
          file=sys.stderr)


if __name__ == "__main__":
    main()
