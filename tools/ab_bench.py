"""Interleaved A/B codec benchmark (real chip).

The shared TPU pool's load swings run times ~2x on minute timescales, so
absolute numbers from separate processes aren't comparable. This tool
times CONFIG VARIANTS round-robin inside one process — every variant
sees the same load profile — and reports best + median per variant.

Usage: python tools/ab_bench.py [rounds] [batch]
Variants are edited in CONFIGS below (coder profiles).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp
    from l3c_tpu.codec.bitcoding2 import TpuBitcoding
    from l3c_tpu.config import MsConfig
    from l3c_tpu.models.network import MultiscaleNetwork
    from l3c_tpu.ops import tpu_coder as tc
    from l3c_tpu.utils.jaxtools import ensure_compile_cache

    ensure_compile_cache()
    cfg = MsConfig(compute_dtype="bfloat16")
    net = MultiscaleNetwork(cfg)
    rng = np.random.RandomState(0)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 512, 512, 3), jnp.float32))
    yy, xx = np.mgrid[0:512, 0:512]
    base = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1)
    imgs = [np.clip(base + rng.randint(-8, 8, base.shape), 0,
                    255).astype(np.uint8)[None] for _ in range(B)]

    # (name, setter) — setters mutate tpu_coder module globals; each
    # variant gets its OWN TpuBitcoding so its jit closures trace under
    # its own T/UNROLL (fresh traces; the persistent compile cache still
    # dedups identical HLO across processes). Select variants with
    # L3C_AB=name1,name2 (default: the coder profiles).
    def _reset():
        tc.CODER_PROFILE = "balanced"    # bench/serving default
        tc._T_FORCED = False
        tc.UNROLL = 8
        tc.PACKER = "shift"
        tc.ENC_DIV = "float"
        # flags read by TpuBitcoding.__init__ from the environment
        os.environ["L3C_ENC_FUSED"] = "1"

    def _profile(p):
        def s():
            _reset()
            tc.CODER_PROFILE = p
        return s

    def _forced(T, unroll=8):
        def s():
            _reset()
            tc.T_STREAM = T
            tc._T_FORCED = True
            tc.UNROLL = unroll
        return s

    def _flag(**over):
        # one execution flag changed from the shipped defaults, on the
        # default profile — isolates the session's lowering changes
        # (shift packer, f32 divmod, scan fusion) for on-chip A/B.
        # L3C_-prefixed keys are environment flags (read at
        # TpuBitcoding construction); bare keys are tc module globals.
        def s():
            _reset()
            for k, v in over.items():
                if k.startswith("L3C_"):
                    os.environ[k] = v
                else:
                    setattr(tc, k, v)
        return s

    ALL = {
        "speed": _profile("speed"),
        "balanced": _profile("balanced"),
        "size": _profile("size"),
        "T2048": _forced(2048),
        "T1024": _forced(1024),
        "T512": _forced(512),
        "T256": _forced(256),
        "T1024u16": _forced(1024, 16),
        "T512u16": _forced(512, 16),
        "T2048u16": _forced(2048, 16),
        "default": _flag(),
        "packer_sort": _flag(PACKER="sort"),
        "div_int": _flag(ENC_DIV="int"),
        "enc_twoscan": _flag(L3C_ENC_FUSED="0"),
    }
    names = os.environ.get("L3C_AB", "speed,balanced,size").split(",")
    CONFIGS = [(n, ALL[n]) for n in names]
    if rounds % len(CONFIGS):
        # per-round order rotation only cancels slot bias when every
        # variant occupies every slot equally often
        print(f"warning: rounds={rounds} is not a multiple of "
              f"{len(CONFIGS)} variants; medians keep a slot bias — "
              f"use rounds={-(-rounds // len(CONFIGS)) * len(CONFIGS)}",
              file=sys.stderr)

    codecs = []
    for name, setter in CONFIGS:
        setter()
        bc = TpuBitcoding(cfg, net, params)
        codecs.append((name, setter, bc))

    def set_profile(setter):
        setter()

    results = {name: {"enc": [], "dec": []} for name, _ in CONFIGS}
    with tempfile.TemporaryDirectory() as d:
        # warmup / compile every variant
        for name, setter, bc in codecs:
            set_profile(setter)
            ps = [os.path.join(d, f"w_{name}_{b}.l3c") for b in range(B)]
            bc.encode_batch(imgs, ps)
            outs = bc.decode_batch(ps)
            for im, o in zip(imgs, outs):
                assert np.array_equal(o, im), f"round-trip failed: {name}"
            print(f"warm {name}: ok", file=sys.stderr)

        for r in range(rounds):
            # Rotate the variant order per round: under monotone pool-load
            # drift a fixed order gives the first variant the quietest
            # slot every round, biasing best-of comparisons.
            order = codecs[r % len(codecs):] + codecs[:r % len(codecs)]
            for name, profile, bc in order:
                set_profile(profile)
                ps = [os.path.join(d, f"r{r}_{name}_{b}.l3c")
                      for b in range(B)]
                t0 = time.perf_counter()
                bc.encode_batch(imgs, ps)
                t1 = time.perf_counter()
                outs = bc.decode_batch(ps)
                t2 = time.perf_counter()
                for im, o in zip(imgs, outs):
                    assert np.array_equal(o, im)
                results[name]["enc"].append(t1 - t0)
                results[name]["dec"].append(t2 - t1)
                print(f"r{r} {name}: enc {1e3*(t1-t0):.0f}ms "
                      f"dec {1e3*(t2-t1):.0f}ms", file=sys.stderr)

    mp = B * 512 * 512 / 1e6
    print(f"{'variant':18s} {'enc_best':>9s} {'dec_best':>9s} "
          f"{'enc_med':>9s} {'dec_med':>9s} {'MP/s_best':>9s}")
    for name, _ in CONFIGS:
        e, dd = sorted(results[name]["enc"]), sorted(results[name]["dec"])
        best = mp / (e[0] + dd[0])
        print(f"{name:18s} {e[0]*1e3:8.0f}m {dd[0]*1e3:8.0f}m "
              f"{e[len(e)//2]*1e3:8.0f}m {dd[len(dd)//2]*1e3:8.0f}m "
              f"{best:9.2f}")


if __name__ == "__main__":
    main()
