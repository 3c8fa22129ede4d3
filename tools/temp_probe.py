"""Probe: test-time temperature calibration of the mixture scales.

A model trained on the offline synth-heavy corpus is MISCALIBRATED on
real held-out photos (RESULTS.md rounds 3-5: theory bpsp 4.3-4.6 vs the
classical anchor's 3.3). The cheapest honest fix a codec can apply is a
per-image temperature on the logistic scales: sigma -> t * sigma,
i.e. log_scales += log(t), chosen at encode time and stored in the file
header, applied identically at decode (same jitted expression both
sides - the determinism contract of CLAUDE.md holds because t is data,
not code). This probe measures how much such a knob could buy BEFORE
any codec plumbing is built:

  per scale s and temperature t: bpsp_s(t) with log-scale slots of P[s]
  shifted by log(t). Scale costs are separable, so each scale's optimum
  is independent; the probe prints the per-scale sweep, the jointly
  calibrated total, and the t=1 baseline.

Usage:  python tools/temp_probe.py [ckpt_dir] [n_tiles]
CPU-forced; uses demo_data/real/val tiles.
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TEMPS = np.array([0.6, 0.7, 0.8, 0.9, 0.95, 1.0, 1.05, 1.1, 1.2, 1.35,
                  1.5, 1.75, 2.0, 2.5, 3.0], dtype=np.float32)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ckpt = argv[0] if argv else "models_zoo/0819_0307 cr oi_offline r4long"
    n_tiles = int(argv[1]) if len(argv) > 1 else 16

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from l3c_tpu import blueprint
    from l3c_tpu.config import MsConfig
    from l3c_tpu.models import dmll
    from l3c_tpu.models.network import MultiscaleNetwork
    from l3c_tpu.train.saver import Restorer

    cfg = MsConfig()
    net = MultiscaleNetwork(cfg)
    params_t = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3), jnp.float32)))
    itr, params = Restorer(ckpt).restore_params_only(params_t)
    print(f"# ckpt {ckpt!r} @ itr {itr}")

    # 256x256 tiles only (one jit shape; 76/117 of the val split)
    paths = [p for p in sorted(glob.glob("demo_data/real/val/*.png"))
             if Image.open(p).size == (256, 256)][:n_tiles]
    assert paths, "no 256x256 val tiles found"
    x = np.stack([np.asarray(Image.open(p).convert("RGB"))
                  for p in paths]).astype(np.float32)
    print(f"# {len(paths)} val tiles, {x.shape}")

    spec0, spec_n = blueprint.rgb_spec(cfg), blueprint.bn_spec(cfg)
    num_subpix = float(np.prod(x.shape))
    conv = float(np.log(2.0) * num_subpix)

    @jax.jit
    def forward_costs(params, x, log_ts):
        """bitcost per (scale, temp): log_ts (S,T) shifts scale s's
        log-scale slots by log_ts[s, t]. Slot layout per
        dmll._reshape_l: kp = ((p*C)+c)*K + k, so slot p=2 (log sigma)
        occupies channels [2*C*K, 3*C*K)."""
        out = net.apply(params, x, train=False)
        res = []
        for s in range(len(out.P)):
            spec = spec0 if s == 0 else spec_n
            target = (out.S[0].astype(jnp.float32) if s == 0
                      else out.bn[s])
            C = target.shape[-1]
            K = dmll.non_shared_get_K(out.P[s].shape[-1], C)
            lo, hi = 2 * C * K, 3 * C * K

            def cost_at(lt, P=out.P[s], t=target, sp=spec, lo=lo, hi=hi):
                P2 = P.at[..., lo:hi].add(lt)
                return dmll.bitcost(sp, t, P2)

            res.append(jax.vmap(cost_at)(log_ts[s]))
        # uniform tail of the coarsest scale (temperature-independent)
        tail = blueprint.uniform_tail_nats(cfg, out, len(out.S) - 1)
        return jnp.stack(res), tail

    S = cfg.num_scales
    log_ts = np.tile(np.log(TEMPS)[None], (S, 1))
    costs, tail = forward_costs(params, jnp.asarray(x),
                                jnp.asarray(log_ts))
    costs = np.asarray(costs) / conv     # (S, T) bpsp
    tail = float(tail) / conv

    i1 = int(np.where(TEMPS == 1.0)[0][0])
    print(f"\n{'t':>6}", *[f"s{s:>8}" for s in range(S)], sep="  ")
    for j, t in enumerate(TEMPS):
        print(f"{t:6.2f}", *[f"{costs[s, j]:8.4f}" for s in range(S)],
              sep="  ")
    base = costs[:, i1].sum() + tail
    best_j = costs.argmin(axis=1)
    cal = costs[np.arange(S), best_j].sum() + tail
    print(f"\nbaseline t=1     : {base:.4f} bpsp (tail {tail:.4f})")
    print("per-scale best t :",
          [f"s{s}={TEMPS[j]:.2f}" for s, j in enumerate(best_j)])
    print(f"calibrated total : {cal:.4f} bpsp  (gain {base - cal:+.4f})")


if __name__ == "__main__":
    main()
