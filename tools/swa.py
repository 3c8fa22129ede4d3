"""Stochastic-weight-averaging checkpoint builder.

Averages the `params` pytree of the last K persistent checkpoints of a
training run (uniform SWA; Izmailov et al. 2018) and writes the result
as a new single-checkpoint log dir that cli.test / the codec can
restore like any trained model. Pure host work (numpy over the msgpack
pytrees) — no device touched, no new training.

Usage:
    python tools/swa.py LOG_DIR OUT_LOG_DIR [--last K]

OUT_LOG_DIR's basename must parse as a log dir name (e.g.
"0818_0000 cr oi_offline swa10") so the tester can recover the config.
The written checkpoint carries step = (max averaged itr) and only
{'params', 'step'} — opt_state is dropped, as for released zoo models.
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CKPT_RE = re.compile(r"ckpt_(\d{10})\.ckpt$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("out_log_dir")
    ap.add_argument("--last", type=int, default=10,
                    help="number of most-recent persistent ckpts")
    args = ap.parse_args()

    import flax.serialization as fser

    ckpt_dir = os.path.join(args.log_dir, "ckpts")
    itrs = sorted(int(m.group(1)) for f in os.listdir(ckpt_dir)
                  if (m := CKPT_RE.match(f)))
    picked = itrs[-args.last:]
    assert picked, f"no persistent ckpts in {ckpt_dir}"
    print(f"averaging {len(picked)} ckpts: {picked[0]}..{picked[-1]}")

    acc = None
    for itr in picked:
        with open(os.path.join(ckpt_dir, f"ckpt_{itr:010d}.ckpt"),
                  "rb") as f:
            state = fser.msgpack_restore(f.read())
        params = state["params"]
        leaves = {}

        def add(tree, into, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    add(v, into, prefix + k + "/")
                else:
                    into[prefix + k] = np.asarray(v, np.float64)
        add(params, leaves)
        if acc is None:
            acc = leaves
            template = params
        else:
            assert acc.keys() == leaves.keys()
            for k in acc:
                acc[k] += leaves[k]

    n = float(len(picked))

    def rebuild(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + k + "/")
            else:
                out[k] = (acc[prefix + k] / n).astype(
                    np.asarray(v).dtype)
        return out

    avg = rebuild(template)
    out_ckpts = os.path.join(args.out_log_dir, "ckpts")
    os.makedirs(out_ckpts, exist_ok=True)
    blob = fser.to_bytes({"params": avg, "step": picked[-1]})
    out_p = os.path.join(out_ckpts, f"ckpt_{picked[-1]:010d}.ckpt")
    with open(out_p, "wb") as f:
        f.write(blob)
    print(f"wrote {out_p} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
