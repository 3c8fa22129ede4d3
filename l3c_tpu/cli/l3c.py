"""Practical codec CLI: encode/decode a single image.

Mirrors /root/reference/src/l3c.py:
    python -m l3c_tpu.cli.l3c LOG_DIR_ROOT LOG_DATE enc IMG OUT.l3c
    python -m l3c_tpu.cli.l3c LOG_DIR_ROOT LOG_DATE dec IN.l3c OUT.png
The --device flag of the reference selects the torchac backend; here the
compute device is whatever JAX platform is active (TPU when available,
CPU otherwise) and the entropy backend is always the native rANS coder.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir_root")
    p.add_argument("log_date")
    p.add_argument("mode", choices=["enc", "dec"])
    p.add_argument("inp")
    p.add_argument("out")
    p.add_argument("--restore_itr", type=int, default=-1)
    p.add_argument("--overwrite", "-f", action="store_true")
    p.add_argument("--config_roots", default=None)
    p.add_argument("--codec_backend", default="auto",
                   choices=["auto", "tpu", "host"],
                   help="entropy backend for encoding (the reference's "
                        "--device analog; decode auto-detects from the "
                        "file's format version)")
    flags = p.parse_args(argv)

    from ..eval.tester import MultiscaleTester
    from ..utils import logdir as logdir_mod

    config_roots = (flags.config_roots.split(":") if flags.config_roots
                    else [os.path.join(os.path.dirname(__file__), "..",
                                       "configs")])
    log_dir = logdir_mod.find_log_dir(flags.log_dir_root, flags.log_date)
    tester = MultiscaleTester.from_log_dir(
        log_dir, config_roots, restore_itr=flags.restore_itr,
        use_cache=False, codec_backend=flags.codec_backend)
    if flags.overwrite and os.path.exists(flags.out):
        os.remove(flags.out)

    t0 = time.time()
    if flags.mode == "enc":
        bpsp = tester.encode_file(flags.inp, flags.out)
        print(f"encoded {flags.inp} -> {flags.out}: {bpsp:.4f} bpsp "
              f"({time.time() - t0:.2f}s)")
    else:
        tester.decode_file(flags.inp, flags.out)
        print(f"decoded {flags.inp} -> {flags.out} "
              f"({time.time() - t0:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
