"""Classical-baseline bpsp report: MED+rANS (.medl) and optimized PNG.

    python -m l3c_tpu.cli.classic IMG_DIR [IMG_DIR ...]

Prints per-directory mean bpsp of (a) the in-repo MED/JPEG-LS-style
codec (eval.classic, bit-exact round-trip asserted per image) and
(b) PIL's optimized PNG, the two classical anchors RESULTS.md quotes
against the learned models.
"""
from __future__ import annotations

import argparse
import io
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="+")
    p.add_argument("--no_png", action="store_true")
    flags = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from ..data.images import iter_images_in
    from ..eval import classic

    for d in flags.dirs:
        paths = iter_images_in(d)
        if not paths:
            print(f"{d}: no images", file=sys.stderr)
            continue
        med_bits = png_bits = subpix = 0
        for q in paths:
            img = np.asarray(Image.open(q).convert("RGB"))
            blob = classic.encode(img)
            out = classic.decode(blob)
            assert np.array_equal(out, img), f"MED round-trip failed: {q}"
            med_bits += len(blob) * 8
            subpix += img.size
            if not flags.no_png:
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG", optimize=True)
                png_bits += buf.tell() * 8
        line = f"{d}: n={len(paths)} med_bpsp={med_bits / subpix:.4f}"
        if not flags.no_png:
            line += f" png_bpsp={png_bits / subpix:.4f}"
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
