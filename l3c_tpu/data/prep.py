"""Offline training-data preparation (Open Images style).

Reimplements /root/reference/src/import_train_images.py semantics:
- random Lanczos downscale so the short side is >= `min_res` (default 512)
  but only when the scale factor is <= `max_scale` (0.8) — never upscale,
  never barely-downscale (keeps resampling noise out of the data)
- DISCARD non-RGB images and saturated ones (mean HSV saturation > 0.9 or
  mean value > 0.8 — synthetic/clipart-like content hurts training)
- save as PNG to remove JPEG artifacts (import_train_images.py:131)

Plus the cache-building step of prep_openimages.sh (the download itself
needs network access; point --inp_dir at an existing dump). Parallelism:
a process pool sized to the host (this box has 1 core; the pool degrades
to sequential gracefully).

CLI:
    python -m l3c_tpu.data.prep IN_DIR OUT_DIR [--min_res 512]
        [--max_imgs N] [--workers N] [--update_cache CACHE_PKL]
"""
from __future__ import annotations

import argparse
import multiprocessing
import os
import sys
from typing import Optional, Tuple

import numpy as np


def should_discard(img_rgb: np.ndarray) -> bool:
    """Mean-HSV saturation/value filter (import_train_images.py:170-184)."""
    arr = img_rgb.astype(np.float32) / 255.0
    mx = arr.max(-1)
    mn = arr.min(-1)
    sat = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-9), 0.0)
    return bool(sat.mean() > 0.9 or mx.mean() > 0.8)


def random_scale_for(short_side: int, min_res: int, rng,
                     max_scale: float = 0.8) -> Optional[float]:
    """A random downscale factor, or None to skip this image."""
    smallest = min_res / short_side  # scale that makes short side min_res
    if smallest > max_scale:
        return None  # would need upscaling or near-identity resize
    return float(rng.uniform(smallest, max_scale))


def process_one(args: Tuple[str, str, int, int]) -> Optional[str]:
    path, out_dir, min_res, seed = args
    from PIL import Image
    try:
        with Image.open(path) as im:
            if im.mode != "RGB":
                return None
            rng = np.random.RandomState(seed)
            w, h = im.size
            scale = random_scale_for(min(w, h), min_res, rng)
            if scale is None:
                return None
            im = im.resize((max(1, round(w * scale)),
                            max(1, round(h * scale))),
                           Image.LANCZOS)
            arr = np.asarray(im)
            if should_discard(arr):
                return None
            name = os.path.splitext(os.path.basename(path))[0] + ".png"
            out_p = os.path.join(out_dir, name)
            im.save(out_p, format="PNG")
            return out_p
    except Exception as e:  # corrupt inputs are expected in web dumps
        print(f"skipping {path}: {e}", file=sys.stderr)
        return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inp_dir")
    p.add_argument("out_dir")
    p.add_argument("--min_res", type=int, default=512)
    p.add_argument("--max_imgs", type=int, default=None)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--update_cache", default=None,
                   help="also (re)build an ImagesCached pkl for OUT_DIR")
    flags = p.parse_args(argv)

    from .images import ImagesCached, iter_images_in
    os.makedirs(flags.out_dir, exist_ok=True)
    paths = iter_images_in(flags.inp_dir)
    if flags.max_imgs:
        paths = paths[: flags.max_imgs]
    work = [(q, flags.out_dir, flags.min_res, i)
            for i, q in enumerate(paths)]
    workers = flags.workers or max(1, (os.cpu_count() or 1))
    if workers > 1:
        with multiprocessing.Pool(workers) as pool:
            results = pool.map(process_one, work)
    else:
        results = [process_one(w) for w in work]
    kept = [r for r in results if r]
    print(f"kept {len(kept)}/{len(paths)} images in {flags.out_dir}")
    if flags.update_cache:
        ImagesCached(flags.out_dir,
                     flags.update_cache).paths(update_cache=True)
        print(f"updated cache {flags.update_cache}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
