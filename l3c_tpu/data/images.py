"""Host data pipeline: cached file listings, crop/flip batching, testsets.

Reimplements the reference data layer for a JAX host loop:
- ImagesCached (images_loader.py:132-250): recursive folder listings
  pickled next to the data with a min_size filter, for slow filesystems.
- Batch iterator replacing IndexImagesDataset + DataLoader
  (images_loader.py:39-97, multiscale_trainer.py:116-148): random
  128-crops + horizontal flips of uint8 images, NHWC numpy batches,
  loaded on a background thread so the accelerator step overlaps IO.
- Testset (helpers/testset.py:31-105): sorted listing of a folder or a
  single file, deterministic linspace subsample for max_imgs, stable id.
"""
from __future__ import annotations

import glob
import os
import pickle
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp")


def _is_image(p: str) -> bool:
    return p.lower().endswith(IMG_EXTS)


def iter_images_in(root_or_glob: str) -> List[str]:
    """Accepts a dir, a glob, or a single file; returns sorted paths."""
    if os.path.isfile(root_or_glob):
        return [root_or_glob]
    if os.path.isdir(root_or_glob):
        out = []
        for base, _, files in os.walk(root_or_glob):
            out.extend(os.path.join(base, f) for f in files
                       if _is_image(f))
        return sorted(out)
    return sorted(p for p in glob.glob(root_or_glob, recursive=True)
                  if _is_image(p))


class ImagesCached:
    """Pickle-cached recursive file listing with min-size filtering."""

    def __init__(self, spec: str, cache_pkl: Optional[str] = None,
                 min_size: Optional[int] = None):
        self.spec = spec
        self.cache_pkl = cache_pkl
        self.min_size = min_size

    def _cache_key(self):
        return (self.spec, self.min_size)

    def paths(self, update_cache: bool = False) -> List[str]:
        cache = {}
        if self.cache_pkl and os.path.isfile(self.cache_pkl):
            with open(self.cache_pkl, "rb") as f:
                cache = pickle.load(f)
            if not update_cache and self._cache_key() in cache:
                return cache[self._cache_key()]
        ps = iter_images_in(self.spec)
        if self.min_size:
            ps = [p for p in ps if self._min_dim(p) >= self.min_size]
        if self.cache_pkl:
            cache[self._cache_key()] = ps
            tmp = self.cache_pkl + ".write"
            with open(tmp, "wb") as f:
                pickle.dump(cache, f)
            os.replace(tmp, self.cache_pkl)
        return ps

    @staticmethod
    def _min_dim(p: str) -> int:
        with Image.open(p) as im:
            return min(im.size)


def load_image_uint8(p: str) -> np.ndarray:
    """(H,W,3) uint8; non-RGB images are converted (RGBA -> drop alpha)."""
    with Image.open(p) as im:
        if im.mode != "RGB":
            im = im.convert("RGB")
        return np.asarray(im, dtype=np.uint8)


def random_crop_flip(img: np.ndarray, crop: int,
                     rng: np.random.RandomState,
                     strong: bool = False) -> np.ndarray:
    h, w = img.shape[:2]
    if h < crop or w < crop:  # upscale-pad tiny images by reflection
        img = np.pad(img, ((0, max(0, crop - h)), (0, max(0, crop - w)),
                           (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    y = rng.randint(0, h - crop + 1)
    x = rng.randint(0, w - crop + 1)
    out = img[y:y + crop, x:x + crop]
    if rng.rand() < 0.5:
        out = out[:, ::-1]
    if strong:
        out = _strong_aug(out, rng)
    return out


def _strong_aug(out: np.ndarray, rng: np.random.RandomState
                ) -> np.ndarray:
    """Photo-statistics-preserving augmentation for SMALL corpora
    (dl.aug_strong; the reference trains on 300k distinct photos and
    needs none of this). Channel permutation keeps cross-channel
    correlation structure while decorrelating absolute hue; gamma
    jitter emulates exposure variation; both leave the sensor-noise /
    texture statistics a lossless coder must learn intact."""
    if rng.rand() < 0.5:
        out = out[:, :, rng.permutation(3)]
    if rng.rand() < 0.5:
        g = np.float32(rng.uniform(0.7, 1.4))
        lut = (np.power(np.arange(256, dtype=np.float32) / 255.0, g)
               * 255.0 + 0.5).astype(np.uint8)
        out = lut[out]
    if rng.rand() < 0.3:  # vertical flip: textures/scenes both survive
        out = out[::-1]
    return np.ascontiguousarray(out)


class TrainBatches:
    """Infinite iterator of (B, crop, crop, 3) uint8 batches.

    Replaces DataLoader(num_workers=8): one background thread prefetches
    the next batches while the TPU computes (this host has 1 core; the
    thread still overlaps PIL decode with device compute).
    """

    def __init__(self, paths: Sequence[str], batch_size: int,
                 crop_size: int, seed: int = 0, prefetch: int = 2,
                 aug_strong: bool = False):
        assert paths, "no training images found"
        self.paths = list(paths)
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.seed = seed
        self.aug_strong = aug_strong
        self._q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    @property
    def epoch_len(self) -> int:
        return max(1, len(self.paths) // self.batch_size)

    def _worker(self):
        rng = np.random.RandomState(self.seed)
        while not self._stop.is_set():
            idx = rng.randint(0, len(self.paths), size=self.batch_size)
            batch = np.stack([
                random_crop_flip(load_image_uint8(self.paths[i]),
                                 self.crop_size, rng,
                                 strong=self.aug_strong)
                for i in idx])
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self._q.get()

    def close(self):
        self._stop.set()


class Testset:
    """Sorted image list with deterministic subsampling and a stable id."""

    def __init__(self, root_or_glob: str, max_imgs: Optional[int] = None,
                 name: Optional[str] = None,
                 append_id: Optional[str] = None):
        ps = iter_images_in(root_or_glob)
        if not ps:
            raise ValueError(f"no images found for {root_or_glob!r}")
        if max_imgs and max_imgs < len(ps):
            sel = np.linspace(0, len(ps) - 1, max_imgs).astype(int)
            ps = [ps[i] for i in sel]
        self.paths = ps
        base = name or os.path.basename(os.path.normpath(root_or_glob))
        self.id = f"{base}_{len(ps)}"
        if append_id:
            self.id += append_id

    def filter_filenames(self, keep: "list[str]"):
        """Keep only images whose extension-less basename is in `keep`
        (test.py --match_filenames, reference testset.py:73-77)."""
        name = lambda p: os.path.splitext(os.path.basename(p))[0]
        kept = [p for p in self.paths if name(p) in keep]
        if not kept:
            raise ValueError(f"no files left after filtering for {keep}")
        self.paths = kept

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        return iter(self.paths)


def _cache_cli(argv=None):
    """Maintain listing caches: mirrors the reference's
    `python images_loader.py update|show CACHE_PKL SPEC` CLI
    (images_loader.py:132-271)."""
    import argparse
    p = argparse.ArgumentParser(description=_cache_cli.__doc__)
    p.add_argument("mode", choices=["update", "show"])
    p.add_argument("cache_pkl")
    p.add_argument("spec", nargs="?", default=None)
    p.add_argument("--min_size", type=int, default=None)
    flags = p.parse_args(argv)
    if flags.mode == "update":
        assert flags.spec, "update needs a dir/glob SPEC"
        ps = ImagesCached(flags.spec, flags.cache_pkl,
                          flags.min_size).paths(update_cache=True)
        print(f"cached {len(ps)} paths for {flags.spec!r}")
    else:
        with open(flags.cache_pkl, "rb") as f:
            cache = pickle.load(f)
        for (spec, min_size), ps in cache.items():
            print(f"{spec!r} min_size={min_size}: {len(ps)} paths")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_cache_cli())
