"""Evaluation runtime: bpsp over testsets, codec round-trips, sampling.

Reimplements /root/reference/src/test/multiscale_tester.py:
- configs recovered from the log-dir NAME (logdir helpers) and the
  checkpoint restored for a requested iteration (tester.py:181-199)
- bpsp eval: per image auto-crop -> pad -> jitted forward -> bpsp with
  the true (pre-pad) subpixel count -> CropLossCombinator (272-351)
- --write_to_files: real encode + decode + BIT-EXACT assert per image
  with per-stage timings (353-381) — the de-facto e2e gate
- --sample: generative sampling at scale subsets saved as PNGs (436-448)
- results cached per (dataset_id, restore_itr) in a pickle
  (TestOutputCache, 67-107), guarded by an interprocess file lock like
  the reference's fasteners.InterProcessLock (74-77).
"""
from __future__ import annotations

import contextlib
import os
import pickle
import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import blueprint
from ..codec import auto_crop
from ..codec import make_bitcoding, open_decoder
from ..config import MsConfig
from ..data.images import Testset, load_image_uint8
from ..models.network import MultiscaleNetwork
from ..utils import pad as pad_mod
from .timer import StackTimer


class TestID(NamedTuple):
    dataset_id: str
    restore_itr: int


class TestResult:
    def __init__(self):
        self.per_img: Dict[str, float] = {}

    def __setitem__(self, k, v):
        self.per_img[k] = v

    def mean_bpsp(self) -> float:
        return float(np.mean(list(self.per_img.values())))


class TestOutputCache:
    """Result cache guarded by an interprocess file lock: two testers
    sharing one log dir must not lose each other's results in the
    read-modify-write of put() (the reference guards the same cache
    with fasteners.InterProcessLock, multiscale_tester.py:74-77; here
    fcntl.flock on a sidecar .lock file — stdlib, POSIX)."""

    def __init__(self, log_dir: str):
        self.path = os.path.join(log_dir, "test_outputs.pkl")
        self._lock_path = self.path + ".lock"

    @contextlib.contextmanager
    def _locked(self):
        import fcntl
        with open(self._lock_path, "a+") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _load(self) -> Dict:
        if os.path.isfile(self.path):
            with open(self.path, "rb") as f:
                return pickle.load(f)
        return {}

    def __contains__(self, test_id: TestID) -> bool:
        with self._locked():
            return test_id in self._load()

    def get(self, test_id: TestID):
        with self._locked():
            return self._load().get(test_id)

    def put(self, test_id: TestID, result: TestResult):
        # lock held across load-modify-replace: concurrent put()s
        # serialize instead of last-writer-wins on the whole dict
        with self._locked():
            d = self._load()
            d[test_id] = result
            tmp = self.path + ".write"
            with open(tmp, "wb") as f:
                pickle.dump(d, f)
            os.replace(tmp, self.path)


class EncodeError(Exception):
    pass


class MultiscaleTester:
    def __init__(self, cfg: MsConfig, net: MultiscaleNetwork, params,
                 log_dir: Optional[str] = None, restore_itr: int = -1,
                 use_cache: bool = True, recursive: int = 0,
                 codec_backend: str = "auto",
                 crop: Optional[int] = None,
                 spatial_shard: bool = False, spatial_halo: int = 32):
        from ..utils.jaxtools import ensure_compile_cache
        ensure_compile_cache()
        self.cfg = cfg
        self.net = net
        # commit to device: numpy pytrees re-upload per jit call
        self.params = jax.device_put(params)
        self.restore_itr = restore_itr
        if recursive == "auto":
            # Decided from the PARSED CONFIG like the reference
            # (multiscale_tester.py:123-132), not from the log-dir name:
            # RGB-Shared = bicubic baseline with a single shared scale.
            recursive = (3 if (cfg.rgb_bicubic_baseline
                               and cfg.num_scales == 1) else 0)
        self.recursive = int(recursive)
        self.codec_backend = codec_backend
        # --crop: center-crop every test image to crop x crop before
        # eval/coding (reference test.py --crop / CenterCrop transform)
        self.crop = crop
        # --spatial_shard: images above the auto-crop threshold are
        # bpsp-evaluated via height-sharding + ICI halo exchange over
        # the device mesh (parallel.spatial) instead of independent
        # auto-crop tiles — the TPU-native replacement for the
        # reference's CPU-side cropping (auto_crop.py:24-36)
        self.spatial_shard = spatial_shard and jax.device_count() > 1
        self.spatial_halo = spatial_halo
        self._spatial_cache = {}  # (H, W) -> jitted bpsp fn
        self.cache = (TestOutputCache(log_dir)
                      if (log_dir and use_cache) else None)
        # skip=0 records everything; StackTimer.means() drops each
        # scope's first (compile-warmup) sample whenever >= 2 samples
        # exist, so --time_report means match the reference's
        # warmup-skipping behavior without losing single-image reports.
        self.times = StackTimer(skip=0)

        def fwd(params, x, num_sp):
            out = net.apply(params, x, train=False,
                            auto_recurse=self.recursive)
            loss = blueprint.compute_loss(
                cfg, out, num_subpixels_before_pad=num_sp,
                auto_recursive_from=(cfg.num_scales if self.recursive
                                     else None))
            return blueprint.total_bpsp(loss)

        def fwd_scales(params, x, num_sp):
            out = net.apply(params, x, train=False,
                            auto_recurse=self.recursive)
            loss = blueprint.compute_loss(
                cfg, out, num_subpixels_before_pad=num_sp,
                auto_recursive_from=(cfg.num_scales if self.recursive
                                     else None))
            return jnp.stack([jnp.asarray(b)
                              for b in loss.nonrecursive_bpsps])

        # num_subpixels_before_pad changes the loss constants -> make it
        # static so each (shape, num_sp) pair compiles once.
        self._fwd = jax.jit(fwd, static_argnums=(2,))
        # per-scale theory bpsps [scale_0..scale_{S-1}, uniform_tail]
        # for the --compare_theory breakdown (bitcoding.py:112-121)
        self._fwd_scales = jax.jit(fwd_scales, static_argnums=(2,))

    @classmethod
    def from_log_dir(cls, log_dir: str, config_roots: List[str],
                     restore_itr: int = -1, **kw) -> "MultiscaleTester":
        from ..config import load_ms_config
        from ..train.saver import Restorer
        from ..utils import logdir as logdir_mod
        _, cf_paths = logdir_mod.parse_log_dir(log_dir, config_roots)
        ms_paths = [p for p in cf_paths if os.sep + "ms" + os.sep in p]
        assert ms_paths, f"no ms config found in {log_dir} name"
        cfg = load_ms_config(ms_paths[0])
        net = MultiscaleNetwork(cfg)
        # structure-only template: eval_shape avoids ~60 eager op
        # dispatches (each ~1s of dead wait in this environment)
        params_t = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 3))))
        itr, params = Restorer(log_dir).restore_params_only(
            params_t, restore_itr)
        return cls(cfg, net, params, log_dir=log_dir, restore_itr=itr,
                   **kw)

    # ------------------------------------------------------------- bpsp

    def test(self, testset: Testset) -> TestResult:
        tid = TestID(testset.id, self.restore_itr)
        if self.cache is not None:
            hit = self.cache.get(tid)
            if hit is not None:
                return hit
        result = TestResult()
        for p in testset:
            result[os.path.basename(p)] = self._bpsp_of_image(p)
        if self.cache is not None:
            self.cache.put(tid, result)
        return result

    def test_all(self, testsets: List[Testset]) -> List[tuple]:
        """[(testset_id, mean_bpsp)] — the aligned-table rows."""
        return [(ts.id, self.test(ts).mean_bpsp()) for ts in testsets]

    def _load(self, path: str) -> np.ndarray:
        img = load_image_uint8(path)[None]  # (1,H,W,3)
        if self.crop:
            _, H, W, _ = img.shape
            t = max(0, (H - self.crop) // 2)
            l = max(0, (W - self.crop) // 2)
            img = img[:, t: t + self.crop, l: l + self.crop]
        return img

    def _bpsp_of_image(self, path: str) -> float:
        img = self._load(path)
        if (self.spatial_shard and auto_crop.needs_crop(img)
                and not self.recursive):
            return self._spatial_bpsp(img)
        comb = auto_crop.CropLossCombinator()
        fac = self.cfg.padding_fac * (2 ** self.recursive)
        for crop in auto_crop.iter_crops(img):
            num_sp = int(np.prod(crop.shape))
            padded, _ = pad_mod.pad(crop, fac, mode="constant")
            bpsp = float(self._fwd(self.params,
                                   jnp.asarray(padded, jnp.float32),
                                   num_sp))
            comb.add(bpsp, num_sp)
        return comb.get_bpsp()

    def _spatial_bpsp(self, img: np.ndarray) -> float:
        """bpsp of one large image via height-sharding over the mesh:
        ONE exact-forward pass with halo exchange instead of independent
        auto-crop tiles. H is padded up to n_devices * 2^S (W to the
        normal padding factor); padded subpixels are coded like the
        canonical path's pad and the denominator stays the TRUE
        subpixel count, so numbers are comparable with auto-crop."""
        from ..parallel import mesh as mesh_mod
        from ..parallel import spatial
        _, H, W, _ = img.shape
        n = jax.device_count()
        S = self.cfg.num_scales
        fac_h = n * (1 << S)
        Hp = H + (-H) % fac_h
        # halo: multiple of 2^S, at least one scale step, at most one
        # slab (halo_exchange is single-hop)
        halo = max(self.spatial_halo, 1 << S)
        halo += (-halo) % (1 << S)
        halo = min(halo, Hp // n)
        Wp = W + (-W) % self.cfg.padding_fac
        padded = np.zeros((1, Hp, Wp, 3), img.dtype)
        padded[:, :H, :W] = img
        if W < Wp:
            padded[:, :H, W:] = img[:, :, -1:]          # replicate cols
        if H < Hp:
            padded[:, H:] = padded[:, H - 1: H]          # replicate rows
        key = (Hp, Wp)
        if key not in self._spatial_cache:
            mesh = mesh_mod.make_mesh()
            self._spatial_cache[key] = spatial.spatial_bpsp_fn(
                self.cfg, self.net, mesh, Hp, Wp, halo)
        bpsp_padded = float(self._spatial_cache[key](
            self.params, jnp.asarray(padded)))
        # fn divides by the padded subpixel count; rescale to the true one
        return bpsp_padded * (Hp * Wp) / (H * W)

    # ------------------------------------------------------- round-trip

    def write_to_files(self, testset: Testset, out_dir: str,
                       time_report: Optional[str] = None,
                       compare_theory: bool = False,
                       group: int = 8,
                       fanout: bool = False) -> TestResult:
        """Encode+decode every image, assert bit-exact, return real bpsp.

        Same-shape images are grouped (up to `group` at a time) through
        the codec's BATCHED encode/decode so the fused rANS scans run
        wide instead of once per image; with `fanout` (and >1 device)
        the groups round-robin across mesh chips via
        parallel.fanout.CodecFanout. Images above the auto-crop
        threshold, odd shapes' remainders, and the host backend keep
        the single-image path. Grouped files record their group's
        fbatch in the header (the determinism contract), so a file
        coded in a group of 8 has slightly different — equally valid —
        bytes than one coded alone.

        compare_theory also evaluates the cross-entropy bpsp per image
        and prints the actual-vs-theory overhead (bitcoding.py:112-121).
        """
        if self.recursive:
            # matches the reference: coding the recursively-applied
            # shared model is not supported by either implementation
            # (bitcoding.py:73, multiscale_tester.py:187-188)
            raise NotImplementedError(
                "--write_to_files not implemented for --recursive")
        os.makedirs(out_dir, exist_ok=True)
        # `size` coder profile: eval numbers are bitrate headlines,
        # so spend longer rANS streams (fewer per-stream framing
        # bytes) — serving/bench keep the faster `balanced` default
        bc = make_bitcoding(self.cfg, self.net, self.params,
                            times=self.times, backend=self.codec_backend,
                            coder_profile="size")
        fan = None
        if (fanout and jax.device_count() > 1
                and hasattr(bc, "encode_batch")):
            from ..parallel.fanout import CodecFanout
            fan = CodecFanout(self.cfg, self.net, self.params,
                              group=group, coder_profile="size")
        result = TestResult()
        # group by post-crop shape without decoding pixels yet
        from PIL import Image as PILImage
        by_shape: Dict[tuple, List[str]] = {}
        for p in testset:
            with PILImage.open(p) as im:
                w, h = im.size
            if self.crop:
                h, w = min(h, self.crop), min(w, self.crop)
            by_shape.setdefault((h, w), []).append(p)

        def pout_of(p):
            pout = os.path.join(
                out_dir,
                os.path.splitext(os.path.basename(p))[0] + ".l3c")
            if os.path.exists(pout):
                os.remove(pout)
            return pout

        for (h, w), paths in sorted(by_shape.items()):
            batchable = (hasattr(bc, "encode_batch")
                         and h * w <= auto_crop.needs_crop_dim())
            if not batchable:
                for p in paths:
                    self._roundtrip_single(bc, p, pout_of(p), result,
                                           compare_theory)
                continue
            for i in range(0, len(paths), group):
                chunk = paths[i: i + group]
                imgs = [self._load(p) for p in chunk]
                pouts = [pout_of(p) for p in chunk]
                with self.times.run("enc"):
                    if fan is not None:
                        bpsps = fan.encode_paths(imgs, pouts)
                    else:
                        bpsps = bc.encode_batch(imgs, pouts)
                with self.times.run("dec"):
                    if fan is not None:
                        outs = fan.decode_paths(pouts)
                    else:
                        outs = bc.decode_batch(pouts)
                unit_bytes = (getattr(bc, "last_unit_bytes", None)
                              if fan is None else None)
                for b, (p, img, out, bpsp) in enumerate(
                        zip(chunk, imgs, outs, bpsps)):
                    if not np.array_equal(out, img):
                        raise EncodeError(f"round-trip mismatch for {p}")
                    if compare_theory:
                        self._print_theory_comparison(
                            p, img, bc, bpsp,
                            unit_bytes=(unit_bytes[b] if unit_bytes
                                        else None))
                    result[os.path.basename(p)] = bpsp
                self.times.next_iteration()
        if time_report:
            with open(time_report, "w") as f:
                f.write(self.times.report())
        return result

    def _roundtrip_single(self, bc, p: str, pout: str,
                          result: "TestResult", compare_theory: bool):
        """Single-image round-trip (auto-crop capable, any backend)."""
        img = self._load(p)
        with self.times.run("enc"):
            bpsp = bc.encode(img, pout)
        with self.times.run("dec"):
            out = bc.decode(
                pout if not auto_crop.needs_crop(img)
                else pout + ".part0")
        if not np.array_equal(out, img):
            raise EncodeError(f"round-trip mismatch for {p}")
        if compare_theory:
            self._print_theory_comparison(p, img, bc, bpsp)
        result[os.path.basename(p)] = bpsp
        self.times.next_iteration()

    def _print_theory_comparison(self, path: str, img: np.ndarray, bc,
                                 actual_bpsp: float,
                                 unit_bytes: Optional[List[int]] = None):
        """--compare_theory: per-scale theory vs per-unit assumed vs
        actual-on-disk, mirroring the reference's format
        (bitcoding.py:105-121). unit_bytes: THIS image's per-unit byte
        counts (batched path); defaults to bc.last_unit_bytes[0]."""
        num_sp = int(np.prod(img.shape))
        # per-scale theory: combine over auto-crop tiles by subpixels
        fac = self.cfg.padding_fac * (2 ** self.recursive)
        theory = None
        for crop in auto_crop.iter_crops(img):
            c_sp = int(np.prod(crop.shape))
            padded, _ = pad_mod.pad(crop, fac, mode="constant")
            t = np.asarray(self._fwd_scales(
                self.params, jnp.asarray(padded, jnp.float32), c_sp))
            t = t * (c_sp / num_sp)
            theory = t if theory is None else theory + t
        # assumed: per-unit on-disk bytes mapped onto scales
        if unit_bytes is None:
            all_units = getattr(bc, "last_unit_bytes", None)
            unit_bytes = all_units[0] if all_units else None
        tostr = (lambda v: " | ".join(f"{x:.3f}" for x in v)
                 + f" => {sum(v):.3f}")
        print(f"{os.path.basename(path)} bitrates:")
        print(f"theory:  {tostr(list(theory))}  "
              "(scale_0..scale_N, uniform tail)")
        if unit_bytes:
            labels = bc.unit_scale_map()
            per_scale = {}
            for lab, nb in zip(labels, unit_bytes):
                per_scale[lab] = per_scale.get(lab, 0) + nb
            S = self.cfg.num_scales
            order = [f"scale_{s}" for s in range(S)] + ["uniform"]
            assumed = [per_scale.get(k, 0) * 8 / num_sp for k in order]
            overhead = (sum(assumed) / float(sum(theory)) - 1) * 100
            print(f"assumed: {tostr(assumed)} [{overhead:+.2f}%]")
        print(f"actual:                       => {actual_bpsp:.3f}  "
              f"[{(actual_bpsp / float(sum(theory)) - 1) * 100:+.2f}% "
              "incl. header]")

    # --------------------------------------------------------- sampling

    def sample(self, testset: Testset, out_dir: str,
               sample_scale_sets=((), (0,), (0, 1)), seed: int = 0):
        """Save sampled reconstructions per image per scale subset
        (multiscale_tester.py:436-448)."""
        from PIL import Image
        os.makedirs(out_dir, exist_ok=True)
        fac = self.cfg.padding_fac
        for p in testset:
            img = self._load(p)
            padded, _ = pad_mod.pad(img, fac, mode="constant")
            x = jnp.asarray(padded, jnp.float32)
            for scales in sample_scale_sets:
                s = self.net.apply(
                    self.params, x, jax.random.PRNGKey(seed),
                    tuple(scales),
                    method=MultiscaleNetwork.sample_forward)
                arr = np.clip(np.asarray(s)[0], 0, 255).astype(np.uint8)
                name = (os.path.splitext(os.path.basename(p))[0]
                        + "_sample" + "_".join(map(str, scales)) + ".png")
                Image.fromarray(arr).save(os.path.join(out_dir, name))

    # ------------------------------------------------- single-file codec

    def encode_file(self, img_path: str, out_path: str) -> float:
        bc = make_bitcoding(self.cfg, self.net, self.params,
                            times=self.times, backend=self.codec_backend)
        img = self._load(img_path)
        if os.path.exists(out_path):
            raise EncodeError(f"{out_path} exists")
        return bc.encode(img, out_path)

    def decode_file(self, in_path: str, out_png: str):
        from PIL import Image
        parts = in_path
        if not os.path.exists(in_path) and os.path.exists(
                in_path + ".part0"):
            parts = in_path + ".part0"
        bc = open_decoder(parts, self.cfg, self.net, self.params,
                          times=self.times)
        img = bc.decode(parts)
        Image.fromarray(img[0]).save(out_png)
