"""Tests for config parsing, logdir naming, summarizer, timer, printer,
and the data-prep filters."""
import os

import numpy as np
import pytest

from l3c_tpu import config as config_mod
from l3c_tpu.data import prep
from l3c_tpu.eval.timer import StackTimer, NoOpTimer
from l3c_tpu.utils import logdir as logdir_mod
from l3c_tpu.utils.printer import AlignedPrinter
from l3c_tpu.utils import summarizer as summ


PKG_CONFIGS = os.path.join(os.path.dirname(__file__), "..", "l3c_tpu",
                           "configs")


# ------------------------------------------------------------- config

def test_parse_cr_cf():
    cfg = config_mod.load_ms_config(os.path.join(PKG_CONFIGS, "ms/cr.cf"))
    assert cfg.num_scales == 3 and cfg.Cf == 64
    assert cfg.q.C == 5 and cfg.q.L == 25
    assert cfg.q.levels_range == (-1, 1)
    assert cfg.prob.K == 10
    assert cfg.lr_schedule == "exp_0.75_e5"
    assert not cfg.rgb_bicubic_baseline


def test_parse_cf_inheritance():
    cfg = config_mod.load_ms_config(
        os.path.join(PKG_CONFIGS, "ms/cr_rgb_shared.cf"))
    assert cfg.rgb_bicubic_baseline and cfg.num_scales == 1
    assert cfg.enc.cls == "BicubicSubsampling" and not cfg.dec.skip
    # two-level inheritance
    cfg = config_mod.load_ms_config(
        os.path.join(PKG_CONFIGS, "ms/cr_rgb.cf"))
    assert cfg.rgb_bicubic_baseline and cfg.num_scales == 3
    assert cfg.dec.skip


def test_overrides_and_unknown_keys():
    over = config_mod.parse_overrides(["q.L=13", "lr.schedule=none"])
    cfg = config_mod.load_ms_config(
        os.path.join(PKG_CONFIGS, "ms/cr.cf"), over)
    assert cfg.q.L == 13 and cfg.lr_schedule == "none"
    with pytest.raises(ValueError, match="Unknown"):
        config_mod.load_ms_config(os.path.join(PKG_CONFIGS, "ms/cr.cf"),
                                  {"not_a_key": 1})


# ------------------------------------------------------------- logdir

def test_logdir_roundtrip(tmp_path):
    root = str(tmp_path / "logs")
    cfg_root = str(tmp_path / "configs")
    os.makedirs(os.path.join(cfg_root, "ms"))
    os.makedirs(os.path.join(cfg_root, "dl"))
    ms = os.path.join(cfg_root, "ms", "tiny.cf")
    dl = os.path.join(cfg_root, "dl", "oi.cf")
    open(ms, "w").write("num_scales = 3\n")
    open(dl, "w").write("crop_size = 128\n")
    d = logdir_mod.create_unique_log_dir(root, [ms, dl])
    date, cf_paths = logdir_mod.parse_log_dir(d, [cfg_root])
    assert logdir_mod.log_date_from_log_dir(d) == date
    assert sorted(os.path.basename(p) for p in cf_paths) == \
        ["oi.cf", "tiny.cf"]
    assert logdir_mod.find_log_dir(root, date) == d
    # collision bumps the minute
    d2 = logdir_mod.create_unique_log_dir(root, [ms, dl])
    assert d2 != d


# --------------------------------------------------------- summarizer

class FakeWriter:
    def __init__(self):
        self.scalars = {}
        self.images = {}
        self.histos = {}
        self.figures = {}

    def add_scalar(self, tag, v, step):
        self.scalars[tag] = (v, step)

    def add_image(self, tag, img, step, dataformats="HWC"):
        self.images[tag] = img

    def add_histogram(self, tag, v, step):
        self.histos[tag] = np.asarray(v)

    def add_histogram_counts(self, tag, counts, edges, step):
        self.histos[tag] = (np.asarray(counts), np.asarray(edges))

    def add_figure(self, tag, fig, step):
        self.figures[tag] = fig


def test_summarizer_gating():
    w = FakeWriter()
    s = summ.Summarizer(w)
    s.scalar("x", 1.0)          # disabled: dropped
    assert not w.scalars
    s.enable("train", 10)
    s.scalar("x", 2.0)
    assert w.scalars["train/x"] == (2.0, 10)
    s.image("img", np.zeros((4, 4)))
    assert w.images["train/img"].shape == (4, 4, 3)
    s.disable()
    s.scalar("y", 3.0)
    assert "train/y" not in w.scalars


def test_bottleneck_image_and_histogram():
    syms = np.arange(25).reshape(5, 5)
    img = summ.bottleneck_image(syms, 25)
    assert img.dtype == np.uint8 and img.max() <= 255
    h = summ.symbol_histogram(syms, 25)
    np.testing.assert_allclose(h.sum(), 1.0)
    assert h.shape == (25,)


# -------------------------------------------------------------- timer

def test_stack_timer_nesting_and_skip():
    t = StackTimer(skip=1)
    for _ in range(3):
        with t.prefix_scope("[0]"):
            with t.run("a"):
                pass
        t.next_iteration()
    means = t.means()
    assert "[0]/a" in means and len(t._times["[0]/a"]) == 2  # skip=1
    assert "a:" in t.report()
    # NoOp never fails
    n = NoOpTimer()
    with n.prefix_scope("x"):
        with n.run("y"):
            pass
    assert n.report() == ""


# ------------------------------------------------------------ printer

def test_aligned_printer():
    p = AlignedPrinter()
    p.append("a", "bb", "c")
    p.append("longer", "x", "yy")
    out = str(p)
    lines = out.split("\n")
    assert lines[0].startswith("a     ")
    assert "longer" in lines[1]


# ---------------------------------------------------------- data prep

def test_prep_discard_rules():
    gray = np.full((8, 8, 3), 100, np.uint8)       # low sat, low value
    assert not prep.should_discard(gray)
    saturated = np.zeros((8, 8, 3), np.uint8)
    saturated[..., 0] = 255                        # pure red: sat=1
    assert prep.should_discard(saturated)
    bright = np.full((8, 8, 3), 250, np.uint8)     # value ~0.98
    assert prep.should_discard(bright)


def test_prep_random_scale():
    rng = np.random.RandomState(0)
    assert prep.random_scale_for(500, 512, rng) is None   # would upscale
    assert prep.random_scale_for(600, 512, rng) is None   # scale > 0.8
    s = prep.random_scale_for(2000, 512, rng)
    assert 512 / 2000 <= s <= 0.8


def test_prep_process_one(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    img = rng.randint(0, 180, (800, 1200, 3)).astype(np.uint8)
    p = str(tmp_path / "in.jpg")
    Image.fromarray(img).save(p, quality=90)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    r = prep.process_one((p, out_dir, 512, 0))
    assert r and r.endswith(".png")
    with Image.open(r) as im:
        assert min(im.size) >= 512


def test_images_cached_cli(tmp_path):
    from PIL import Image
    from l3c_tpu.data import images as images_mod
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            str(d / f"i{i}.png"))
    pkl = str(tmp_path / "cache.pkl")
    assert images_mod._cache_cli(["update", pkl, str(d)]) == 0
    assert images_mod._cache_cli(["show", pkl]) == 0
    # cached listing is served without rescanning
    ps = images_mod.ImagesCached(str(d), pkl).paths()
    assert len(ps) == 3


def test_synth_families(tmp_path):
    """Procedural source families: every generator yields a valid uint8
    RGB tile, deterministic under a fixed seed, and generate_families
    writes loadable PNGs (data/synth.py; corpus-diversity aid for the
    reference's Open Images download, prep_openimages.sh:39-53)."""
    import numpy as np
    from PIL import Image
    from l3c_tpu.data import synth

    for fam in synth.FAMILIES:
        a = synth.render_tile(fam, np.random.RandomState(3), n=64)
        b = synth.render_tile(fam, np.random.RandomState(3), n=64)
        assert a.shape == (64, 64, 3) and a.dtype == np.uint8, fam
        np.testing.assert_array_equal(a, b)
        assert a.std() > 5, (fam, "degenerate tile")

    paths = synth.generate_families(str(tmp_path), tiles_per_family=2,
                                    n=32, families=["spectral", "sky"])
    assert len(paths) == 4
    im = np.asarray(Image.open(paths[0]))
    assert im.shape == (32, 32, 3)
