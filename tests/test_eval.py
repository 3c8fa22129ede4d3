"""Eval runtime tests: tester bpsp, round-trip gate, sampling, cache."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from l3c_tpu.config import MsConfig, EncConfig, DecConfig, QConfig, ProbConfig
from l3c_tpu.data.images import Testset
from l3c_tpu.eval.tester import MultiscaleTester, TestID
from l3c_tpu.models.network import MultiscaleNetwork


def small_cfg():
    return MsConfig(num_scales=2, Cf=8,
                    enc=EncConfig(num_blocks=1), dec=DecConfig(num_blocks=1),
                    q=QConfig(C=2, L=25), prob=ProbConfig(K=2))


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = rng.randint(0, 256, (20, 24, 3)).astype(np.uint8)
        Image.fromarray(arr).save(str(d / f"im{i}.png"))
    return str(d)


@pytest.fixture(scope="module")
def tester_setup(img_dir, tmp_path_factory):
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)))
    log_dir = str(tmp_path_factory.mktemp("logdir"))
    return cfg, net, params, log_dir


def test_bpsp_eval_and_cache(tester_setup, img_dir):
    cfg, net, params, log_dir = tester_setup
    ts = Testset(img_dir)
    t = MultiscaleTester(cfg, net, params, log_dir=log_dir)
    res = t.test(ts)
    assert len(res.per_img) == 3
    assert 0 < res.mean_bpsp() < 50
    # cached second run returns identical numbers
    t2 = MultiscaleTester(cfg, net, params, log_dir=log_dir)
    res2 = t2.test(ts)
    assert res2.per_img == res.per_img
    assert TestID(ts.id, -1) in t2.cache


def test_write_to_files_roundtrip_gate(tester_setup, img_dir, tmp_path):
    cfg, net, params, log_dir = tester_setup
    ts = Testset(img_dir, max_imgs=1)
    t = MultiscaleTester(cfg, net, params)
    out = str(tmp_path / "enc")
    report = str(tmp_path / "times.txt")
    res = t.write_to_files(ts, out, time_report=report)
    assert len(res.per_img) == 1
    assert os.path.isfile(report)
    assert any(f.endswith(".l3c") for f in os.listdir(out))


def test_sampling_modes(tester_setup, img_dir, tmp_path):
    cfg, net, params, log_dir = tester_setup
    ts = Testset(img_dir, max_imgs=1)
    t = MultiscaleTester(cfg, net, params)
    out = str(tmp_path / "samples")
    t.sample(ts, out, sample_scale_sets=((), (0,)))
    pngs = os.listdir(out)
    assert len(pngs) == 2
    for p in pngs:
        with Image.open(os.path.join(out, p)) as im:
            assert im.size == (24, 20)  # (W,H), already /4


def test_testset_filter_and_crop(tester_setup, img_dir, capsys):
    """--match_filenames keeps only listed names; --crop center-crops
    every image before eval (reference test.py:44-104)."""
    cfg, net, params, log_dir = tester_setup
    ts = Testset(img_dir, append_id="_crop16")
    assert ts.id.endswith("_crop16")
    ts.filter_filenames(["im0", "im2"])
    assert [os.path.basename(p) for p in ts] == ["im0.png", "im2.png"]
    with pytest.raises(ValueError):
        ts.filter_filenames(["nope"])

    t = MultiscaleTester(cfg, net, params, use_cache=False, crop=16)
    img = t._load(ts.paths[0])
    assert img.shape == (1, 16, 16, 3)
    bpsp = t._bpsp_of_image(ts.paths[0])
    assert np.isfinite(bpsp) and bpsp > 0


def test_compare_theory_per_scale_breakdown(tester_setup, img_dir,
                                            tmp_path, capsys):
    """--compare_theory prints per-scale theory and per-unit assumed
    rows (reference bitcoding.py:105-121 format)."""
    cfg, net, params, log_dir = tester_setup
    ts = Testset(img_dir, max_imgs=1)
    t = MultiscaleTester(cfg, net, params, use_cache=False)
    t.write_to_files(ts, str(tmp_path / "wtf"), compare_theory=True)
    out = capsys.readouterr().out
    assert "theory:" in out and "assumed:" in out and "actual:" in out
    # one bitrate column per scale + the uniform tail
    theory_line = [ln for ln in out.splitlines() if "theory:" in ln][0]
    assert theory_line.count("|") == cfg.num_scales


def test_write_to_files_batched_groups(tester_setup, img_dir, tmp_path):
    """Same-shape images go through encode_batch/decode_batch in one
    group (fbatch recorded per group), mixed shapes fall back cleanly,
    and every file round-trips bit-exactly."""
    cfg, net, params, log_dir = tester_setup
    # add one odd-shaped image so two shape groups exist
    odd_dir = str(tmp_path / "mixed")
    os.makedirs(odd_dir)
    rng = np.random.RandomState(3)
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (20, 24, 3)).astype(
            np.uint8)).save(os.path.join(odd_dir, f"a{i}.png"))
    Image.fromarray(rng.randint(0, 256, (24, 20, 3)).astype(
        np.uint8)).save(os.path.join(odd_dir, "odd.png"))
    ts = Testset(odd_dir)
    t = MultiscaleTester(cfg, net, params)
    out = str(tmp_path / "enc_b")
    res = t.write_to_files(ts, out, group=4)
    assert len(res.per_img) == 4
    # the three same-shape images were coded in ONE group: their files
    # record fbatch=4 (the padded physical batch), the odd one fbatch=1
    import struct
    fbs = {}
    for f in os.listdir(out):
        with open(os.path.join(out, f), "rb") as fh:
            fh.read(4)
            _, _, fb, _ = struct.unpack("<BBBB", fh.read(4))
            fbs[f] = fb
    assert fbs["odd.l3c"] == 1
    assert all(v == 4 for k, v in fbs.items() if k != "odd.l3c")


def test_write_to_files_fanout_mesh(tester_setup, img_dir, tmp_path):
    """tester -> CodecFanout path on the 8-device CPU mesh: groups
    round-robin across devices; results and files bit-exact."""
    cfg, net, params, log_dir = tester_setup
    many_dir = str(tmp_path / "many")
    os.makedirs(many_dir)
    rng = np.random.RandomState(4)
    for i in range(5):
        Image.fromarray(rng.randint(0, 256, (20, 24, 3)).astype(
            np.uint8)).save(os.path.join(many_dir, f"m{i}.png"))
    ts = Testset(many_dir)
    t = MultiscaleTester(cfg, net, params)
    out = str(tmp_path / "enc_f")
    res = t.write_to_files(ts, out, group=2, fanout=True)
    assert len(res.per_img) == 5
    assert all(0 < v < 50 for v in res.per_img.values())
