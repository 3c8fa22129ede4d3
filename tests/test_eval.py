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
