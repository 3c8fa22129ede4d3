"""Training runtime tests: schedules, optimizer, saver policy, and the
minimum end-to-end slice — a few steps of real training on synthetic
images must REDUCE the loss (SURVEY.md section 7 stage 3 deliverable,
shrunk for the test box)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.config import (DlConfig, MsConfig, EncConfig, DecConfig,
                            QConfig, ProbConfig)
from l3c_tpu.models.network import MultiscaleNetwork
from l3c_tpu.train import schedule as sched
from l3c_tpu.train.saver import Saver, Restorer
from l3c_tpu.train.trainer import Trainer
from l3c_tpu.parallel import mesh as mesh_mod


# ------------------------------------------------------------- schedules

def test_schedule_exp_epochs():
    lr = sched.from_spec("exp_0.75_e5", 1e-4, epoch_len=100)
    assert float(lr(0)) == pytest.approx(1e-4)
    assert float(lr(499)) == pytest.approx(1e-4)
    assert float(lr(500)) == pytest.approx(0.75e-4)
    assert float(lr(1000)) == pytest.approx(0.75 ** 2 * 1e-4)


def test_schedule_exp_itr_and_none():
    lr = sched.from_spec("exp_0.5_i10", 1.0)
    assert float(lr(25)) == pytest.approx(0.25)
    lr = sched.from_spec("none", 3e-4)
    assert float(lr(12345)) == pytest.approx(3e-4)


def test_schedule_cos():
    lr = sched.from_spec("cos_0.1_0.01_i100", 1.0)
    assert float(lr(0)) == pytest.approx(0.1)
    # halfway through the period: cos(pi * 0.25)
    assert float(lr(50)) == pytest.approx(
        0.01 + 0.09 * np.cos(np.pi * 0.25), rel=1e-5)


def test_schedule_warm_restart():
    lr = sched.from_spec("exp_0.5_i10_warm_30_0.75_i10", 1.0,
                         epoch_len=1)
    assert float(lr(5)) == pytest.approx(1.0)
    assert float(lr(15)) == pytest.approx(0.5)
    # after the restart at 30, the warm schedule restarts from initial
    assert float(lr(30)) == pytest.approx(1.0)
    assert float(lr(45)) == pytest.approx(0.75)
    # the warm schedule is adopted PERMANENTLY: no second restart at 60
    # (reference lr_schedule.py:106-121 — _warm_restart copies the warm
    # params over and the warm schedule has no restart of its own)
    assert float(lr(60)) == pytest.approx(0.75 ** 3)
    assert float(lr(95)) == pytest.approx(0.75 ** 6)


# ------------------------------------------------------------------ saver

def test_saver_keep_policy(tmp_path):
    out = str(tmp_path)
    saver = Saver(out, keep_tmp_itr=10, keep_every=3, keep_tmp_last=2)
    state = {"params": {"w": np.zeros(3, np.float32)},
             "opt_state": (), "step": np.zeros((), np.int32)}
    for itr in range(10, 101, 10):
        assert saver.save_due(itr)
        state["step"] = np.asarray(itr, np.int32)
        saver.save(state, itr)
    names = sorted(os.listdir(os.path.join(out, "ckpts")))
    # every 3rd save persistent: itr 30, 60, 90; temporaries: only the
    # last <=2 beyond the last persistent (100)
    persistent = [n for n in names if n.endswith(".ckpt")]
    tmps = [n for n in names if n.endswith(".tmp")]
    assert persistent == ["ckpt_0000000030.ckpt", "ckpt_0000000060.ckpt",
                          "ckpt_0000000090.ckpt"]
    assert tmps == ["ckpt_0000000100.ckpt.tmp"]

    r = Restorer(out)
    itr, got = r.restore(state, itr=-1)
    assert itr == 100 and int(got["step"]) == 100
    itr, got = r.restore(state, itr=65)
    assert itr == 60
    itr, _ = r.restore(state, itr=5)
    assert itr == 30  # earliest available


# --------------------------------------------------- end-to-end training

def _tiny_cfg():
    return MsConfig(num_scales=2, Cf=8,
                    enc=EncConfig(num_blocks=1), dec=DecConfig(num_blocks=1),
                    q=QConfig(C=2, L=25), prob=ProbConfig(K=2))


def _synthetic_batches(batch, crop, seed=0):
    """Smooth random gradients — learnable structure."""
    rng = np.random.RandomState(seed)
    while True:
        a = rng.randint(0, 255, size=(batch, 1, 1, 3))
        gy = np.linspace(0, 1, crop)[None, :, None, None]
        gx = np.linspace(0, 1, crop)[None, None, :, None]
        img = (a * gy + (255 - a) * gx) / (gy + gx + 1e-9).clip(min=1)
        img = np.clip(img + rng.randn(batch, crop, crop, 3) * 4, 0, 255)
        yield img.astype(np.uint8)


def test_training_reduces_loss(tmp_path):
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=4, batchsize_val=4, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(4, 16)
    val = [next(gen) for _ in range(2)]
    tr = Trainer(cfg, dl, net, gen, val_batches=val, out_dir=str(tmp_path),
                 epoch_len=10)
    bpsp_before = tr.validation_loop()
    tr.train(num_itr=30, log_every=0, val_every=0)
    bpsp_after = tr.validation_loop()
    assert bpsp_after < bpsp_before, (bpsp_before, bpsp_after)
    assert int(tr.state["step"]) == 30


def test_training_saves_final_checkpoint(tmp_path):
    """A run whose num_itr is NOT a multiple of keep_tmp_itr still ends
    with a restorable checkpoint at the final iteration (the reference's
    interval-only saver can drop the tail, trainer.py:137)."""
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=2, batchsize_val=2, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(2, 16)
    tr = Trainer(cfg, dl, net, gen, out_dir=str(tmp_path), epoch_len=10)
    tr.train(num_itr=3, log_every=0, val_every=0)   # 3 % 250 != 0
    r = Restorer(str(tmp_path))
    itr, got = r.restore(jax.device_get(tr.state), itr=-1)
    assert itr == 3 and int(got["step"]) == 3


def test_training_data_parallel_mesh(tmp_path):
    """Same slice under an 8-device virtual mesh (DP via shardings)."""
    assert jax.device_count() >= 8, "conftest must set 8 CPU devices"
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=8, batchsize_val=8, crop_size=16)
    net = MultiscaleNetwork(cfg)
    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    gen = _synthetic_batches(8, 16, seed=1)
    tr = Trainer(cfg, dl, net, gen, mesh=mesh, epoch_len=10)
    m = None
    for _ in range(3):
        b = next(iter(gen))
        tr.state, m = tr._step(tr.state, mesh_mod.shard_batch(mesh, b))
    assert np.isfinite(float(m["loss_bpsp"]))
    assert int(tr.state["step"]) == 3


def test_restore_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=2, batchsize_val=2, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(2, 16)
    tr = Trainer(cfg, dl, net, gen, out_dir=str(tmp_path), epoch_len=10)
    tr.train(num_itr=250, log_every=0, val_every=0)  # hits save_due at 250
    tr2 = Trainer(cfg, dl, net, gen, out_dir=None, epoch_len=10)
    got = tr2.restore(Restorer(str(tmp_path)))
    assert got == 250
    p1 = jax.tree_util.tree_leaves(tr.state["params"])
    p2 = jax.tree_util.tree_leaves(tr2.state["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heavy_summaries_emit_images(tmp_path):
    from tests.test_utils import FakeWriter
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=2, batchsize_val=2, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(2, 16)
    w = FakeWriter()
    tr = Trainer(cfg, dl, net, gen, epoch_len=10, summary_writer=w)
    tr.train(num_itr=2, log_every=1, val_every=0, heavy_every=2,
             log_fn=lambda *_: None)
    assert any(k.startswith("train_heavy/bn/") for k in w.images)
    assert any(k.startswith("train/costs/") for k in w.scalars)
    # predicted-vs-observed symbol-distribution figures per scale
    # (reference multiscale_blueprint.py:100-111); scale 0 included
    assert any(k.startswith("train_heavy/histo_out/") for k in w.figures)


def test_heavy_summaries_emit_activation_histograms(tmp_path):
    """In-graph encoder-activation histograms (reference net.py:114-119
    HistogramPlot equivalent): counts land in the writer with the
    scale-numbered tag, and counts sum to the activation count."""
    from tests.test_utils import FakeWriter
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=2, batchsize_val=2, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(2, 16)
    w = FakeWriter()
    tr = Trainer(cfg, dl, net, gen, epoch_len=10, summary_writer=w)
    tr.train(num_itr=2, log_every=0, val_every=0, heavy_every=2,
             log_fn=lambda *_: None)
    tags = [k for k in w.histos if "after_1x1" in k]
    assert tags, w.histos.keys()
    counts, edges = w.histos[tags[0]]
    # scale 1 bottleneck of a 16x16 crop: (2, 8, 8, C=2) activations
    assert counts.sum() == 2 * 8 * 8 * 2
    assert len(edges) == len(counts) + 1


def test_restore_non_strict_partial(tmp_path):
    """strict=False adopts matching subtrees and keeps fresh init for
    mismatched ones (reference train_restorer.py:26-60 strict flag)."""
    import flax.serialization as fser
    from l3c_tpu.train.saver import _overlay_state
    cfg = _tiny_cfg()
    dl = DlConfig(batchsize_train=2, batchsize_val=2, crop_size=16)
    net = MultiscaleNetwork(cfg)
    gen = _synthetic_batches(2, 16)
    tr = Trainer(cfg, dl, net, gen, out_dir=str(tmp_path), epoch_len=10)
    tr.train(num_itr=250, log_every=0, val_every=0)

    tr2 = Trainer(cfg, dl, net, gen, out_dir=None, epoch_len=10)
    # deliberately mismatch a subtree: doctor one param leaf's shape in
    # the template so the checkpoint value cannot be adopted there
    state = jax.device_get(tr2.state)
    sd = fser.to_state_dict(state)

    def first_leaf_path(d, path=()):
        for k, v in d.items():
            if isinstance(v, dict):
                got = first_leaf_path(v, path + (k,))
                if got:
                    return got
            elif getattr(v, "ndim", 0) >= 1:
                return path + (k,)
        return None

    path = first_leaf_path(sd["params"])
    sub = sd["params"]
    for k in path[:-1]:
        sub = sub[k]
    orig_shape = sub[path[-1]].shape
    sub[path[-1]] = np.zeros(orig_shape + (2,), np.float32)  # new shape

    r = Restorer(str(tmp_path))
    with open(r.get_ckpt_for_itr(-1)[1], "rb") as f:
        loaded = fser.msgpack_restore(f.read())
    merged = _overlay_state(sd, loaded)
    # mismatched leaf keeps the doctored template value
    sub_m = merged["params"]
    for k in path[:-1]:
        sub_m = sub_m[k]
    assert sub_m[path[-1]].shape == orig_shape + (2,)
    # a matching leaf was adopted from the checkpoint
    ck = jax.device_get(tr.state)
    sd_ck = fser.to_state_dict(ck)["params"]
    flat_m = jax.tree_util.tree_leaves(merged["params"])
    flat_c = jax.tree_util.tree_leaves(sd_ck)
    adopted = sum(
        1 for a, b in zip(flat_m, flat_c)
        if getattr(a, "shape", None) == getattr(b, "shape", None)
        and np.array_equal(np.asarray(a), np.asarray(b)))
    assert adopted >= len(flat_c) - 1
