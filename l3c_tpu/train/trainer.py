"""Training runtime: jitted train step, epochless loop, validation.

Reimplements /root/reference/src/train/trainer.py + multiscale_trainer.py
as a functional JAX loop:

- ONE jitted `train_step(state, batch)` doing forward, loss, backward,
  RMSprop update, and metric computation (bpsp per scale, grad norm, lr)
  — no Python in the hot path, XLA fuses the whole step.
- epochless iteration with restore-to-iteration support
  (trainer.py:59-89): schedules are pure functions of the step so
  resuming needs no replay.
- periodic validation over fixed batches (multiscale_trainer.py:228-254)
  and checkpointing via train.saver with the reference keep policy.
- optional data parallelism over a jax.sharding.Mesh (parallel.mesh).
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import blueprint
from ..config import DlConfig, MsConfig
from ..models.network import MultiscaleNetwork
from ..parallel import mesh as mesh_mod
from . import optim as optim_mod
from . import schedule as schedule_mod
from .saver import Saver

# In-graph encoder-activation histogram spec: fixed bucket edges over
# the pre-quantizer 1x1-conv output (levels live in [-1, 1]; +-4
# catches outliers). The reference taps the same signal with a host-side
# RollingBufferHistogram (net.py:114-119, vis/histogram_plot.py); here
# the bucket COUNTS are computed on-device inside one jit and only the
# tiny count vector crosses to the host.
HIST_LO, HIST_HI, HIST_BINS, HIST_BUFFER = -4.0, 4.0, 80, 10


def make_enc_hist(cfg: MsConfig, net: MultiscaleNetwork):
    from ..models import layers
    from ..models.network import MultiscaleNetwork as MN

    def enc_hist(params, batch):
        x = layers.sub_rgb_mean(batch.astype(jnp.float32))
        eos = net.apply(params, x, method=MN.enc_forward)
        out = {}
        for i, eo in enumerate(eos):
            if eo.raw is None:
                continue
            v = eo.raw.reshape(-1)
            idx = jnp.clip(
                ((v - HIST_LO) / (HIST_HI - HIST_LO)
                 * HIST_BINS).astype(jnp.int32), 0, HIST_BINS - 1)
            # scale numbering starts at 1 (0 is RGB), like the reference
            out[f"histo/enc_{i + 1}_after_1x1"] = jnp.bincount(
                idx, length=HIST_BINS)
        return out

    return enc_hist


def make_ps_stats(cfg: MsConfig, net: MultiscaleNetwork):
    """Jitted per-scale (p_x counts, p_y predicted dist) for the
    observed-vs-predicted figures (reference
    multiscale_blueprint.py:100-111 + vis/histogram_plotter.py)."""
    from ..models import dmll

    def ps_stats(params, img):
        out = net.apply(params, img.astype(jnp.float32), train=False)
        spec0 = blueprint.rgb_spec(cfg)
        spec_n = blueprint.bn_spec(cfg)
        stats = {}
        for i in range(len(out.P)):
            spec = spec0 if i == 0 else spec_n
            if i == 0 or cfg.rgb_bicubic_baseline:
                target = out.S[i].astype(jnp.float32)
            else:
                target = out.bn[i]
            p_x = jnp.bincount(out.S[i].reshape(-1).astype(jnp.int32),
                               length=spec.L)
            p_y = dmll.mean_symbol_probs(spec, target, out.P[i])
            stats[i] = (p_x, p_y)
        return stats

    return ps_stats


def make_train_state(cfg: MsConfig, net: MultiscaleNetwork, rng,
                     example_batch: jnp.ndarray,
                     optimizer: optax.GradientTransformation):
    # jit the whole init: ONE compile instead of ~60 eager dispatches
    params = jax.jit(lambda r, x: net.init(r, x, train=True))(
        rng, example_batch)
    opt_state = optimizer.init(params)
    return {"params": params, "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32)}


def make_train_step(cfg: MsConfig, net: MultiscaleNetwork,
                    optimizer: optax.GradientTransformation,
                    lr_fn: schedule_mod.Schedule):
    """Returns (state, batch_f32) -> (state, metrics)."""

    def loss_fn(params, batch):
        out = net.apply(params, batch, train=True)
        loss = blueprint.compute_loss(cfg, out)
        return loss.loss_pc, loss

    def step(state, batch):
        batch = batch.astype(jnp.float32)
        (loss_pc, loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], batch)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        gnorm = optax.global_norm(grads)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        metrics = {
            "loss_bpsp": loss_pc,
            "bpsp_total": blueprint.total_bpsp(loss),
            "scale_bpsps": jnp.stack(
                [jnp.asarray(b) for b in loss.nonrecursive_bpsps]),
            "grad_norm": gnorm,
            "lr": lr_fn(state["step"]),
        }
        return new_state, metrics

    return step


def make_eval_step(cfg: MsConfig, net: MultiscaleNetwork):
    def eval_step(params, batch):
        out = net.apply(params, batch.astype(jnp.float32), train=False)
        loss = blueprint.compute_loss(cfg, out)
        return blueprint.total_bpsp(loss)
    return eval_step


class Values:
    """Console metric formatter (multiscale_trainer.py:257-279 flavor)."""

    @staticmethod
    def format(step: int, metrics: Dict, img_per_s: float) -> str:
        s = (f"{step:8d} loss={float(metrics['loss_bpsp']):.4f} "
             f"bpsp={float(metrics['bpsp_total']):.4f} ")
        s += "scales=[" + " ".join(
            f"{float(b):.3f}" for b in np.asarray(metrics["scale_bpsps"])
        ) + "] "
        s += (f"gnorm={float(metrics['grad_norm']):.2f} "
              f"lr={float(metrics['lr']):.2e} {img_per_s:.1f} img/s")
        return s


class Trainer:
    def __init__(self, cfg: MsConfig, dl_cfg: DlConfig,
                 net: MultiscaleNetwork,
                 train_batches: Iterable[np.ndarray],
                 val_batches: Optional[list] = None,
                 out_dir: Optional[str] = None,
                 epoch_len: Optional[int] = None,
                 mesh=None, seed: int = 0,
                 summary_writer=None):
        from ..utils.jaxtools import ensure_compile_cache
        ensure_compile_cache()
        self.cfg, self.dl_cfg, self.net = cfg, dl_cfg, net
        self.train_batches = train_batches
        self.val_batches = val_batches or []
        self.epoch_len = epoch_len
        self.mesh = mesh
        self.summary_writer = summary_writer

        self.lr_fn = schedule_mod.from_spec(cfg.lr_schedule, cfg.lr_initial,
                                            epoch_len)
        self.optimizer = optim_mod.make_optimizer(cfg, epoch_len)
        example = jnp.zeros((1, dl_cfg.crop_size, dl_cfg.crop_size, 3),
                            jnp.float32)
        self.state = make_train_state(cfg, net, jax.random.PRNGKey(seed),
                                      example, self.optimizer)
        step_fn = make_train_step(cfg, net, self.optimizer, self.lr_fn)
        if mesh is not None:
            self._step = mesh_mod.data_parallel_jit(step_fn, mesh)
        else:
            self._step = jax.jit(step_fn, donate_argnums=(0,))
        self._eval = jax.jit(make_eval_step(cfg, net))
        self._enc_hist = jax.jit(make_enc_hist(cfg, net))
        self._ps_stats = jax.jit(make_ps_stats(cfg, net))
        # jitted plain forward for heavy summaries: an eager net.apply
        # costs ~1s PER OP through the axon dispatch path
        self._fwd_out = jax.jit(
            lambda p, x: net.apply(p, x, train=False))
        self._hist_buffers = {}  # tag -> list of recent count vectors
        self.saver = Saver(out_dir) if out_dir else None
        self.start_itr = 0

    def restore(self, restorer, itr: int = -1, restart: bool = False,
                strict: bool = True):
        got_itr, state = restorer.restore(jax.device_get(self.state), itr,
                                          strict=strict)
        if restart:
            state["opt_state"] = jax.device_get(self.state)["opt_state"]
            state["step"] = np.zeros((), np.int32)
            got_itr = 0
        self.state = jax.device_put(state)
        self.start_itr = int(got_itr)
        return got_itr

    def _place_batch(self, batch: np.ndarray):
        if self.mesh is not None:
            return mesh_mod.shard_batch(self.mesh, batch)
        return jnp.asarray(batch)

    def train(self, num_itr: int, log_every: int = 100,
              val_every: int = 500, heavy_every: int = 0,
              log_fn=print) -> Dict:
        it = iter(self.train_batches)
        t0 = time.time()
        imgs = 0
        metrics = {}
        for i in range(self.start_itr, self.start_itr + num_itr):
            batch = next(it)
            self.state, metrics = self._step(self.state,
                                             self._place_batch(batch))
            imgs += batch.shape[0]
            if log_every and (i + 1) % log_every == 0:
                jax.block_until_ready(metrics["loss_bpsp"])
                dt = time.time() - t0
                log_fn(Values.format(i + 1, metrics, imgs / max(dt, 1e-9)))
                self._write_summaries("train", metrics, i + 1)
                t0, imgs = time.time(), 0
            if (heavy_every and (i + 1) % heavy_every == 0
                    and self.summary_writer is not None):
                self._write_heavy_summaries(batch, i + 1)
            if val_every and (i + 1) % val_every == 0 and self.val_batches:
                val_bpsp = self.validation_loop()
                log_fn(f"{i + 1:8d} VAL bpsp={val_bpsp:.4f}")
                if self.summary_writer is not None:
                    self.summary_writer.add_scalar("val/bpsp", val_bpsp,
                                                   i + 1)
            if self.saver is not None and self.saver.save_due(i + 1):
                self.saver.save(jax.device_get(self.state), i + 1)
        # final checkpoint: the reference's interval saver can drop up to
        # keep_tmp_itr-1 tail iterations at exit (saver.py save_every
        # gate inside trainer.py:137's every-itr call); always persist
        # the state the run ended with so short runs are restorable.
        end = self.start_itr + num_itr
        if self.saver is not None and num_itr and not self.saver.save_due(end):
            self.saver.save(jax.device_get(self.state), end)
        return metrics

    def _write_heavy_summaries(self, batch, step: int):
        """Bottleneck images + symbol histograms (the reference's
        log_train_heavy summaries, multiscale_blueprint.py:100-118) +
        rolling in-graph encoder-activation histograms (net.py:114-119).

        Uses the first VAL image when available so the images stay
        comparable across steps (the reference pins fixedimg.jpg,
        multiscale_trainer.py:156-166); falls back to the train batch."""
        from ..utils.summarizer import Summarizer, add_scale_summaries
        img = (self.val_batches[0][:1] if self.val_batches else batch[:1])
        out = self._fwd_out(self.state["params"],
                            jnp.asarray(img, jnp.float32))
        s = Summarizer(self.summary_writer)
        s.enable("train_heavy", step)
        add_scale_summaries(s, out, self.cfg.q.L)
        # observed-vs-predicted symbol distributions per scale: the
        # calibration figures of multiscale_blueprint.py:100-111 —
        # computed in ONE jit (p_y via edge-mean linearity), figures on
        # the host
        from ..utils.summarizer import ps_figure
        stats = jax.device_get(self._ps_stats(
            self.state["params"], jnp.asarray(img, jnp.float32)))
        for scale, (p_x, p_y) in stats.items():
            s.figure(f"histo_out/{scale}", ps_figure(p_x, p_y))
        # activation histograms over the CURRENT train batch, buffered
        # over the last HIST_BUFFER heavy steps like the reference's
        # RollingBufferHistogram(buffer_size=10)
        counts = jax.device_get(self._enc_hist(
            self.state["params"], jnp.asarray(batch, jnp.float32)))
        edges = np.linspace(HIST_LO, HIST_HI, HIST_BINS + 1)
        for tag, c in counts.items():
            buf = self._hist_buffers.setdefault(tag, [])
            buf.append(np.asarray(c))
            del buf[:-HIST_BUFFER]
            if self.summary_writer is not None and hasattr(
                    self.summary_writer, "add_histogram_counts"):
                self.summary_writer.add_histogram_counts(
                    f"train/{tag}", np.sum(buf, axis=0), edges, step)

    def _write_summaries(self, prefix: str, metrics: Dict, step: int):
        if self.summary_writer is None:
            return
        sw = self.summary_writer
        sw.add_scalar(f"{prefix}/loss_bpsp",
                      float(metrics["loss_bpsp"]), step)
        sw.add_scalar(f"{prefix}/bpsp", float(metrics["bpsp_total"]), step)
        for i, b in enumerate(np.asarray(metrics["scale_bpsps"])):
            sw.add_scalar(f"{prefix}/costs/scale_{i}_bpsp", float(b), step)
        sw.add_scalar(f"{prefix}/grad_norm",
                      float(metrics["grad_norm"]), step)
        sw.add_scalar(f"{prefix}/lr", float(metrics["lr"]), step)

    def validation_loop(self) -> float:
        vals = [float(self._eval(self.state["params"],
                                 self._place_batch(b)))
                for b in self.val_batches]
        return float(np.mean(vals))

    def debug_step(self) -> Dict:
        """One train step + one val pass (train.py --debug equivalent)."""
        batch = next(iter(self.train_batches))
        self.state, metrics = self._step(self.state,
                                         self._place_batch(batch))
        if self.val_batches:
            metrics["val_bpsp"] = self.validation_loop()
        return metrics
