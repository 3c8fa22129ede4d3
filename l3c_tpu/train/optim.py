"""Optimizers matching the reference's torch semantics.

The reference builds {RMSprop, Adam, SGD} from config_ms.optim with
lr=config.lr.initial (multiscale_trainer.py:73-79). torch.optim.RMSprop
keeps eps OUTSIDE the sqrt (g / (sqrt(v) + eps)) with alpha=0.99 — we
implement that transform explicitly rather than relying on optax's
eps-inside-sqrt variants, so training dynamics match.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import MsConfig
from . import schedule as schedule_mod


class RmsTorchState(NamedTuple):
    nu: optax.Updates


def scale_by_rms_torch(alpha: float = 0.99,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    def init(params):
        return RmsTorchState(nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        nu = jax.tree.map(lambda n, g: alpha * n + (1 - alpha) * g * g,
                          state.nu, updates)
        updates = jax.tree.map(lambda g, n: g / (jnp.sqrt(n) + eps),
                               updates, nu)
        return updates, RmsTorchState(nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: MsConfig, epoch_len: int = None
                   ) -> optax.GradientTransformation:
    """Optimizer + LR schedule from the ms config (cr.cf:1-5)."""
    lr_fn = schedule_mod.from_spec(cfg.lr_schedule, cfg.lr_initial,
                                   epoch_len)
    if cfg.optim == "RMSprop":
        core = scale_by_rms_torch()
    elif cfg.optim == "Adam":
        core = optax.scale_by_adam()
    elif cfg.optim == "SGD":
        core = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {cfg.optim!r}")
    # torch couples weight decay INTO the gradient before the RMS math
    # (g += wd * p, torch/optim/rmsprop.py semantics), so the decay term
    # goes through the preconditioner — decayed weights must precede the
    # core transform, not follow it (decoupled/AdamW style).
    chain = []
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(core)
    chain.append(optax.scale_by_schedule(lambda s: -lr_fn(s)))
    return optax.chain(*chain)
