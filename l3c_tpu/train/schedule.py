"""LR schedules from spec strings, as pure step->lr functions.

Reimplements /root/reference/src/train/lr_schedule.py's grammar:
    none
    exp_FAC_(iITR|eEPOCH)[_warm_START_FAC_(iITR|eEPOCH)]
    cos_LRMAX_LRMIN_(iITR|eEPOCH)
Default L3C: 'exp_0.75_e5' (decay x0.75 every 5 epochs, cr.cf:4).

Unlike the reference's stateful param-group mutation, schedules here are
pure functions compatible with optax.scale_by_schedule (jit-friendly,
resumable from any step with no replay).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _parse_interval(tok: str, epoch_len: int) -> int:
    kind, val = tok[0], tok[1:]
    if kind == "i":
        return int(val)
    if kind == "e":
        assert epoch_len is not None, "epoch-based schedule needs epoch_len"
        return max(1, int(float(val) * epoch_len))
    raise ValueError(f"invalid interval spec {tok!r}")


def _exp(initial: float, fac: float, every: int) -> Schedule:
    def lr(step):
        return initial * fac ** (step // every)
    return lr


def from_spec(spec: str, initial_lr: float, epoch_len: int = None
              ) -> Schedule:
    if spec == "none":
        return lambda step: jnp.asarray(initial_lr)
    kind, rest = spec.split("_", 1)
    if kind == "exp":
        parts = rest.split("_")
        if len(parts) > 2:
            fac, interval, warm, w_start, w_fac, w_interval = parts
            assert warm == "warm", spec
            every = _parse_interval(interval, epoch_len)
            w_every = _parse_interval(w_interval, epoch_len)
            w_start_itr = _parse_interval("i" + w_start, epoch_len) \
                if w_start.isdigit() else int(float(w_start) * epoch_len)
            base = _exp(initial_lr, float(fac), every)
            warm_s = _exp(initial_lr, float(w_fac), w_every)

            def lr(step):
                # ONE warm restart at w_start_itr, after which the warm
                # schedule's decay is adopted PERMANENTLY (the reference
                # _warm_restart copies the warm schedule's params over
                # and its own warm_restart_itr is None, so no further
                # restarts ever fire — lr_schedule.py:106-121).
                return jnp.where(step < w_start_itr, base(step),
                                 warm_s(step - w_start_itr))
            return lr
        fac, interval = parts
        return _exp(initial_lr, float(fac), _parse_interval(interval,
                                                            epoch_len))
    if kind == "cos":
        lrmax, lrmin, t = rest.split("_")
        ti = _parse_interval(t, epoch_len)
        lrmax, lrmin = float(lrmax), float(lrmin)

        def lr(step):
            tcur = (step % ti) / (2.0 * ti)
            return lrmin + (lrmax - lrmin) * jnp.cos(jnp.pi * tcur)
        return lr
    raise ValueError(f"unknown schedule kind {kind!r}")
