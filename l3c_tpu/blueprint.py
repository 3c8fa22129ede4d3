"""Model + loss facade shared by trainer, tester, and codec.

Reimplements /root/reference/src/blueprints/multiscale_blueprint.py and the
Losses container (multiscale_network.py:133-165) as pure functions over the
`Out` pytree:

- per-scale cost in nats = sum of DMLL NLL; RGB scale targets the int image
  under the L=256 RGB mixture, coarser scales target the (STE) bottlenecks
  under the L=q.L mixture (L3C) or downsampled RGB under the RGB mixture
  (baselines)
- the coarsest non-recursive scale additionally pays a closed-form uniform
  prior: numel * ln(L)  (multiscale_network.py:125-130)
- bpsp = nats / (ln 2 * num_subpixels); when images are padded for the
  pyramid, `num_subpixels_before_pad` gives the true denominator
  (multiscale_blueprint.py:64-95)
- the TRAINING objective excludes the uniform tail
  (multiscale_blueprint.py:92-94)
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import MsConfig
from .models import dmll
from .models.network import Out


class MultiscaleLoss(NamedTuple):
    loss_pc: jnp.ndarray                  # scalar: training objective (bpsp)
    nonrecursive_bpsps: Tuple             # per-scale bpsp incl. uniform tail
    recursive_bpsps: Optional[Tuple]      # incl. recursive scales, or None


def rgb_spec(cfg: MsConfig) -> dmll.DMLLSpec:
    return dmll.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0, L=256)


def bn_spec(cfg: MsConfig) -> dmll.DMLLSpec:
    """Mixture spec for the non-RGB scales (multiscale_network.py:136-143)."""
    if cfg.rgb_bicubic_baseline:
        return rgb_spec(cfg)
    lo, hi = cfg.q.levels_range
    return dmll.DMLLSpec(rgb_scale=False, x_min=lo, x_max=hi, L=cfg.q.L)


def scale_costs_nats(cfg: MsConfig, out: Out):
    """Per-scale total nats, fine->coarse, excluding the uniform tail."""
    spec0, spec_n = rgb_spec(cfg), bn_spec(cfg)
    costs = [dmll.bitcost(spec0, out.S[0].astype(jnp.float32), out.P[0])]
    for i in range(1, len(out.P)):
        if cfg.rgb_bicubic_baseline:
            target = out.S[i].astype(jnp.float32)   # 'S' targets style
        else:
            target = out.bn[i]                      # 'bn' targets style
        costs.append(dmll.bitcost(spec_n, target, out.P[i]))
    return costs


def uniform_tail_nats(cfg: MsConfig, out: Out, index: int) -> float:
    """nats to store scale `index` under a uniform prior (static shape)."""
    L = 256 if cfg.rgb_bicubic_baseline else cfg.q.L
    if index == 0:
        L = 256
    numel = int(np.prod(out.S[index].shape))
    return float(numel * np.log(L))


def compute_loss(cfg: MsConfig, out: Out,
                 num_subpixels_before_pad: Optional[int] = None,
                 auto_recursive_from: Optional[int] = None) -> MultiscaleLoss:
    costs = scale_costs_nats(cfg, out)
    num_subpixels = int(np.prod(out.S[0].shape))
    if num_subpixels_before_pad:
        assert num_subpixels_before_pad <= num_subpixels
        num_subpixels = num_subpixels_before_pad
    conversion = float(np.log(2.0) * num_subpixels)
    costs_bpsp = [c / conversion for c in costs]

    final_idx = (len(out.S) - 1 if auto_recursive_from is None
                 else auto_recursive_from)
    final_uniform_bpsp = uniform_tail_nats(cfg, out, final_idx) / conversion

    nonrecursive = tuple(costs_bpsp[:auto_recursive_from]
                         if auto_recursive_from is not None else costs_bpsp
                         ) + (final_uniform_bpsp,)
    recursive = None
    if auto_recursive_from is not None:
        recursive = tuple(costs_bpsp) + (
            uniform_tail_nats(cfg, out, len(out.S) - 1) / conversion,)

    loss_pc = sum(costs_bpsp)
    return MultiscaleLoss(loss_pc=loss_pc,
                          nonrecursive_bpsps=nonrecursive,
                          recursive_bpsps=recursive)


def total_bpsp(loss: MultiscaleLoss) -> jnp.ndarray:
    """Reported eval bpsp: all non-recursive scales + uniform tail."""
    return sum(loss.nonrecursive_bpsps)
