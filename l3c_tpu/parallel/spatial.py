"""Spatial (height) sharding of single-image forwards over the mesh.

The TPU-native answer to SURVEY §5's "long context" row: when ONE image
is too large (or too latency-critical) for one chip, shard its HEIGHT
across the mesh and run the multiscale forward on every device's slab
concurrently. Convolutions need cross-slab context, supplied by a HALO
EXCHANGE: each device ships its edge rows to its neighbors over ICI
(`jax.lax.ppermute`), pads its slab with them, runs the network on the
padded slab, and crops back to the valid interior. Global-image
boundaries keep the normal zero padding ('same' convs), so every
interior activation equals the unsharded forward once the halo covers
the network's receptive field.

This complements (not replaces) `codec.auto_crop`: auto-crop splits one
image into INDEPENDENT tiles (bitstream semantics change — each tile is
its own file part), while spatial sharding computes the EXACT SAME
forward as a single device, just faster. Use it for bpsp evaluation and
latency-critical forwards of very large images; the reference has no
equivalent (it falls back to CPU-side cropping, auto_crop.py:55-136).

Cost model: overlap fraction per device = 2*halo / (H / n_devices).
With the flagship's receptive field (halo ~512 input rows) this pays
off for images of ~8k rows and up on an 8-device mesh — exactly the
"image too big for one chip" regime auto-crop exists for.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import blueprint
from ..config import MsConfig
from ..models import layers
from ..models.network import MultiscaleNetwork
from .mesh import DATA_AXIS


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = DATA_AXIS
                  ) -> jnp.ndarray:
    """Pad a height-sharded slab (N, h, W, C) with `halo` rows from each
    neighbor device; global top/bottom get zeros (matching 'same' conv
    padding of the unsharded image). Returns (N, h + 2*halo, W, C).

    Two `ppermute` collectives ride the ICI ring: one shifting edge rows
    downward (device i -> i+1) and one upward. The zero masking for the
    boundary devices uses axis_index, which is a compile-time constant
    per shard under shard_map — XLA folds the `where` away.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # rows my DOWN-neighbor needs (my bottom edge) travel i -> i+1;
    # rows my UP-neighbor needs (my top edge) travel i -> i-1
    down = jax.lax.ppermute(x[:, -halo:], axis_name,
                            [(i, (i + 1) % n) for i in range(n)])
    up = jax.lax.ppermute(x[:, :halo], axis_name,
                          [(i, (i - 1) % n) for i in range(n)])
    top = jnp.where(idx == 0, jnp.zeros_like(down), down)
    bottom = jnp.where(idx == n - 1, jnp.zeros_like(up), up)
    return jnp.concatenate([top, x, bottom], axis=1)


def _check_geometry(cfg: MsConfig, H: int, n: int, halo: int):
    S = cfg.num_scales
    fac = 1 << S
    if H % n:
        raise ValueError(f"H={H} must divide over {n} devices")
    h = H // n
    if h % fac or halo % fac:
        raise ValueError(
            f"slab height {h} and halo {halo} must be multiples of "
            f"2^num_scales={fac} so every scale's rows split evenly")
    if halo > h:
        # halo_exchange ships each neighbor's EDGE rows; a halo wider
        # than one slab would need multi-hop exchange (and silently
        # truncates otherwise — the x[:, -halo:] slice just shrinks)
        raise ValueError(f"halo {halo} exceeds slab height {h}; use "
                         f"fewer devices or a smaller halo")
    return h


def _valid_nats(cfg: MsConfig, out, halo: int) -> jnp.ndarray:
    """Total nats of a slab's forward restricted to its VALID rows.

    Mirrors blueprint.scale_costs_nats + uniform_tail_nats, but crops
    the per-scale nll maps to the interior (halo rows at scale s live at
    halo >> s resolution), so halo-region activations — which differ
    from the unsharded forward near the slab edges — never contribute.
    """
    from ..models import dmll
    spec0, spec_n = blueprint.rgb_spec(cfg), blueprint.bn_spec(cfg)

    def crop(a, s):
        hs = halo >> s
        return a[:, hs: a.shape[1] - hs]

    total = jnp.sum(dmll.nll(spec0, crop(out.S[0], 0).astype(jnp.float32),
                             crop(out.P[0], 0)))
    for i in range(1, len(out.P)):
        if cfg.rgb_bicubic_baseline:
            target = out.S[i].astype(jnp.float32)
        else:
            target = out.bn[i]
        total = total + jnp.sum(dmll.nll(spec_n, crop(target, i),
                                         crop(out.P[i], i)))
    S_last = len(out.S) - 1
    L = 256 if (cfg.rgb_bicubic_baseline or S_last == 0) else cfg.q.L
    tail = crop(out.S[S_last], S_last)
    total = total + float(np.prod(tail.shape) * np.log(L))
    return total


def spatial_bpsp_fn(cfg: MsConfig, net: MultiscaleNetwork, mesh: Mesh,
                    H: int, W: int, halo: int):
    """Build a jitted (params, img) -> bpsp over a height-sharded image.

    `img` is the full (1, H, W, 3) uint8/float image (replicated input is
    fine; each shard slices its own slab). The result equals the
    single-device `blueprint` bpsp when `halo` covers the receptive
    field of the full enc+dec+classifier pyramid — up to a small
    boundary effect: the top/bottom devices see `halo` explicit zero
    rows at the global edges, while the unsharded forward zero-pads
    every conv layer separately, so activations within the receptive
    field of the global top/bottom rows differ slightly (measured
    <0.2% on total bpsp; tested in tests/test_spatial.py).
    """
    n = mesh.devices.size
    h = _check_geometry(cfg, H, n, halo)

    def shard_fn(params, img):
        idx = jax.lax.axis_index(DATA_AXIS)
        x = jax.lax.dynamic_slice_in_dim(
            img[0].astype(jnp.float32), idx * h, h, axis=0)[None]
        # Halo-exchange in the MEAN-SUBTRACTED domain so the zero rows the
        # global top/bottom devices receive match the unsharded forward's
        # zero conv padding, then restore raw [0,255] because __call__
        # subtracts the mean itself (and derives scale-0 symbols from the
        # raw values). Interior halos are unchanged by the +-mean round
        # trip; only the global-edge zeros need it.
        mean = jnp.asarray(255.0 * layers.RGB_MEAN, jnp.float32)
        xp = halo_exchange(x - mean, halo) + mean       # (1, h+2halo, W, 3)
        out = net.apply(params, xp, train=False)
        nats = _valid_nats(cfg, out, halo)
        total = jax.lax.psum(nats, DATA_AXIS)
        return total / (np.log(2.0) * H * W * 3)

    spec_r = P()
    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(spec_r, spec_r), out_specs=spec_r,
        check_vma=False))


def spatial_bpsp(cfg: MsConfig, net: MultiscaleNetwork, params, mesh: Mesh,
                 img: np.ndarray, halo: int) -> float:
    """Convenience wrapper: bpsp of ONE image, height-sharded."""
    img = img if img.ndim == 4 else img[None]
    _, H, W, _ = img.shape
    fn = spatial_bpsp_fn(cfg, net, mesh, H, W, halo)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    return float(fn(params_r, jnp.asarray(img)))
