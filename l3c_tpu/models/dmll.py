"""Discretized mixture-of-logistics likelihood (DMLL) — the probability core.

TPU-native, pure-function reimplementation of the reference
DiscretizedMixLogisticLoss (/root/reference/src/criterion/logistic_mixture.py,
PixelCNN++-style with NON-shared per-channel mixture weights):

  p(x_c) = sum_k pi_ck * [ sigmoid(s'_ck (x_c - mu~_ck + b/2))
                          - sigmoid(s'_ck (x_c - mu~_ck - b/2)) ]

with edge cases at x_min/x_max, log_scales clamped >= -7, and — for the RGB
scale only — channel autoregression through sigmoid-activated lambda
coefficients (Eq. 7 of the paper, logistic_mixture.py:235-243):

  mu~_g = mu_g + lam_gr x_r ,  mu~_b = mu_b + lam_br x_r + lam_bg x_g .

Layouts are NHWC(+K trailing), so the K-reduction and L-grid evaluations run
on VPU lanes; all heavy convs feeding `l` hit the MXU upstream.

Network output `l` has Kp channels with index composition
  kp = ((p * C) + c) * K + k,  p in {pi, mu, log_s[, lambda]}
matching the reference reshape l.reshape(N, P, C, K, H, W)
(logistic_mixture.py:228) so released-checkpoint imports line up.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import grids

_NUM_PARAMS_RGB = 4    # pi, mu, sigma, lambda  (logistic_mixture.py:54)
_NUM_PARAMS_OTHER = 3  # pi, mu, sigma          (logistic_mixture.py:55)
LOG_SCALES_MIN = -7.0  # logistic_mixture.py:57


@dataclasses.dataclass(frozen=True)
class DMLLSpec:
    """Static parameters of a discretized logistic mixture model."""
    rgb_scale: bool
    x_min: float = 0.0
    x_max: float = 255.0
    L: int = 256

    @property
    def num_params(self) -> int:
        return _NUM_PARAMS_RGB if self.rgb_scale else _NUM_PARAMS_OTHER

    @property
    def bin_width(self) -> float:
        return grids.bin_width(self.x_min, self.x_max, self.L)

    @property
    def x_lower_bound(self) -> float:
        return self.x_min + 0.001  # logistic_mixture.py:114

    @property
    def x_upper_bound(self) -> float:
        return self.x_max - 0.001  # logistic_mixture.py:115

    def to_sym(self, x):
        return grids.to_sym(x, self.x_min, self.x_max, self.L)

    def to_bn(self, S):
        return grids.to_bn(S, self.x_min, self.x_max, self.L)


RGB_SPEC = DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0, L=256)


def non_shared_get_Kp(K: int, C: int) -> int:
    """Channels the prob-classifier must emit (logistic_mixture.py:68-73)."""
    if C == 3:
        return _NUM_PARAMS_RGB * C * K
    return _NUM_PARAMS_OTHER * C * K


def non_shared_get_K(Kp: int, C: int) -> int:
    """Inverse of non_shared_get_Kp (logistic_mixture.py:76-81)."""
    if C == 3:
        return Kp // (_NUM_PARAMS_RGB * C)
    return Kp // (_NUM_PARAMS_OTHER * C)


def _reshape_l(spec: DMLLSpec, l: jax.Array, C: int) -> jax.Array:
    """(N,H,W,Kp) -> (N,H,W,P,C,K)."""
    N, H, W, Kp = l.shape
    K = non_shared_get_K(Kp, C)
    return l.reshape(N, H, W, spec.num_params, C, K)


def extract_params(
    spec: DMLLSpec, l: jax.Array, C: int, x: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Split `l` into (logit_pis, means~, log_scales), each (N,H,W,C,K).

    If `spec.rgb_scale` and `x` (N,H,W,C) is given, means are lambda-adjusted
    with the observed channels (logistic_mixture.py:235-243). Without `x`
    the raw means are returned (used by the codec, which conditions on
    decoded channels host-side).
    """
    lr = _reshape_l(spec, l, C)
    logit_pis = lr[..., 0, :, :]                                   # NHWCK
    means = lr[..., 1, :, :]                                       # NHWCK
    log_scales = jnp.maximum(lr[..., 2, :, :], LOG_SCALES_MIN)     # NHWCK

    if spec.rgb_scale and x is not None:
        assert C == 3, "lambda coefficients only defined for RGB (C=3)"
        lam = jax.nn.sigmoid(lr[..., 3, :, :])                     # NHW3K
        xk = x[..., None]                                          # NHWC1
        means = jnp.stack(
            [
                means[..., 0, :],
                means[..., 1, :] + lam[..., 0, :] * xk[..., 0, :],
                means[..., 2, :]
                + lam[..., 1, :] * xk[..., 0, :]
                + lam[..., 2, :] * xk[..., 1, :],
            ],
            axis=-2,
        )
    return logit_pis, means, log_scales


def nll(spec: DMLLSpec, x: jax.Array, l: jax.Array) -> jax.Array:
    """Per-element negative log-likelihood in nats, (N,H,W,C).

    Mirrors DiscretizedMixLogisticLoss.forward (logistic_mixture.py:146-207):
      - cdf_delta  = sig(s'(x-mu+b/2)) - sig(s'(x-mu-b/2))
      - x < x_min+eps  -> log cdf_plus          (open lower tail)
      - x > x_max-eps  -> log(1 - cdf_min)      (open upper tail)
      - else           -> log(max(cdf_delta, 1e-12))
      then logsumexp over K with log-softmax'd pis.
    """
    C = x.shape[-1]
    logit_pis, means, log_scales = extract_params(spec, l, C, x)

    xk = x[..., None]                       # NHWC1 broadcast over K
    centered = xk - means                   # NHWCK
    inv_stdv = jnp.exp(-log_scales)
    half_bin = spec.bin_width / 2.0
    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min

    out_a = jnp.log(jnp.clip(cdf_delta, min=1e-12))
    out_b = jnp.where(xk > spec.x_upper_bound, log_one_minus_cdf_min, out_a)
    log_probs = jnp.where(xk < spec.x_lower_bound, log_cdf_plus, out_b)  # NHWCK

    log_weighted = log_probs + jax.nn.log_softmax(logit_pis, axis=-1)
    return -jax.nn.logsumexp(log_weighted, axis=-1)  # NHWC


def bitcost(spec: DMLLSpec, x: jax.Array, l: jax.Array) -> jax.Array:
    """Total nats of a batch under the mixture model (scalar)."""
    return jnp.sum(nll(spec, x, l))


def mean_symbol_probs(spec: DMLLSpec, x: jax.Array, l: jax.Array
                      ) -> jax.Array:
    """Mean PREDICTED symbol distribution p_y, (L,).

    For each grid symbol, the discretized mixture probability averaged
    over every pixel and channel — the predicted half of the reference's
    p_x-vs-p_y bar figures (multiscale_blueprint.py:100-111 get_p_y,
    generalized from logits to the DMLL). `x` provides the observed
    channels for lambda conditioning, exactly as in `nll`.

    Memory-light by linearity: mean-of-prob-deltas == delta-of-mean-CDFs,
    so a lax.map over the L-1 interior bin edges reduces each edge to a
    scalar (no (pixels, L) tensor ever materializes — L=256 RGB scales
    stay cheap). Open tails absorbed into the edge symbols (CDF := 0/1),
    matching the coder's table spec and nll's tail handling."""
    C = x.shape[-1]
    logit_pis, means, log_scales = extract_params(spec, l, C, x)
    pis = jax.nn.softmax(logit_pis, axis=-1)
    inv_s = jnp.exp(-log_scales)
    edges = (spec.x_min + spec.bin_width / 2.0
             + spec.bin_width * jnp.arange(spec.L - 1, dtype=jnp.float32))

    def mean_cdf(t):
        return jnp.mean(jnp.sum(
            pis * jax.nn.sigmoid((t - means) * inv_s), axis=-1))

    m = jax.lax.map(mean_cdf, edges)
    m = jnp.concatenate([jnp.zeros(1), m, jnp.ones(1)])
    return jnp.diff(m)


def pack_coder_params(
    spec: DMLLSpec, l: jax.Array, C: int
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Prepare deterministic per-pixel coder inputs on-device.

    Returns float32 (pi, mu_raw, inv_s, lam):
      pi    (N,H,W,C,K) softmax'd mixture weights
      mu    (N,H,W,C,K) RAW means — lambda conditioning happens host-side
                        with the decoded channel values (bit-exact on both
                        encode and decode; cf. cdf_step_non_shared,
                        logistic_mixture.py:134-141 + 248-275)
      inv_s (N,H,W,C,K) exp(-clamp(log_s, -7))
      lam   (N,H,W,3,K) sigmoid'd coefficients (g<-r, b<-r, b<-g) or None
    """
    lr = _reshape_l(spec, l, C)
    pi = jax.nn.softmax(lr[..., 0, :, :].astype(jnp.float32), axis=-1)
    mu = lr[..., 1, :, :].astype(jnp.float32)
    inv_s = jnp.exp(-jnp.maximum(lr[..., 2, :, :].astype(jnp.float32),
                                 LOG_SCALES_MIN))
    lam = None
    if spec.rgb_scale:
        lam = jax.nn.sigmoid(lr[..., 3, :, :].astype(jnp.float32))
    return pi, mu, inv_s, lam


def sample(
    spec: DMLLSpec, l: jax.Array, C: int, rng: jax.Array
) -> jax.Array:
    """Draw x ~ p(.|l), (N,H,W,C) float. logistic_mixture.py:277-323.

    Gumbel-max mixture selection + inverse-CDF logistic draw; for RGB the
    lambda coefficients (gathered with the G/B selection masks) shift the
    G/B samples by the clamped previous channels.
    """
    lr = _reshape_l(spec, l, C)
    logit_pis = lr[..., 0, :, :]
    rng_sel, rng_u = jax.random.split(rng)
    u_sel = jax.random.uniform(
        rng_sel, logit_pis.shape, minval=1e-5, maxval=1.0 - 1e-5)
    sel = jnp.argmax(logit_pis - jnp.log(-jnp.log(u_sel)), axis=-1)  # NHWC

    means = jnp.take_along_axis(lr[..., 1, :, :], sel[..., None], axis=-1)
    means = means[..., 0]
    log_scales = jnp.take_along_axis(lr[..., 2, :, :], sel[..., None], axis=-1)
    log_scales = jnp.maximum(log_scales[..., 0], LOG_SCALES_MIN)

    u = jax.random.uniform(rng_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))  # NHWC

    if spec.rgb_scale:
        assert C == 3
        lam = jax.nn.sigmoid(lr[..., 3, :, :])  # NHW3K
        sel_g, sel_b = sel[..., 1], sel[..., 2]
        gather = lambda a, s: jnp.take_along_axis(a, s[..., None, None],
                                                  axis=-1)[..., 0, 0]
        # lam axis -2 indexes the coefficient (g_r, b_r, b_g)
        lam_gr = gather(lam[..., 0:1, :], sel_g)
        lam_br = gather(lam[..., 1:2, :], sel_b)
        lam_bg = gather(lam[..., 2:3, :], sel_b)
        clamp = lambda v: jnp.clip(v, 0.0, 255.0)
        x0 = clamp(x[..., 0])
        x1 = clamp(x[..., 1] + lam_gr * x0)
        x2 = clamp(x[..., 2] + lam_br * x0 + lam_bg * x1)
        x = jnp.stack([x0, x1, x2], axis=-1)
    return x
