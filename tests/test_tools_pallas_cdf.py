"""Quarantined Pallas CDF kernels (tools/pallas_cdf.py) vs the
production XLA table builders (interpret mode on CPU).

The kernels are a bench-only negative-result artifact (measured
2.5-4.5x slower than XLA fusion on the real chip; RESULTS.md round 2)
— these tests only keep the quarantined code importable and honest as
an A/B reference, they guard nothing in the production codec.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from l3c_tpu.ops import tpu_coder as tc  # noqa: E402
from tools import pallas_cdf  # noqa: E402


@pytest.mark.parametrize("P,K,L", [(300, 10, 256), (64, 3, 25), (1, 1, 25)])
def test_kernel_matches_xla_path(P, K, L):
    rng = np.random.RandomState(0)
    pi = jnp.asarray(rng.dirichlet(np.ones(K), size=P).astype(np.float32))
    mu = jnp.asarray(rng.uniform(-1, 1, (P, K)).astype(np.float32))
    inv_s = jnp.asarray(np.exp(-rng.uniform(-5, 1, (P, K)))
                        .astype(np.float32))
    bw = 2.0 / (L - 1)
    a = np.asarray(tc.build_cdf_table(pi, mu, inv_s, -1.0, bw, L),
                   np.int64)
    b = np.asarray(pallas_cdf.build_cdf_table_pallas(pi, mu, inv_s, -1.0,
                                                     bw, L), np.int64)
    # identical math modulo float association; tables may differ by <=1
    # quantization step. Monotonicity must hold for both.
    assert np.abs(a - b).max() <= 1
    for t in (a, b):
        d = np.diff(np.concatenate([t, np.full((P, 1), 65536)], 1), axis=1)
        assert (d >= 1).all()


def test_fine_kernel_matches_xla_path():
    """Pallas conditional fine-table kernel vs tpu_coder.rgb_fine_tables
    XLA path: same spec, <=2 quantization-step difference, monotone."""
    from l3c_tpu.models import dmll as dmll_mod
    rng = np.random.RandomState(2)
    K = 4
    spec = dmll_mod.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0,
                             L=256)
    h = w = 25
    n = h * w
    Kp = dmll_mod.non_shared_get_Kp(K, 3)
    l = jnp.asarray(rng.randn(1, h, w, Kp).astype(np.float32))
    dec = jnp.asarray(rng.randint(0, 256, (1, h, w, 3))
                      .astype(np.float32))
    # realistic coarse symbols: the bin holding mixture component 0's
    # mean (data-drawn symbols live where the model puts mass)
    pi0, mu0, inv0 = tc._channel_params(spec, l, 2, 3, dec)
    a = jnp.clip((np.asarray(mu0)[:, 0] - spec.x_min)
                 / spec.bin_width / 16.0, 0, 15).astype(jnp.int32)
    xla = np.asarray(tc.rgb_fine_tables(spec, l, 2, 3, dec, a), np.int64)
    pls = np.asarray(pallas_cdf.rgb_fine_tables_pallas(
        spec, l, 2, 3, dec, a), np.int64)
    # Implementations must agree wherever the coarse bin carries real
    # mass; near-zero-mass bins divide ~0/~0 and may differ freely (the
    # codec never uses the Pallas rows). Identify well-conditioned rows
    # via the floats.
    k = jnp.arange(17, dtype=jnp.float32)
    t = ((a.reshape(-1, 1).astype(jnp.float32) * 16.0 + k)
         * np.float32(spec.bin_width)
         + np.float32(spec.x_min - spec.bin_width / 2))
    cv = np.asarray(tc.edge_cdf(pi0, mu0, inv0, t))
    good = (cv[:, -1] - cv[:, 0]) > 1e-2
    assert good.sum() > n // 3   # the test must actually cover rows
    assert np.abs(xla[good] - pls[good]).max() <= 2
    for t_ in (xla, pls):
        d = np.diff(np.concatenate([t_, np.full((n, 1), 65536)], 1),
                    axis=1)
        assert (d >= 1).all()


def test_coarse_kernel_matches_xla_path():
    """Pallas coarse-row wrapper vs tpu_coder.rgb_coarse_tables_packed."""
    from l3c_tpu.models import dmll as dmll_mod
    rng = np.random.RandomState(3)
    K = 4
    spec = dmll_mod.DMLLSpec(rgb_scale=True, x_min=0.0, x_max=255.0,
                             L=256)
    h = w = 16
    Kp = dmll_mod.non_shared_get_Kp(K, 3)
    l = jnp.asarray(rng.randn(1, h, w, Kp).astype(np.float32))
    packed = dmll_mod.pack_coder_params(spec, l, 3)
    xla = np.asarray(tc.rgb_coarse_tables_packed(spec, packed, 0, None),
                     np.int64)
    pls = np.asarray(pallas_cdf.rgb_coarse_tables_pallas(
        spec, packed, 0, None), np.int64)
    assert np.abs(xla - pls).max() <= 1
