"""Pallas CDF kernel vs the pure-XLA table builder (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.ops import pallas_cdf, tpu_coder as tc


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


def test_roundtrip_through_pallas_tables():
    """The codec round-trips when BOTH sides use the kernel's tables."""
    rng = np.random.RandomState(1)
    P, K, L = 1000, 4, 25
    pi = jnp.asarray(rng.dirichlet(np.ones(K), size=P).astype(np.float32))
    mu = jnp.asarray(rng.uniform(-1, 1, (P, K)).astype(np.float32))
    inv_s = jnp.asarray(np.exp(-rng.uniform(-3, 1, (P, K)))
                        .astype(np.float32))
    table = pallas_cdf.build_cdf_table_pallas(pi, mu, inv_s, -1.0,
                                              2.0 / 24, L)
    lay = tc.layout_for(P, 1)
    syms = jnp.asarray(rng.randint(0, L, P).astype(np.int32))
    words, _ = tc.encode_channels(table, syms, L, lay)
    out = tc.decode_channels(table, words, L, lay)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(syms))
