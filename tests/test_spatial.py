"""Spatial (height) sharding: halo exchange + sharded bpsp equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu import blueprint
from l3c_tpu.config import MsConfig, EncConfig, DecConfig, QConfig, ProbConfig
from l3c_tpu.models.network import MultiscaleNetwork
from l3c_tpu.parallel import mesh as mesh_mod
from l3c_tpu.parallel import spatial


def small_cfg():
    return MsConfig(num_scales=3, Cf=16,
                    enc=EncConfig(num_blocks=2), dec=DecConfig(num_blocks=2),
                    q=QConfig(C=5, L=25), prob=ProbConfig(K=3))


def test_halo_exchange_rows():
    """Each slab sees its true neighbors' rows; global edges see zeros."""
    mesh = mesh_mod.make_mesh(jax.devices()[:4])
    n, h, W = 4, 8, 4
    full = np.arange(n * h * W * 1, dtype=np.float32).reshape(n * h, W, 1)

    def fn(x_sh):
        return spatial.halo_exchange(x_sh, halo=2)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    sharded = shard_map(
        fn, mesh=mesh, in_specs=P(mesh_mod.DATA_AXIS),
        out_specs=P(mesh_mod.DATA_AXIS), check_vma=False)
    # shard over leading (batch-like) axis: reshape to (n, h, W, 1) slabs
    x = full.reshape(n, h, W, 1)
    out = np.asarray(jax.jit(sharded)(jnp.asarray(x)))
    out = out.reshape(n, h + 4, W, 1)
    # interior slab 1: top halo == slab 0's last rows, bottom == slab 2's
    np.testing.assert_array_equal(out[1, :2], x[0, -2:])
    np.testing.assert_array_equal(out[1, -2:], x[2, :2])
    np.testing.assert_array_equal(out[1, 2:-2], x[1])
    # global boundaries zero-padded
    assert (out[0, :2] == 0).all()
    assert (out[3, -2:] == 0).all()


@pytest.mark.parametrize("n_dev", [8])
def test_spatial_bpsp_matches_single_device(n_dev):
    """Height-sharded forward + valid-region bitcost == unsharded bpsp
    (halo covering the receptive field)."""
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    H, W, halo = 1024, 32, 128
    rng = np.random.RandomState(0)
    # smooth-ish image so costs are stable across float reassociation
    base = rng.randint(0, 256, (H // 32, W // 8, 3)).astype(np.float32)
    img = np.kron(base, np.ones((32, 8, 1))).astype(np.uint8)[None]

    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))

    @jax.jit
    def single(params, x):
        # canonical raw-[0,255] forward — __call__ subtracts the RGB mean
        # itself; pre-subtracting here would mask a double-subtraction in
        # the spatial path (round-2 advisor finding)
        out = net.apply(params, x.astype(jnp.float32), train=False)
        return blueprint.total_bpsp(blueprint.compute_loss(cfg, out))

    ref = float(single(params, jnp.asarray(img)))

    mesh = mesh_mod.make_mesh(jax.devices()[:n_dev])
    got = spatial.spatial_bpsp(cfg, net, params, mesh, img, halo=halo)
    assert got == pytest.approx(ref, rel=2e-3), (got, ref)


def test_spatial_geometry_checks():
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="divide"):
        spatial.spatial_bpsp_fn(cfg, net, mesh, H=100, W=32, halo=16)
    with pytest.raises(ValueError, match="multiples"):
        spatial.spatial_bpsp_fn(cfg, net, mesh, H=256, W=32, halo=12)


def test_tester_spatial_shard_matches_auto_crop(tmp_path, monkeypatch):
    """--spatial_shard: an above-threshold image evaluated via shard_map
    agrees with the default auto-crop tiling path (both approximate the
    untiled bpsp; spatial is the exact forward, auto-crop changes tile
    boundaries, so allow a small relative gap)."""
    from l3c_tpu.eval.tester import MultiscaleTester
    monkeypatch.setenv("AC_NEEDS_CROP_DIM", "48,48")  # force tiny limit
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)))
    rng = np.random.RandomState(11)
    base = rng.randint(60, 200, (1, 1, 1, 3))
    img = np.clip(base + rng.randint(-40, 40, (1, 64, 64, 3)),
                  0, 255).astype(np.uint8)
    p = str(tmp_path / "big.png")
    from PIL import Image
    Image.fromarray(img[0]).save(p)

    class OneImg:
        id = "one"

        def __iter__(self):
            return iter([p])

    t_ac = MultiscaleTester(cfg, net, params, use_cache=False)
    t_sp = MultiscaleTester(cfg, net, params, use_cache=False,
                            spatial_shard=True, spatial_halo=16)
    assert t_sp.spatial_shard, "needs the 8-device CPU mesh"
    b_ac = t_ac.test(OneImg()).mean_bpsp()
    b_sp = t_sp.test(OneImg()).mean_bpsp()
    assert t_sp._spatial_cache, "spatial path must actually engage"
    np.testing.assert_allclose(b_sp, b_ac, rtol=0.05)
