"""End-to-end tests for the format-v2 (fully on-device) codec."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l3c_tpu.codec.bitcoding import Bitcoding, DecodeError
from l3c_tpu.codec.bitcoding2 import TpuBitcoding
from l3c_tpu.config import MsConfig, EncConfig, DecConfig, QConfig, ProbConfig
from l3c_tpu.models.network import MultiscaleNetwork


def small_cfg():
    return MsConfig(num_scales=3, Cf=16,
                    enc=EncConfig(num_blocks=2), dec=DecConfig(num_blocks=2),
                    q=QConfig(C=5, L=25), prob=ProbConfig(K=3))


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)))
    return cfg, net, params


def _rand_img(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(1, h, w, 3)).astype(np.uint8)


def test_v2_roundtrip_bit_exact(setup, tmp_path):
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(32, 32)
    p = str(tmp_path / "img.l3c")
    bpsp = bc.encode(img, p)
    # untrained model on noise: most mass in mixture tails; the coder's
    # per-symbol cost cap is 2x16 bits (two-level) => up to ~33 bpsp
    assert 0 < bpsp < 35
    out = bc.decode(p)
    np.testing.assert_array_equal(out, img)


def test_v2_roundtrip_padded_nonsquare(setup, tmp_path):
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(19, 45, seed=1)
    p = str(tmp_path / "img.l3c")
    bc.encode(img, p)
    np.testing.assert_array_equal(bc.decode(p), img)


def test_v2_bitrate_close_to_v1(setup, tmp_path):
    """Same model, same image: v1 (host C++) and v2 (on-device) bitstream
    sizes must agree within a few percent (same mixture, same 16-bit
    quantization; only stream framing differs)."""
    cfg, net, params = setup
    img = _rand_img(64, 64, seed=2)
    bc1 = Bitcoding(cfg, net, params)
    bc2 = TpuBitcoding(cfg, net, params)
    p1, p2 = str(tmp_path / "a.l3c"), str(tmp_path / "b.l3c")
    bpsp1 = bc1.encode(img, p1)
    bpsp2 = bc2.encode(img, p2)
    # v1 codes 256-ary symbols with a 16-bit/symbol cap; v2's two-level
    # chain caps at 2x16 bits. On an UNTRAINED model coding noise the
    # caps bind hard (most mass in mixture tails), so v2 streams can be
    # up to ~2x bigger HERE. On trained models both sit within a few %
    # of cross-entropy (asserted against the real trained demo model in
    # demo_eval.py: theory 4.18 vs actual 4.33 bpsp).
    assert bpsp2 < bpsp1 * 2.0, (bpsp1, bpsp2)
    assert bpsp1 < 33 and bpsp2 < 33
    np.testing.assert_array_equal(bc1.decode(p1), img)
    np.testing.assert_array_equal(bc2.decode(p2), img)


def test_v2_rejects_v1_files(setup, tmp_path):
    cfg, net, params = setup
    img = _rand_img(16, 16, seed=3)
    p = str(tmp_path / "v1.l3c")
    Bitcoding(cfg, net, params).encode(img, p)
    with pytest.raises(DecodeError, match="format v2"):
        TpuBitcoding(cfg, net, params).decode(p)


def test_v2_corrupt_stream_raises(setup, tmp_path):
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(16, 16, seed=4)
    p = str(tmp_path / "img.l3c")
    bc.encode(img, p)
    blob = bytearray(open(p, "rb").read())
    blob[6] = 99  # clobber header reserved/scales region
    blob[5] = 99
    bad = str(tmp_path / "bad.l3c")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(DecodeError):
        bc.decode(bad)


def test_v7_canary_mismatch_raises(setup, tmp_path):
    """The v7 header canary attests the coder numerics: a file whose
    canary doesn't match this build must be rejected BEFORE any pixel is
    emitted (the cross-platform safety the VERDICT asked for)."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(16, 16, seed=21)
    p = str(tmp_path / "img.l3c")
    bc.encode(img, p)
    blob = bytearray(open(p, "rb").read())
    blob[8] ^= 0xFF  # canary u32 lives at bytes 8..11 (after magic+BBBB)
    bad = str(tmp_path / "bad_canary.l3c")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(DecodeError, match="canary"):
        bc.decode(bad)
    np.testing.assert_array_equal(bc.decode(p), img)  # original fine


def test_v2_batch_encode_decode(setup, tmp_path):
    """B same-shape images coded in one fused pass; files interchange
    with the single-image API."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    imgs = [_rand_img(24, 16, seed=10 + i) for i in range(3)]
    pouts = [str(tmp_path / f"b{i}.l3c") for i in range(3)]
    bpsps = bc.encode_batch(imgs, pouts)
    assert len(bpsps) == 3 and all(b > 0 for b in bpsps)
    outs = bc.decode_batch(pouts)
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, im)
    # a batch-encoded file decodes ALONE bit-exactly: the v4 contract —
    # decode pads its float programs back to the recorded fbatch, and no
    # operator mixes batch slots, so the slot position doesn't matter
    np.testing.assert_array_equal(bc.decode(pouts[1]), imgs[1])
    # any subset / reordering of the batch decodes too
    outs = bc.decode_batch([pouts[2], pouts[0]])
    np.testing.assert_array_equal(outs[0], imgs[2])
    np.testing.assert_array_equal(outs[1], imgs[0])
    # single-image encodes record fbatch=1 and round-trip
    p_single = str(tmp_path / "single.l3c")
    bc.encode(imgs[0], p_single)
    np.testing.assert_array_equal(bc.decode(p_single), imgs[0])
    # mixing files of different fbatch in one decode_batch is rejected
    # (their float programs differ)
    with pytest.raises(DecodeError, match="fbatch"):
        bc.decode_batch([p_single, pouts[0]])


def test_v2_rgb_baseline_roundtrip(tmp_path):
    """RGB/RGB-Shared baseline models code losslessly too (the targets
    are bicubic-downsampled RGB images at every scale)."""
    cfg = MsConfig(
        num_scales=2, Cf=8, rgb_bicubic_baseline=True,
        enc=EncConfig(cls="BicubicSubsampling", num_blocks=1, feed_F=False),
        dec=DecConfig(num_blocks=1, skip=False),
        q=QConfig(C=3, L=5), prob=ProbConfig(K=2))
    net = MultiscaleNetwork(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)))
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(20, 24, seed=21)
    p = str(tmp_path / "rgb.l3c")
    bpsp = bc.encode(img, p)
    assert 0 < bpsp < 30
    out = bc.decode(p)
    np.testing.assert_array_equal(out, img)


def test_v3_autocrop_part_files(setup, tmp_path, monkeypatch):
    """Big images split into .partN files and stitch back (v3 path)."""
    from l3c_tpu.codec import part_suffix
    monkeypatch.setenv("AC_NEEDS_CROP_DIM", "24,24")
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    img = _rand_img(48, 40, seed=31)
    p = str(tmp_path / "big.l3c")
    bpsp = bc.encode(img, p)
    parts = part_suffix.iter_part_paths(p + ".part0")
    assert len(parts) == 4 and bpsp > 0
    out = bc.decode(parts[0])
    np.testing.assert_array_equal(out, img)


def test_wide_fbatch_16(setup, tmp_path):
    """Logical batch 9 -> physical fbatch 16 (wide-scan serving mode):
    round-trips bit-exactly and interchanges with batch-1 decode."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    imgs = [_rand_img(16, 16, seed=100 + i) for i in range(9)]
    pouts = [str(tmp_path / f"w{i}.l3c") for i in range(9)]
    bc.encode_batch(imgs, pouts)
    outs = bc.decode_batch(pouts)
    for im, o in zip(imgs, outs):
        np.testing.assert_array_equal(o, im)
    # a single file from the wide batch decodes alone too
    out0 = bc.decode(pouts[3])
    np.testing.assert_array_equal(out0, imgs[3])


def test_v2_width_prediction_overflow(setup, tmp_path):
    """The optimistic single-transfer fetch slices words to the PREVIOUS
    batch's width for the same unit geometry; a higher-entropy batch must
    trigger the refetch fallback and still round-trip bit-exactly."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    # batch 1: flat image => short streams recorded as the prediction
    flat = np.full((1, 32, 32, 3), 128, np.uint8)
    p1 = str(tmp_path / "flat.l3c")
    bc.encode(flat, p1)
    assert bc._width_pred, "prediction cache not populated"
    # batch 2 (same geometry): full-entropy noise => longer streams than
    # predicted, exercising the per-unit refetch path
    noisy = _rand_img(32, 32, seed=7)
    p2 = str(tmp_path / "noisy.l3c")
    bc.encode(noisy, p2)
    np.testing.assert_array_equal(bc.decode(p1), flat)
    np.testing.assert_array_equal(bc.decode(p2), noisy)


def test_unpad_dev_layout():
    """_unpad_dev rebuilds each row's padded scan view from the dense
    [u32-offset header | packed words] upload layout."""
    from l3c_tpu.codec.bitcoding2 import _unpad_dev
    rng = np.random.RandomState(3)
    lens = np.array([5, 2, 9, 4], np.int64)
    rows, cols = len(lens), 8
    dense = rng.randint(0, 65535, int(lens.sum())).astype(np.uint16)
    hdr = 2 * rows
    offs = (hdr + np.concatenate([[0], np.cumsum(lens)])[:-1]
            ).astype(np.uint32)
    flat = np.concatenate([
        np.stack([(offs & 0xFFFF).astype(np.uint16),
                  (offs >> 16).astype(np.uint16)], 1).reshape(-1),
        dense, np.zeros(cols, np.uint16)])
    out = np.asarray(jax.jit(_unpad_dev, static_argnums=(2, 3))(
        jnp.asarray(flat), 0, rows, cols))
    assert out.shape == (rows, cols)
    pos = 0
    for r in range(rows):
        n = int(lens[r])
        np.testing.assert_array_equal(out[r, :min(n, cols)],
                                      dense[pos:pos + min(n, cols)])
        pos += n


def test_duplex_interleaved_async(setup, tmp_path):
    """Encode and decode handles in flight simultaneously (the serving
    duplex pipeline bench.py L3C_BENCH_DUPLEX measures): batch i's
    encode dispatched while batch i-1's decode is outstanding, both
    finished out of dispatch order, all round-trips bit-exact."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    imgs = [_rand_img(16, 16, seed=40 + i) for i in range(2)]
    warm = [str(tmp_path / f"w{i}.l3c") for i in range(2)]
    bc.encode_batch(imgs, warm)
    eh = bc.encode_batch_async(
        imgs, [str(tmp_path / f"e0_{i}.l3c") for i in range(2)])
    dh = bc.decode_batch_async(warm)
    eh2 = bc.encode_batch_async(
        imgs, [str(tmp_path / f"e1_{i}.l3c") for i in range(2)])
    dh2 = bc.decode_batch_async(warm)
    bc.encode_batch_finish(eh)
    outs = bc.decode_batch_finish(dh)
    for im, o in zip(imgs, outs):
        np.testing.assert_array_equal(o, im)
    bc.encode_batch_finish(eh2)
    outs = bc.decode_batch_finish(dh2)
    for im, o in zip(imgs, outs):
        np.testing.assert_array_equal(o, im)
    # and the freshly encoded round-0 files decode
    outs = bc.decode_batch([str(tmp_path / f"e0_{i}.l3c")
                            for i in range(2)])
    for im, o in zip(imgs, outs):
        np.testing.assert_array_equal(o, im)


def test_staged_encode_and_device_verify(setup, tmp_path):
    """Device-resident serving path: stage pixels once, encode from the
    staged upload, decode, verify the round-trip ON DEVICE (only the
    8-byte flag+hash is fetched), and confirm the verifier actually
    discriminates (mismatched reference -> eq False, different hash)."""
    cfg, net, params = setup
    bc = TpuBitcoding(cfg, net, params)
    imgs = [_rand_img(16, 16, seed=50 + i) for i in range(2)]
    staged = bc.stage_batch(imgs)
    pouts = [str(tmp_path / f"st{i}.l3c") for i in range(2)]
    bc.encode_batch_finish(bc.encode_batch_async(None, pouts,
                                                 staged=staged))
    dh = bc.decode_batch_async(pouts)
    eq, h = bc.verify_batch_finish(bc.verify_batch_async(dh, staged))
    assert eq
    # staged-encode files are also host-decodable and bit-exact
    for im, o in zip(imgs, bc.decode_batch_finish(dh)):
        np.testing.assert_array_equal(o, im)
    # a wrong reference must fail the device verify
    other = bc.stage_batch([_rand_img(16, 16, seed=99), imgs[1]])
    eq2, h2 = bc.verify_batch_finish(bc.verify_batch_async(dh, other))
    assert not eq2 and h2 == h  # hash is of the DECODED buffer


def test_divmod_by_freq_exact():
    """The f32-division divmod used in the encode scan must equal
    integer divmod on every input satisfying the rANS invariant
    (x1 < fs * 2**16), including adversarial boundaries."""
    from l3c_tpu.ops.tpu_coder import _divmod_by_freq

    rng = np.random.RandomState(7)
    fs = rng.randint(1, 1 << 16, size=200_000).astype(np.uint32)
    # x1 uniform in [0, fs * 2^16)
    x1 = (rng.randint(0, 1 << 16, size=fs.size).astype(np.uint64)
          * fs + rng.randint(0, 1 << 16, size=fs.size)).astype(np.uint64)
    x1 = np.minimum(x1, fs.astype(np.uint64) * (1 << 16) - 1)
    # adversarial: exact multiples, off-by-one around multiples,
    # maximal x1 for its fs, tiny and maximal fs
    ks = rng.randint(0, 1 << 16, size=50_000).astype(np.uint64)
    fs_a = rng.randint(1, 1 << 16, size=ks.size).astype(np.uint32)
    mult = np.minimum(ks * fs_a, fs_a.astype(np.uint64) * (1 << 16) - 1)
    cases_x = [x1, mult, np.maximum(mult, 1) - 1,
               np.minimum(mult + 1, fs_a.astype(np.uint64) * (1 << 16) - 1),
               fs_a.astype(np.uint64) * (1 << 16) - 1]
    cases_f = [fs, fs_a, fs_a, fs_a, fs_a]
    for lo_f in (1, 2, 3, (1 << 16) - 1):
        f_c = np.full(70_000, lo_f, np.uint32)
        x_c = rng.randint(0, int(lo_f) << 16, size=f_c.size).astype(
            np.uint64)
        cases_x.append(x_c)
        cases_f.append(f_c)
    X = np.concatenate(cases_x).astype(np.uint32)
    F = np.concatenate(cases_f).astype(np.uint32)
    q, r = jax.jit(_divmod_by_freq)(jnp.asarray(X), jnp.asarray(F))
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_array_equal(q, X // F)
    np.testing.assert_array_equal(r, X % F)
