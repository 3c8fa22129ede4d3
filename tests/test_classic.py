"""MED+rANS classical baseline (eval/classic.py): round-trip and
predictor properties, plus the TableCoder it rides on."""
import numpy as np
import pytest

from l3c_tpu.eval import classic
from l3c_tpu.ops import coder as coder_mod


def _structured(h, w, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1)
    return np.clip(base + rng.randint(-8, 8, base.shape), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(64, 64), (37, 53), (1, 1), (2, 200)])
def test_medl_roundtrip(h, w):
    for seed in range(2):
        img = (_structured(h, w, seed) if seed == 0 else
               np.random.RandomState(seed).randint(
                   0, 256, (h, w, 3)).astype(np.uint8))
        blob = classic.encode(img)
        np.testing.assert_array_equal(classic.decode(blob), img)


def test_medl_constant_image():
    """A constant channel puts all mass in one residual bucket — the
    histogram quantizer's extreme case (freq 65536 for one symbol)."""
    img = np.full((16, 16, 3), 77, np.uint8)
    blob = classic.encode(img)
    np.testing.assert_array_equal(classic.decode(blob), img)


def test_med_predictor_edges():
    """MED residual/reconstruct inverses on hard edges (where the
    min/max clauses fire) and boundaries."""
    img = np.zeros((8, 8, 1), np.uint8)
    img[:4, :4] = 255
    img[4:, 4:] = 128
    res = coder_mod.med_residuals(img)
    out = coder_mod.med_reconstruct(res, 8, 8)
    np.testing.assert_array_equal(out, img)


def test_med_beats_uniform_on_structure():
    """On piecewise-smooth content the MED baseline must land well
    under 8 bpsp (sanity that prediction + histogram actually code)."""
    img = _structured(128, 128)
    assert classic.bpsp(img) < 6.0


def test_table_coder_roundtrip_skewed():
    rng = np.random.RandomState(3)
    counts = np.zeros(256, np.int64)
    syms = rng.geometric(0.05, size=5000).clip(1, 255)
    syms = np.concatenate([syms, np.zeros(5000, np.int64)]).astype(
        np.int32)
    counts = np.bincount(syms, minlength=256)
    cum = classic._quantize_hist(counts)
    tc = coder_mod.TableCoder(cum)
    data, lens = tc.encode(syms)
    np.testing.assert_array_equal(tc.decode(data, lens, syms.size), syms)


def test_quantize_hist_invariants():
    rng = np.random.RandomState(4)
    for _ in range(20):
        counts = rng.randint(0, 1000, 256)
        counts[rng.randint(0, 256, 200)] = 0
        if counts.sum() == 0:
            counts[0] = 1
        cum = classic._quantize_hist(counts)
        f = np.diff(cum.astype(np.int64))
        assert cum[0] == 0 and cum[-1] == 65536
        assert (f[counts > 0] >= 1).all()      # occurring => codable
        assert (f >= 0).all()


def test_medl_v1_v2_v3_all_decode():
    """decode() dispatches on the version byte."""
    img = _structured(48, 40, 1)
    for enc in (classic.encode, classic.encode_static,
                lambda im: classic.encode(im, version=2)):
        np.testing.assert_array_equal(classic.decode(enc(img)), img)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_medl_v3_roundtrip_channels(c):
    """v3 inter-channel correction round-trips for any channel count
    (alpha block is C*(C-1)/2 int8)."""
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (33, 47, 1)).astype(np.int32)
    img = np.clip(np.concatenate(
        [base + rng.randint(-20, 20, base.shape) for _ in range(c)],
        -1), 0, 255).astype(np.uint8)
    blob = classic.encode(img)
    np.testing.assert_array_equal(classic.decode(blob), img)


def test_medl_v3_negative_alpha():
    """Anti-correlated channels fit a negative alpha; the integer
    floor-division correction must round-trip on that path too."""
    rng = np.random.RandomState(12)
    noise = rng.randint(-30, 30, (40, 40))
    r = np.clip(128 + noise, 0, 255)
    g = np.clip(128 - noise + rng.randint(-3, 3, noise.shape), 0, 255)
    img = np.stack([r, g, r], -1).astype(np.uint8)
    blob = classic.encode(img)
    import struct
    a10 = np.frombuffer(blob, np.int8, 1,
                        struct.calcsize("<HBIIBBB"))[0]
    assert a10 < -32  # strongly negative fit
    np.testing.assert_array_equal(classic.decode(blob), img)


def test_medl_v3_beats_v2_on_correlated_channels():
    """The inter-channel correction must pay on content whose channels
    share structure (the reason v3 exists; -0.64 bpsp on held-out val,
    RESULTS round 5)."""
    rng = np.random.RandomState(13)
    detail = rng.randint(-25, 26, (96, 96))  # shared across channels
    img = np.stack(
        [np.clip(90 + detail, 0, 255),
         np.clip(128 + detail + rng.randint(-2, 3, detail.shape), 0, 255),
         np.clip(170 + detail, 0, 255)], -1).astype(np.uint8)
    assert len(classic.encode(img)) < len(classic.encode(img, version=2))


def test_context_model_beats_static():
    """The context model must actually pay on structured content with
    spatially varying activity (the reason it exists)."""
    img = _structured(128, 128)
    assert len(classic.encode(img)) < len(classic.encode_static(img))


def test_tsgd_cum_invariants():
    for t_idx in (0, 1, 64, 128, 200, 255):
        for p_idx in (0, 3, 128, 255):
            cum = classic._tsgd_cum(t_idx, p_idx)
            f = np.diff(cum.astype(np.int64))
            assert cum[0] == 0 and cum[-1] == 65536
            assert (f >= 1).all()     # every residual stays codable


def test_decoder_context_equals_encoder_context():
    """med_contexts (encode side, from the original) must agree with
    the decoder's inline recomputation — covered end-to-end by the
    round-trip, but pin the map itself on a hard-edge image where
    every activity band fires."""
    rng = np.random.RandomState(9)
    img = (rng.randint(0, 2, (64, 64, 3)) * 255).astype(np.uint8)
    img[32:] = rng.randint(0, 256, (32, 64, 3))
    ctx = coder_mod.med_contexts(img, classic.N_CTX)
    assert ctx.min() == 0 and ctx.max() == classic.N_CTX - 1
    np.testing.assert_array_equal(classic.decode(classic.encode(img)),
                                  img)
