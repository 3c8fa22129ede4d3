"""PIL-bicubic parity for the RGB-baseline downsampling pyramid.

The reference's RGB baselines build their pyramid with PIL's BICUBIC
reduction on the host (net.py:65-80, images_loader.py:277-288), so the
released RGB / RGB-Shared checkpoints were trained on exactly those
pixel values. layers.bicubic_downsample_x2 replicates Pillow's
fixed-point two-pass algorithm (22-bit integer coefficients, uint8
intermediate) on device; these tests pin BIT-EXACT equality against
Pillow itself — any drift would make imported released checkpoints
mis-predict and silently cost bitrate.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from l3c_tpu.models import layers


@pytest.mark.parametrize("h,w", [(64, 64), (128, 96), (32, 48),
                                 (8, 8), (12, 10), (2, 2)])
def test_bicubic_matches_pil_exactly(h, w):
    rng = np.random.RandomState(h * 100 + w)
    f = jax.jit(layers.bicubic_downsample_x2)
    for _ in range(3):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        ours = np.asarray(f(jnp.asarray(img[None], jnp.float32)))[0]
        pil = np.asarray(Image.fromarray(img).resize(
            (w // 2, h // 2), Image.BICUBIC))
        np.testing.assert_array_equal(ours.astype(np.uint8), pil)


def test_bicubic_extreme_values():
    """Saturated blocks exercise Pillow's clip8 on both ends (negative
    lobes of the cubic kernel overshoot at hard edges)."""
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = 255
    img[:, :8, 1] = 255
    f = jax.jit(layers.bicubic_downsample_x2)
    ours = np.asarray(f(jnp.asarray(img[None], jnp.float32)))[0]
    pil = np.asarray(Image.fromarray(img).resize((16, 16), Image.BICUBIC))
    np.testing.assert_array_equal(ours.astype(np.uint8), pil)


def test_bicubic_batch_consistency():
    """Batched program output equals per-image output (no cross-batch
    float staging concerns: the path is all-integer)."""
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (3, 16, 16, 3)).astype(np.float32)
    f = jax.jit(layers.bicubic_downsample_x2)
    batched = np.asarray(f(jnp.asarray(imgs)))
    for i in range(3):
        single = np.asarray(f(jnp.asarray(imgs[i: i + 1])))[0]
        np.testing.assert_array_equal(batched[i], single)
