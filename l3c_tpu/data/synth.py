"""Synthetic photo-statistics source families (zero-egress corpus aid).

The round-3 family-count ablation (RESULTS.md) showed held-out bpsp
improves monotonically with the number of DISTINCT source families at a
fixed image budget — the 23-source offline corpus, not the framework,
is the flagship's generalization ceiling. With no photo corpus
available offline, this module manufactures additional *families*:
procedural generators whose outputs share natural images' second-order
statistics (≈1/f^2 power spectra, strong cross-channel correlation,
piecewise-smooth regions separated by sharp edges, sensor noise) while
each family keeps its own distinctive higher-order structure, exactly
like distinct photographic sources do.

Counterpart of the reference's unbounded Open Images download
(prep_openimages.sh:39-53) in spirit: more independent sources. Use via
`prep_pipeline --synth_dir` or `generate_families` directly; tiles are
uint8 RGB, ready for `build_corpus(extra_train_dirs=[...])`.

All generators are pure numpy (one host core): FFT-filtered noise and
closed-form fields only, ~10 ms per 256^2 tile.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List

import numpy as np


def _rgb_mix(rng: np.random.RandomState, fields: np.ndarray,
             sat: float = 1.0) -> np.ndarray:
    """Mix ≥1 scalar fields (k, h, w) into correlated RGB in [0, 1].

    Natural photos have highly correlated channels (luma dominates);
    draw a random luma direction plus small chroma components."""
    k = fields.shape[0]
    luma = rng.uniform(0.7, 1.0, (1, 3))
    chroma = rng.normal(0.0, 0.25 * sat, (k, 3))
    chroma[0] *= 0.0
    m = luma + chroma                                    # (k, 3)
    rgb = np.tensordot(fields, m, axes=(0, 0))           # (h, w, 3)
    lo, hi = np.percentile(rgb, [1, 99])
    rgb = (rgb - lo) / max(hi - lo, 1e-6)
    return np.clip(rgb, 0.0, 1.0)


def _spectral_noise(rng: np.random.RandomState, n: int, alpha: float,
                    aniso: float = 0.0, theta: float = 0.0
                    ) -> np.ndarray:
    """Gaussian noise shaped to a 1/f^alpha amplitude spectrum.

    aniso stretches the spectral falloff along direction theta
    (anisotropic textures: wood grain, brushed metal, water)."""
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    if aniso:
        c, s = np.cos(theta), np.sin(theta)
        fu = fx * c + fy * s
        fv = -fx * s + fy * c
        f = np.sqrt((fu * (1 + aniso)) ** 2 + fv ** 2)
    else:
        f = np.sqrt(fx ** 2 + fy ** 2)
    f_safe = np.where(f > 0, f, 1.0)
    amp = np.where(f > 0, f_safe ** (-alpha / 2.0), 0.0)
    spec = (rng.normal(size=(n, n // 2 + 1))
            + 1j * rng.normal(size=(n, n // 2 + 1))) * amp
    x = np.fft.irfft2(spec, s=(n, n))
    return (x - x.mean()) / (x.std() + 1e-9)


def _smooth01(x: np.ndarray) -> np.ndarray:
    lo, hi = x.min(), x.max()
    return (x - lo) / max(hi - lo, 1e-9)


def _fam_spectral(rng, n):
    """Pure 1/f^alpha color noise — the photographic power-spectrum
    prior with no object structure."""
    a = rng.uniform(1.6, 2.4)
    fields = np.stack([_spectral_noise(rng, n, a) for _ in range(3)])
    return _rgb_mix(rng, fields)


def _fam_terrain(rng, n):
    """Ridged fBm: |1/f^2 noise| creases look like rock/terrain."""
    base = _spectral_noise(rng, n, rng.uniform(1.9, 2.3))
    ridged = 1.0 - np.abs(base) / (np.abs(base).max() + 1e-9)
    detail = _spectral_noise(rng, n, 1.2) * 0.15
    return _rgb_mix(rng, np.stack([ridged, detail, base * 0.3]))


def _fam_aniso(rng, n):
    """Anisotropic grain (wood / brushed metal / water)."""
    th = rng.uniform(0, np.pi)
    g = _spectral_noise(rng, n, rng.uniform(1.5, 2.0),
                        aniso=rng.uniform(4.0, 12.0), theta=th)
    rings = np.sin(g * rng.uniform(2, 6)
                   + _spectral_noise(rng, n, 2.5) * 2.0)
    return _rgb_mix(rng, np.stack([g, rings * 0.4]), sat=0.6)


def _fam_cells(rng, n):
    """Voronoi-like cellular regions: piecewise-smooth patches with
    sharp boundaries (object-edge statistics)."""
    k = rng.randint(12, 40)
    cy = rng.uniform(0, n, k)
    cx = rng.uniform(0, n, k)
    yy, xx = np.mgrid[0:n, 0:n]
    d = ((yy[None] - cy[:, None, None]) ** 2
         + (xx[None] - cx[:, None, None]) ** 2)
    idx = np.argmin(d, axis=0)
    vals = rng.uniform(0, 1, k)
    field = vals[idx]
    shade = _spectral_noise(rng, n, 2.0) * 0.25
    d1 = np.sort(d, axis=0)
    edge = np.sqrt(d1[1]) - np.sqrt(d1[0])          # ridge distance
    edge = np.exp(-edge / rng.uniform(1.0, 4.0)) * 0.5
    return _rgb_mix(rng, np.stack([field, shade, -edge]))


def _fam_shapes(rng, n):
    """Layered soft-edged discs/rectangles with gradient lighting —
    man-made-scene statistics (flat regions, straight edges)."""
    img = np.zeros((n, n))
    yy, xx = np.mgrid[0:n, 0:n]
    grad = (yy * rng.normal(0, 1) + xx * rng.normal(0, 1)) / n
    img += grad
    for _ in range(rng.randint(6, 18)):
        cy, cx = rng.uniform(0, n, 2)
        r = rng.uniform(0.05, 0.4) * n
        soft = rng.uniform(0.5, 6.0)
        if rng.rand() < 0.5:
            m = 1 / (1 + np.exp((np.hypot(yy - cy, xx - cx) - r) / soft))
        else:
            m = (1 / (1 + np.exp((np.abs(yy - cy) - r) / soft))
                 * 1 / (1 + np.exp((np.abs(xx - cx) - r * rng.uniform(
                     0.3, 3.0)) / soft)))
        img = img * (1 - 0.8 * m) + m * rng.uniform(-1, 1)
    tex = _spectral_noise(rng, n, 1.8) * 0.1
    return _rgb_mix(rng, np.stack([img, tex]))


def _fam_sky(rng, n):
    """Smooth vertical gradient + low-frequency clouds (sky/sea)."""
    yy = np.linspace(-1, 1, n)[:, None] * np.ones((1, n))
    clouds = _spectral_noise(rng, n, rng.uniform(2.4, 3.0))
    haze = _spectral_noise(rng, n, 2.0) * 0.2
    return _rgb_mix(rng, np.stack([yy * rng.uniform(0.5, 1.5),
                                   np.maximum(clouds, 0), haze]),
                    sat=1.4)


def _fam_bokeh(rng, n):
    """Out-of-focus photo statistics: blurred bright discs over a
    smooth dark field."""
    img = _spectral_noise(rng, n, 2.2) * 0.2 - 0.5
    yy, xx = np.mgrid[0:n, 0:n]
    for _ in range(rng.randint(8, 30)):
        cy, cx = rng.uniform(0, n, 2)
        r = rng.uniform(0.02, 0.12) * n
        m = 1 / (1 + np.exp((np.hypot(yy - cy, xx - cx) - r)
                            / rng.uniform(1.5, 5.0)))
        img += m * rng.uniform(0.3, 1.2)
    return _rgb_mix(rng, np.stack([img]), sat=1.6)


def _fam_waves(rng, n):
    """Interfering sinusoids (fabric weave / ripples / moire)."""
    yy, xx = np.mgrid[0:n, 0:n]
    img = np.zeros((n, n))
    for _ in range(rng.randint(2, 5)):
        fy, fx = rng.uniform(-0.15, 0.15, 2)
        img += np.sin(2 * np.pi * (fy * yy + fx * xx)
                      + rng.uniform(0, 2 * np.pi)) * rng.uniform(.3, 1)
    warp = _spectral_noise(rng, n, 2.0)
    return _rgb_mix(rng, np.stack([img, warp * 0.4]), sat=0.5)


def _fam_grain(rng, n):
    """Fine high-frequency grain over a near-flat base (paper, skin,
    plaster) — trains the fine-scale sensor-noise regime."""
    base = _spectral_noise(rng, n, 2.6) * 0.3
    grain = _spectral_noise(rng, n, rng.uniform(0.3, 0.8)) * \
        rng.uniform(0.1, 0.35)
    return _rgb_mix(rng, np.stack([base, grain]), sat=0.4)


def _fam_patch_mosaic(rng, n):
    """Axis-aligned panels with distinct textures (buildings,
    documents, collages): hard straight edges + per-region stats."""
    img = _spectral_noise(rng, n, 2.0)
    for _ in range(rng.randint(3, 8)):
        y0, x0 = rng.randint(0, n - 8, 2)
        h = rng.randint(8, n - y0)
        w = rng.randint(8, n - x0)
        a = rng.uniform(1.0, 2.8)
        img[y0:y0 + h, x0:x0 + w] = (
            _spectral_noise(rng, n, a)[:h, :w] * rng.uniform(0.3, 1.0)
            + rng.uniform(-1, 1))
    return _rgb_mix(rng, np.stack([img]))


def _fam_dof(rng, n):
    """Depth-of-field composite: a sharp textured region over a heavily
    low-passed background — spatially VARYING sharpness, the one photo
    statistic no single-spectrum family has."""
    sharp = _spectral_noise(rng, n, rng.uniform(1.2, 1.8))
    blurred = _spectral_noise(rng, n, rng.uniform(2.8, 3.4))
    # smooth focus mask: thresholded very-low-frequency field
    m = _smooth01(_spectral_noise(rng, n, 3.5))
    m = 1 / (1 + np.exp(-(m - rng.uniform(0.35, 0.65)) * 20))
    img = sharp * m + blurred * (1 - m)
    return _rgb_mix(rng, np.stack([img, m - 0.5]))


def _fam_text(rng, n):
    """Document statistics: rows of short dark strokes on a flat light
    page — extreme bimodal histogram + axis-aligned high-frequency
    structure (scans, signs, screenshots-with-text)."""
    img = np.full((n, n), rng.uniform(0.85, 1.0))
    row_h = rng.randint(6, 14)
    y = rng.randint(2, row_h)
    ink = rng.uniform(0.0, 0.25)
    while y + row_h < n:
        x = rng.randint(0, 8)
        glyph_h = max(2, int(row_h * rng.uniform(0.5, 0.8)))
        while x < n - 2:
            w = rng.randint(2, 14)                     # word segment
            if rng.rand() < 0.8:
                img[y:y + glyph_h, x:min(x + w, n)] = \
                    ink + rng.uniform(0, 0.15)
            x += w + rng.randint(1, 5)                 # letter/word gap
        y += row_h
    # slight page shading + print noise keep it photographic
    shade = _spectral_noise(rng, n, 2.5) * 0.05
    return _rgb_mix(rng, np.stack([img + shade]), sat=0.15)


def _fam_foliage(rng, n):
    """Vegetation: clumped multi-scale blobs with hard silhouettes and
    fine inner texture (leaves/grass against sky gaps)."""
    clumps = _spectral_noise(rng, n, 2.2)
    leaves = _spectral_noise(rng, n, 1.0) * 0.6
    mask = 1 / (1 + np.exp(-(clumps - rng.uniform(-0.3, 0.3)) * 8))
    gaps = _smooth01(_spectral_noise(rng, n, 3.0))     # sky behind
    img = mask * (0.3 + leaves * 0.4) + (1 - mask) * (0.7 + gaps * 0.3)
    return _rgb_mix(rng, np.stack([img, mask - 0.5, leaves * mask]))


def _fam_marble(rng, n):
    """Warped-coordinate veins: sin(k·u + fBm warp) — marble, agate,
    wood figure; thin curvilinear high-contrast features."""
    yy, xx = np.mgrid[0:n, 0:n]
    th = rng.uniform(0, np.pi)
    u = (np.cos(th) * xx + np.sin(th) * yy) / n
    warp = _spectral_noise(rng, n, 2.2) * rng.uniform(1.0, 3.0)
    veins = np.sin(2 * np.pi * u * rng.uniform(2, 8) + warp)
    sharp = np.abs(veins) ** rng.uniform(0.3, 0.8) * np.sign(veins)
    base = _spectral_noise(rng, n, 2.6) * 0.3
    return _rgb_mix(rng, np.stack([sharp, base]), sat=0.5)


def _fam_vector(rng, n):
    """Flat vector art / UI: a few EXACTLY uniform or linear-gradient
    polygons with hard anti-aliased edges and zero sensor noise — the
    run-length regime real screenshots live in."""
    img = np.full((n, n), rng.uniform(0, 1))
    yy, xx = np.mgrid[0:n, 0:n]
    for _ in range(rng.randint(4, 12)):
        # random half-plane pair -> convex strip/wedge regions
        a, b = rng.normal(0, 1, 2)
        c = rng.uniform(-0.5, 0.5) * n
        d = (a * (xx - n / 2) + b * (yy - n / 2) - c) \
            / max(np.hypot(a, b), 1e-6)
        m = np.clip(0.5 - d, 0, 1)                     # 1px AA edge
        if rng.rand() < 0.3:                            # gradient fill
            fill = _smooth01(rng.normal(0, 1) * xx + rng.normal(0, 1)
                             * yy) * rng.uniform(0.5, 1.0)
        else:                                           # flat fill
            fill = rng.uniform(0, 1)
        keep = rng.uniform(0.6, 1.0)
        img = img * (1 - m * keep) + fill * m * keep
    return _rgb_mix(rng, np.stack([img]), sat=0.8)


def _fam_print(rng, n):
    """Periodic printed patterns (fabric, wallpaper, halftone): a
    warped 2-D lattice of repeated motifs."""
    yy, xx = np.mgrid[0:n, 0:n]
    py, px = rng.uniform(0.04, 0.2, 2)
    wy = _spectral_noise(rng, n, 2.4) * rng.uniform(0, 2)
    wx = _spectral_noise(rng, n, 2.4) * rng.uniform(0, 2)
    u = np.sin(2 * np.pi * py * yy + wy)
    v = np.sin(2 * np.pi * px * xx + wx)
    motif = u * v if rng.rand() < 0.5 else np.maximum(u, v)
    if rng.rand() < 0.4:                               # halftone dots
        motif = np.where(motif > rng.uniform(-0.3, 0.3), 1.0, -1.0)
    tex = _spectral_noise(rng, n, 1.8) * 0.15
    return _rgb_mix(rng, np.stack([motif, tex]), sat=0.7)


def _fam_vignette(rng, n):
    """Portrait/lens lighting: smooth radial illumination falloff over
    a gently textured subject — large-scale multiplicative shading."""
    yy, xx = np.mgrid[0:n, 0:n]
    cy, cx = rng.uniform(0.25 * n, 0.75 * n, 2)
    r = np.hypot(yy - cy, xx - cx) / n
    light = np.exp(-(r ** 2) * rng.uniform(2.0, 6.0))
    subject = _spectral_noise(rng, n, 2.3) * 0.4 + 0.5
    img = subject * (0.2 + 0.8 * light)
    return _rgb_mix(rng, np.stack([img, light - 0.5]), sat=0.9)


def _fam_night(rng, n):
    """Low-light scene: near-black base, strong sensor noise, sparse
    saturated point/streak lights — the high-noise dark regime."""
    base = np.abs(_spectral_noise(rng, n, 2.4)) * 0.08
    yy, xx = np.mgrid[0:n, 0:n]
    lights = np.zeros((n, n))
    for _ in range(rng.randint(5, 25)):
        cy, cx = rng.uniform(0, n, 2)
        sy = rng.uniform(0.8, 3.0)
        sx = sy * rng.uniform(1.0, 8.0) if rng.rand() < 0.3 else sy
        lights += np.exp(-(((yy - cy) / sy) ** 2
                           + ((xx - cx) / sx) ** 2)) \
            * rng.uniform(0.5, 1.5)
    img = base + lights
    out = _rgb_mix(rng, np.stack([img, lights]), sat=1.8)
    return out * rng.uniform(0.5, 0.85)        # keep it dark post-norm


def _jpeg_roundtrip(u8: np.ndarray, quality: int) -> np.ndarray:
    """Round-trip a uint8 RGB tile through JPEG at `quality`.

    The reference's Open Images corpus is JPEG-sourced end to end
    (prep_openimages.sh downloads .jpg dumps), so every training pixel
    the reference model sees carries 8x8 DCT block artifacts. Our
    package/procedural sources are artifact-free; this injects that
    statistic."""
    from io import BytesIO

    from PIL import Image
    buf = BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=int(quality))
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def _camera_degrade(u8: np.ndarray, rng: np.random.RandomState
                    ) -> np.ndarray:
    """Physically-motivated sensor noise: gamma-decode to linear light,
    Poisson shot noise (variance proportional to signal) + Gaussian read
    noise, gamma-encode back. Unlike the uniform +-k augmentation, the
    noise level depends on brightness exactly as in real photos (dark
    regions noisier after gamma), which is the statistic a conditional
    density model actually has to calibrate to."""
    gamma = 2.2
    lin = (u8.astype(np.float64) / 255.0) ** gamma
    # full-well capacity in photoelectrons: low = high-ISO noisy shot
    fw = float(rng.uniform(200.0, 4000.0))
    read = float(rng.uniform(0.5, 3.0))             # e- read noise
    e = rng.poisson(lin * fw) + rng.normal(0.0, read, lin.shape)
    lin_n = np.clip(e / fw, 0.0, 1.0)
    out = (lin_n ** (1.0 / gamma)) * 255.0 + 0.5
    return out.astype(np.uint8)


def _fam_multiscale(rng, n):
    """True multi-scale mixture: coarse structure from one family
    rendered at n/4 and bicubic-upsampled, fine detail from ANOTHER
    family, blended through a smooth spatial mask. No single-generator
    family produces content whose statistics CHANGE with scale the way
    photos do (objects at low freq, texture at high freq); this one
    does, by construction."""
    from PIL import Image
    coarse_fams = [_fam_shapes, _fam_cells, _fam_sky, _fam_terrain]
    fine_fams = [_fam_grain, _fam_aniso, _fam_waves, _fam_foliage,
                 _fam_marble]
    coarse = coarse_fams[rng.randint(len(coarse_fams))](rng, n // 4)
    coarse = np.asarray(Image.fromarray(
        (coarse * 255).astype(np.uint8)).resize((n, n), Image.BICUBIC)
    ).astype(np.float64) / 255.0
    fine = fine_fams[rng.randint(len(fine_fams))](rng, n)
    amount = rng.uniform(0.15, 0.5)
    m = _smooth01(_spectral_noise(rng, n, 3.0))[..., None]
    mix = coarse * (1 - amount * m) + fine * (amount * m)
    return np.clip(mix, 0.0, 1.0)


def _fam_jpegtex(rng, n):
    """Compression-artifact texture: sharp-structured content pushed
    through aggressive JPEG so 8x8 block boundaries, DCT ringing and
    chroma bleeding BECOME the dominant statistic (thumbnails, memes,
    re-shared web photos)."""
    base_fams = [_fam_shapes, _fam_text, _fam_vector, _fam_cells,
                 _fam_foliage]
    rgb = base_fams[rng.randint(len(base_fams))](rng, n)
    u8 = (rgb * 255.0 + 0.5).astype(np.uint8)
    u8 = _jpeg_roundtrip(u8, rng.randint(8, 40))
    if rng.rand() < 0.3:                    # double-compressed re-share
        u8 = _jpeg_roundtrip(u8, rng.randint(30, 70))
    return u8.astype(np.float64) / 255.0


def _fam_camnoise(rng, n):
    """Low-light camera capture: smooth scene content whose visible
    texture IS the sensor noise (shot + read, signal-dependent).
    Complements `night` (which is about sparse lights) by making the
    noise field itself the family's structure."""
    scene_fams = [_fam_sky, _fam_vignette, _fam_dof, _fam_bokeh]
    rgb = scene_fams[rng.randint(len(scene_fams))](rng, n)
    rgb = rgb * rng.uniform(0.25, 0.7)        # underexpose
    u8 = (rgb * 255.0 + 0.5).astype(np.uint8)
    return _camera_degrade(u8, rng).astype(np.float64) / 255.0


FAMILIES: Dict[str, Callable] = {
    "spectral": _fam_spectral,
    "terrain": _fam_terrain,
    "aniso": _fam_aniso,
    "cells": _fam_cells,
    "shapes": _fam_shapes,
    "sky": _fam_sky,
    "bokeh": _fam_bokeh,
    "waves": _fam_waves,
    "grain": _fam_grain,
    "mosaic": _fam_patch_mosaic,
    # round-3 session-3 additions: statistics the first ten don't span
    "dof": _fam_dof,
    "text": _fam_text,
    "foliage": _fam_foliage,
    "marble": _fam_marble,
    "vector": _fam_vector,
    "print": _fam_print,
    "vignette": _fam_vignette,
    "night": _fam_night,
    # round-4 additions (VERDICT item 7): the three statistics the
    # eighteen above still don't span
    "multiscale": _fam_multiscale,
    "jpegtex": _fam_jpegtex,
    "camnoise": _fam_camnoise,
}


def render_tile(family: str, rng: np.random.RandomState,
                n: int = 256, noise_frac: float = 0.5) -> np.ndarray:
    """One uint8 RGB tile of a family, with sensor-noise augmentation
    matching offline_corpus._tiles_from's policy."""
    rgb = FAMILIES[family](rng, n)
    # mild random gamma (exposure) like real camera pipelines
    rgb = rgb ** rng.uniform(0.8, 1.25)
    u8 = (rgb * 255.0 + 0.5).astype(np.uint8)
    if rng.rand() < noise_frac:
        r = rng.rand()
        if r < 0.4:          # signal-dependent sensor noise (mild ISO)
            u8 = _camera_degrade(u8, rng)
        elif r < 0.7:        # re-saved web photo (mild JPEG)
            u8 = _jpeg_roundtrip(u8, rng.randint(55, 92))
        else:                # legacy uniform dither
            k = int(rng.choice([1, 2, 4, 6]))
            u8 = np.clip(u8.astype(np.int16)
                         + rng.randint(-k, k + 1, u8.shape),
                         0, 255).astype(np.uint8)
    return u8


def generate_families(out_dir: str, tiles_per_family: int = 40,
                      n: int = 256, seed: int = 0,
                      families: List[str] | None = None) -> List[str]:
    """Write PNG tiles for each family into out_dir; returns paths."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi, fam in enumerate(families or list(FAMILIES)):
        rng = np.random.RandomState(seed * 1000 + fi)
        for t in range(tiles_per_family):
            p = os.path.join(out_dir, f"synth_{fam}_{t:04d}.png")
            if not os.path.isfile(p):
                Image.fromarray(render_tile(fam, rng, n)).save(p)
            paths.append(p)
    return paths
