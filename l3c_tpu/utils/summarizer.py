"""Observability: metric/image/histogram summaries with prefix gating.

Reimplements the reference vis/ package's core mechanism
(summarizable_module.py:69-135 + safe_summary_writer.py + the bottleneck /
histogram summaries of multiscale_blueprint.py:100-118): a `Summarizer`
that any component can emit scalars/images/histograms into, gated by an
enabled (prefix, step) window so disabled summaries cost nothing.

Functional-JAX twist: instead of injecting a summarizer object through an
nn.Module tree (impossible under jit), the TRAINER computes summary
tensors from the jitted step's outputs (`Out`, metrics) on the host, and
the helpers here turn them into TB-ready payloads:

- bottleneck_image: grayscale symbol map per bottleneck channel
  (multiscale_blueprint.py new_bottleneck_summary)
- symbol_histogram: observed vs predicted symbol distributions
  (vis/histogram_plotter.py p_x vs p_y bars)
- SafeWriter: uint8/float-safe wrapper over torch's SummaryWriter with
  graceful no-op when tensorboard is unavailable.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Summarizer:
    """Collects (tag -> payload) while enabled; flushes to a writer."""

    def __init__(self, writer=None):
        self.writer = writer
        self._enabled_prefix: Optional[str] = None
        self._step = 0

    def enable(self, prefix: str, step: int):
        self._enabled_prefix = prefix
        self._step = step

    def disable(self):
        self._enabled_prefix = None

    @property
    def enabled(self) -> bool:
        return self._enabled_prefix is not None and self.writer is not None

    def _tag(self, tag: str) -> str:
        return f"{self._enabled_prefix}/{tag}"

    def scalar(self, tag: str, value):
        if self.enabled:
            self.writer.add_scalar(self._tag(tag), float(value), self._step)

    def scalars(self, values: Dict[str, float]):
        for k, v in values.items():
            self.scalar(k, v)

    def image(self, tag: str, img_hw3_or_hw: np.ndarray):
        if not self.enabled:
            return
        img = to_image(img_hw3_or_hw)
        self.writer.add_image(self._tag(tag), img, self._step,
                              dataformats="HWC")

    def histogram(self, tag: str, values: np.ndarray):
        if self.enabled:
            self.writer.add_histogram(self._tag(tag), np.asarray(values),
                                      self._step)

    def figure(self, tag: str, fig):
        if self.enabled and fig is not None and hasattr(
                self.writer, "add_figure"):
            self.writer.add_figure(self._tag(tag), fig, self._step)


def to_image(arr: np.ndarray) -> np.ndarray:
    """Any 2D/3D float or int array -> uint8 HWC (vis/image_summaries)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    if arr.dtype != np.uint8:
        lo, hi = float(arr.min()), float(arr.max())
        arr = (arr - lo) / (hi - lo + 1e-9) * 255.0
        arr = arr.astype(np.uint8)
    return arr


def bottleneck_image(syms_hw: np.ndarray, L: int) -> np.ndarray:
    """Grayscale bottleneck symbol map in [0,255] uint8."""
    s = np.asarray(syms_hw, np.float32)
    assert s.min() >= 0 and s.max() < L, (s.min(), s.max(), L)
    return (s / L * 255.0).astype(np.uint8)


def symbol_histogram(syms: np.ndarray, L: int) -> np.ndarray:
    """Normalized observed symbol distribution p_x, (L,)."""
    counts = np.bincount(np.asarray(syms).reshape(-1), minlength=L)
    return counts / max(1, counts.sum())


def add_scale_summaries(summarizer: Summarizer, out, q_L: int):
    """Per-scale bottleneck images + symbol histograms from an `Out`.

    Mirrors MultiscaleBlueprint.add_image_summaries
    (multiscale_blueprint.py:100-118): one grayscale image per bottleneck
    channel, plus the observed symbol distribution.
    """
    if not summarizer.enabled:
        return
    for scale in range(1, len(out.S)):
        syms = np.asarray(out.S[scale])[0]  # (h, w, C)
        for c in range(syms.shape[-1]):
            summarizer.image(f"bn/{scale}/c{c}",
                             bottleneck_image(syms[..., c], q_L))
        summarizer.histogram(f"bn_syms/{scale}",
                             np.asarray(out.S[scale]).reshape(-1))


def ps_figure(p_x: np.ndarray, p_y: np.ndarray):
    """Observed-vs-predicted symbol-distribution bar figure.

    The reference's vis/histogram_plotter.py:28-40 side-by-side bars of
    p_x (observed) against p_y (model-predicted): the calibration view
    that shows exactly where the model's distribution diverges from the
    data (e.g. mass pushed below symbol 0 — the round-2 lower-tail
    coder bug would have been visible here during training). Returns a
    matplotlib Figure, or None if matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    p_x = np.asarray(p_x, np.float64)
    p_x = p_x / max(1e-12, p_x.sum())
    p_y = np.asarray(p_y, np.float64)
    fig, ax = plt.subplots(figsize=(8, 3))
    idx = np.arange(len(p_x))
    w = 0.4
    ax.bar(idx - w, p_x, width=w, label="p_x (observed)", align="edge")
    ax.bar(idx, p_y, width=w, label="p_y (predicted)", align="edge",
           alpha=0.7)
    ax.set_xlabel("symbol")
    ax.legend()
    fig.tight_layout()
    return fig


class SafeWriter:
    """TB writer facade: silently no-ops if tensorboard is missing and
    coerces payload dtypes (reference SafeSummaryWriter)."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    def add_scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def add_image(self, tag, img, step, dataformats="HWC"):
        if self._w is not None:
            self._w.add_image(tag, to_image(img), step,
                              dataformats=dataformats)

    def add_histogram(self, tag, values, step):
        if self._w is not None:
            self._w.add_histogram(tag, np.asarray(values), step)

    def add_figure(self, tag, fig, step):
        if self._w is not None and fig is not None:
            self._w.add_figure(tag, fig, step)

    def add_histogram_counts(self, tag, counts, edges, step):
        """Histogram from PRE-BUCKETED counts (computed in-graph on the
        accelerator) — the TPU-native replacement for the reference's
        RollingBufferHistogram of raw activations."""
        if self._w is None:
            return
        counts = np.asarray(counts, np.float64)
        edges = np.asarray(edges, np.float64)
        mids = 0.5 * (edges[:-1] + edges[1:])
        n = float(counts.sum())
        if n == 0:
            return
        self._w.add_histogram_raw(
            tag, min=float(edges[0]), max=float(edges[-1]),
            num=int(n), sum=float((counts * mids).sum()),
            sum_squares=float((counts * mids ** 2).sum()),
            bucket_limits=edges[1:].tolist(),
            bucket_counts=counts.tolist(), global_step=step)

    def close(self):
        if self._w is not None:
            self._w.close()
