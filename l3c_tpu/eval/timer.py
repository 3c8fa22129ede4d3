"""Hierarchical wall-clock profiler for the codec and eval runtimes.

Equivalent of the reference's StackTimeLogger (cuda_timer.py:107-151):
nested scopes, per-iteration means, warmup skipping, and a combinable
per-channel format. Device synchronization is the caller's job here —
JAX arrays are synced via jax.block_until_ready at the measurement sites
instead of a global torch.cuda.synchronize fence.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class StackTimer:
    def __init__(self, skip: int = 0):
        self._prefix: List[str] = []
        self._times: Dict[str, List[float]] = defaultdict(list)
        self._order: List[str] = []
        self._skip = skip
        self._iteration = 0

    @contextlib.contextmanager
    def prefix_scope(self, name: str):
        self._prefix.append(name)
        try:
            yield
        finally:
            self._prefix.pop()

    @contextlib.contextmanager
    def run(self, name: str):
        key = "/".join(self._prefix + [name])
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._iteration >= self._skip:
                if key not in self._times:
                    self._order.append(key)
                self._times[key].append(time.perf_counter() - t0)

    def next_iteration(self):
        self._iteration += 1

    def means(self) -> Dict[str, float]:
        """Per-scope means with compile warmup excluded: when a scope
        has >= 2 samples, the FIRST one (the jit-compile iteration) is
        dropped — the reference skips warmup the same way
        (multiscale_tester.py:297). Single-sample scopes keep their one
        measurement so one-image runs still produce a report."""
        return {k: (sum(v[1:]) / len(v[1:]) if len(v) >= 2
                    else v[0])
                for k, v in self._times.items() if v}

    def lasts(self) -> Dict[str, float]:
        return {k: v[-1] for k, v in self._times.items() if v}

    def report(self, which: str = "mean") -> str:
        vals = self.means() if which == "mean" else self.lasts()
        lines = []
        for k in self._order:
            if k not in vals:
                continue
            depth = k.count("/")
            label = k.rsplit("/", 1)[-1] if depth == 0 else k
            lines.append(f"{'  ' * depth}{label}: "
                         f"{vals[k] * 1000:.1f}ms")
        return "\n".join(lines)


class NoOpTimer:
    """Zero-overhead stand-in (the reference's fjcommon NoOp pattern)."""

    @contextlib.contextmanager
    def prefix_scope(self, name: str):
        yield

    @contextlib.contextmanager
    def run(self, name: str):
        yield

    def next_iteration(self):
        pass

    def means(self):
        return {}

    def lasts(self):
        return {}

    def report(self, which: str = "mean"):
        return ""


def make_timer(enabled: bool, skip: int = 0):
    return StackTimer(skip=skip) if enabled else NoOpTimer()
