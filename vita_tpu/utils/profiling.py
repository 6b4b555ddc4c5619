"""Tracing / profiling utilities (SURVEY.md §5.1 gap-fill).

The reference has no profiling beyond wall-clock prints
(video_audio_demo.py:255-283). Here: jax.profiler trace capture + a
phase timer that is correct on asynchronous backends (it forces a device
readback — plain block_until_ready does not synchronize on the tunnel
TPU backend used in this environment).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import numpy as np


def sync(x) -> None:
    """Force completion of a jax array by reading one element to host."""
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        arr = leaves[0]
        np.asarray(arr.ravel()[0] if hasattr(arr, "ravel") else arr)


class PhaseTimer:
    """Accumulates per-phase wall times; phases like encode/prefill/decode."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "sync" in out:
                sync(out["sync"])
            elif result is not None:
                sync(result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(v / self.counts[k] * 1000, 3)}
            for k, v in self.totals.items()
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=1)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
