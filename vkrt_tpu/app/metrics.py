"""Per-frame metrics + observability.

The reference's only instrumentation is a CPU FPS counter
(ref: src/Raytracer.cpp:213-216) and debug-marker labels for RenderDoc
(ref: src/DebugMarker.cpp). TPU equivalents here:
  * FrameTimer — wall-clock frame ms, FPS, Mrays/s (the BASELINE metric)
  * named profiler scopes via jax.profiler (trace with `with profile(dir)`)
  * NaN sentinel check (the validation-layer analogue for shading math)
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import List

import numpy as np


@dataclasses.dataclass
class FrameStats:
    frame_ms: float
    rays: int

    @property
    def mrays_per_s(self) -> float:
        return self.rays / (self.frame_ms / 1000.0) / 1e6

    @property
    def fps(self) -> float:
        return 1000.0 / self.frame_ms


class FrameTimer:
    """Collects per-frame wall-clock stats (ref FPS counter analogue)."""

    def __init__(self):
        self.frames: List[FrameStats] = []
        self._t0 = None

    def begin(self):
        self._t0 = time.perf_counter()

    def end(self, rays: int) -> FrameStats:
        dt = (time.perf_counter() - self._t0) * 1000.0
        stats = FrameStats(frame_ms=dt, rays=rays)
        self.frames.append(stats)
        return stats

    def summary(self) -> dict:
        if not self.frames:
            return {}
        ms = np.array([f.frame_ms for f in self.frames])
        rays = np.array([f.rays for f in self.frames])
        steady = slice(1, None) if len(ms) > 1 else slice(None)
        return {
            "frames": len(ms),
            "frame_ms_mean": float(ms[steady].mean()),
            "frame_ms_min": float(ms.min()),
            "fps_mean": float(1000.0 / ms[steady].mean()),
            "mrays_per_s": float((rays[steady] / ms[steady]).mean() / 1e3),
            "total_rays": int(rays.sum()),
        }


@contextlib.contextmanager
def profile(trace_dir: str | None):
    """jax.profiler trace scope (DebugMarker/RenderDoc analogue)."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


def check_finite(fb: np.ndarray, label: str = "framebuffer") -> None:
    """NaN/Inf sentinel (validation-layer analogue)."""
    bad = ~np.isfinite(fb)
    if bad.any():
        raise FloatingPointError(
            f"{label}: {bad.sum()} non-finite values (first at "
            f"{np.argwhere(bad)[0].tolist()})")
