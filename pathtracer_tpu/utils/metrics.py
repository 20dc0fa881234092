"""Observability: structured logging, throughput counters, timing.

SURVEY.md §5: the reference's only observability is ``cout`` progress and
the window-title iteration counter (main.cpp:204-205).  Here: structured
per-chunk records (iteration, spp, Mrays/s, wall time, device memory) and
``block_until_ready``-bracketed timers that are honest on an async
dispatch backend.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class Timer:
    """block_until_ready-bracketed wall timer (async-dispatch safe)."""

    t0: float = 0.0
    elapsed: float = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0

    @staticmethod
    def timed(fn, *args, **kwargs):
        """Run fn, block on its outputs, return (outputs, seconds)."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0


@dataclass
class RenderMetrics:
    """Running render telemetry; emits one JSON line per record."""

    stream: object = field(default_factory=lambda: sys.stderr)
    enabled: bool = True
    _last_t: float = field(default_factory=time.perf_counter)
    _last_rays: float = 0.0

    def record(self, *, spp_done: int, rays_traced: float, extra: Optional[dict] = None):
        now = time.perf_counter()
        dt = max(now - self._last_t, 1e-9)
        d_rays = rays_traced - self._last_rays
        rec = {
            "event": "render_chunk",
            "spp_done": spp_done,
            "rays_traced": rays_traced,
            "mrays_per_s": round(d_rays / dt / 1e6, 3),
            "chunk_s": round(dt, 4),
        }
        if extra:
            rec.update(extra)
        self._last_t, self._last_rays = now, rays_traced
        if self.enabled:
            print(json.dumps(rec), file=self.stream, flush=True)
        return rec


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return out


def profile_trace(log_dir: str):
    """Context manager starting a jax.profiler trace (view with
    tensorboard / xprof).  SURVEY.md §5 tracing hook."""
    return jax.profiler.trace(log_dir)
