"""Profiling & render statistics (reference: rt/profiler.go).

The reference wires Go pprof CPU/heap/block profiles plus atomic render
counters.  TPU equivalents:
  - device traces via ``jax.profiler`` (TensorBoard / Perfetto), enabled by
    ``Profiler(trace_dir=...)``;
  - render counters derived from launch geometry (rays = pixels x spp x
    segments) — the wavefront launches fixed segment counts, so counters
    are exact without atomics;
  - named timers with total/count/min/max/avg mirroring
    rt/profiler.go:220-283.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class TimerStats:
    total: float = 0.0
    count: int = 0
    min: float = float("inf")
    max: float = 0.0

    @property
    def avg(self) -> float:
        return self.total / self.count if self.count else 0.0


@dataclasses.dataclass
class RenderCounters:
    """Mirrors GlobalRenderStats (rt/profiler.go:60-81)."""

    ray_count: int = 0          # camera rays + path segments
    shadow_rays: int = 0
    samples_computed: int = 0
    pixels_rendered: int = 0

    def add_launch(self, n_pixels: int, spp: int, max_depth: int, n_shadow_per_bounce: int):
        camera_rays = n_pixels * spp
        # The reference double counts primaries (RayColor + internal,
        # rt/camera.go:439,448) and counts one ray per recursion level;
        # the wavefront traces exactly max_depth segments per camera ray.
        self.ray_count += camera_rays * (1 + max_depth)
        self.shadow_rays += camera_rays * max_depth * n_shadow_per_bounce
        self.samples_computed += camera_rays
        self.pixels_rendered += n_pixels


class Profiler:
    """Named timers + optional jax.profiler device tracing."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.timers: Dict[str, TimerStats] = defaultdict(TimerStats)
        self.counters = RenderCounters()
        self.trace_dir = trace_dir
        self._tracing = False

    def start(self):
        if self.trace_dir:
            import jax

            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True

    def stop(self):
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.timers[name]
            s.total += dt
            s.count += 1
            s.min = min(s.min, dt)
            s.max = max(s.max, dt)

    def report(self, wall_seconds: float) -> str:
        """Rays/s + samples/s report (rt/profiler.go:286-313)."""
        c = self.counters
        lines = [
            "========================================",
            "         RENDER STATS REPORT",
            "========================================",
            f"Path segments:     {c.ray_count:,}",
            f"Shadow rays:       {c.shadow_rays:,}",
            f"Samples computed:  {c.samples_computed:,}",
            f"Pixels rendered:   {c.pixels_rendered:,}",
        ]
        if wall_seconds > 0:
            lines += [
                f"Segments/second:   {c.ray_count / wall_seconds:,.0f}",
                f"Mrays/s (camera):  {c.samples_computed / wall_seconds / 1e6:.3f}",
            ]
        for name, s in sorted(self.timers.items()):
            lines.append(
                f"timer {name}: total={s.total:.3f}s n={s.count} "
                f"min={s.min:.3f}s max={s.max:.3f}s avg={s.avg:.3f}s"
            )
        lines.append("========================================")
        return "\n".join(lines)


def memory_report() -> str:
    """Device + host memory report (PrintMemStats parity, rt/profiler.go:327-346)."""
    import jax

    lines = ["========================================", "         MEMORY REPORT"]
    try:
        live = jax.live_arrays()
        total = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in live)
        lines.append(f"Live device arrays: {len(live)} ({total / 1e6:.1f} MB)")
    except Exception:
        pass
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
            if stats:
                lines.append(
                    f"{dev}: in_use={stats.get('bytes_in_use', 0)/1e6:.1f}MB "
                    f"peak={stats.get('peak_bytes_in_use', 0)/1e6:.1f}MB "
                    f"limit={stats.get('bytes_limit', 0)/1e6:.0f}MB"
                )
        except Exception:
            pass
    try:
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        lines.append(f"Host peak RSS: {rss / 1024:.1f} MB")
    except Exception:
        pass
    lines.append("========================================")
    return "\n".join(lines)
