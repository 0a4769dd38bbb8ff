"""Render-loop instrumentation: rays/s counters and stage timings.

The reference has no profiling at all (SURVEY.md §5 "Tracing/profiling:
absent"); this fills that gap: per-stage wall times, progressive frame
counts, and derived events/s.  For deep traces use ``jax.profiler.trace``
around a render loop — this module only provides the cheap always-on
counters.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Dict


@dataclasses.dataclass
class StageStats:
    calls: int = 0
    seconds: float = 0.0

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.seconds / max(self.calls, 1)


class RenderProfiler:
    """Accumulates per-stage timings and pixel-event counts."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self.events = 0

    @contextlib.contextmanager
    def stage(self, name: str, events: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.stages[name]
            st.calls += 1
            st.seconds += dt
            self.events += events

    def events_per_second(self, stage: str = "render_frame") -> float:
        st = self.stages.get(stage)
        if not st or st.seconds == 0:
            return 0.0
        return self.events / st.seconds

    def summary(self) -> str:
        lines = []
        for name, st in sorted(self.stages.items()):
            lines.append(
                f"{name}: {st.calls} calls, {st.mean_ms:.2f} ms/call")
        if self.events:
            lines.append(
                f"throughput: {self.events_per_second():.3e} events/s")
        return "\n".join(lines)


def photon_stats(state, max_bounces: int = 16) -> dict:
    """MCM photon-state telemetry: in-flight bounce-depth histogram,
    samples-per-pixel statistics, and transmittance/radiance means.

    One device→host sync per call — intended for periodic logging, not the
    hot loop.  ``state`` is an MCM accumulation pytree (renderers/mcm.py)."""
    import numpy as np
    import jax.numpy as jnp

    bounces = jnp.clip(state["bounces"].astype(jnp.int32), 0, max_bounces)
    hist = jnp.bincount(bounces.ravel(), length=max_bounces + 1)
    samples = state["samples"]
    stats = {
        "bounce_histogram": np.asarray(hist).tolist(),
        "mean_bounces": float(jnp.mean(state["bounces"])),
        "samples_per_pixel": {
            "mean": float(jnp.mean(samples)),
            "min": float(jnp.min(samples)),
            "max": float(jnp.max(samples)),
        },
        "mean_transmittance": float(jnp.mean(state["transmittance"])),
        "mean_radiance": float(jnp.mean(state["radiance"])),
    }
    return stats
