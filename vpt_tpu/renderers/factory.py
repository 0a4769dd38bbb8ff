"""Renderer registry — string → renderer, mirroring RendererFactory.js:10-23."""

from __future__ import annotations

from . import base, depth, dos, eam, iso, lao, mcm, mcs, mip

MODULES = {
    "mip": mip,
    "iso": iso,
    "eam": eam,
    "dos": dos,
    "lao": lao,
    "mcs": mcs,
    "mcm": mcm,
    "depth": depth,
}

#: Measured ms per progressive frame at 512² with default params on the
#: v5e-lite tunnel chip (BENCH_NOTES.md "Per-renderer frame times") —
#: interactivity honesty for the viewer/CLI: MCM is comfortably inside
#: the reference's ~16 ms rAF budget, DOS sweeps 10 slices/frame at
#: ~94 ms, and LAO's ~28 pixel-dependent taps × 64 slices are
#: gather-row-bound at ~2.1 s (floor-proven twice; a structural TPU/GPU
#: texture-cache difference, not an implementation gap).
FRAME_COST_MS_512 = {
    "mcm": 13, "mcs": 33, "iso": 85, "dos": 94, "mip": 97, "eam": 97,
    "depth": 97, "lao": 2090,
}


def get_module(key: str):
    if key not in MODULES:
        raise ValueError(
            f"unknown renderer {key!r}; available: {sorted(MODULES)}")
    return MODULES[key]


def make_renderer(key: str, params=None, height: int = 512,
                  width: int = 512) -> base.Renderer:
    module = get_module(key)

    cls = type(f"{key.upper()}Renderer", (base.Renderer,), {
        "module": module,
        "Params": module.Params,
    })
    return cls(params=params, height=height, width=width)
