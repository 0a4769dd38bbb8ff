"""Small shared utilities (CommonUtils parity).

Counterpart of the reference's ``src/js/utils/CommonUtils.js``: hex↔rgb
color conversion, clamp/lerp/step/smoothstep interpolation helpers, and
JSON file round-trips (the downloadJSON/readTextFile pair used by the
transfer-function widget's save/load buttons).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp


def hex2rgb(s: str):
    """'#rrggbb' → (r, g, b) floats in [0, 1] (CommonUtils.hex2rgb)."""
    s = s.lstrip("#")
    return tuple(int(s[i:i + 2], 16) / 255.0 for i in (0, 2, 4))


def rgb2hex(r: float, g: float, b: float) -> str:
    def byte(x):
        return int(max(0.0, min(1.0, x)) * 255.0 + 0.5)

    return "#{:02x}{:02x}{:02x}".format(byte(r), byte(g), byte(b))


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def lerp(a, b, t):
    return a + (b - a) * t


def step(edge, x):
    return jnp.where(x < edge, 0.0, 1.0)


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def download_json(obj, path):
    """Write an object as JSON (CommonUtils.downloadJSON counterpart)."""
    Path(path).write_text(json.dumps(obj, indent=2))


def read_json(path):
    return json.loads(Path(path).read_text())
