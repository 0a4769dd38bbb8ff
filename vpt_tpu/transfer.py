"""Transfer functions authored as Gaussian bumps.

Differentiable JAX counterpart of the reference's TransferFunction widget
(``src/js/ui/TransferFunction/TransferFunction.js:50-121`` +
``src/glsl/TransferFunction.glsl:32-35``): each bump contributes
``color * exp(-r²)`` with ``r = |(bump.position - uv) / bump.size|``, blended
in order with premultiplied-alpha over (GL blendFunc(ONE,
ONE_MINUS_SRC_ALPHA)).  The x axis of the 2D texture is the volume value, the
y axis the second volume channel (gradient magnitude for 2D TFs).

Bumps serialize to/from the widget's JSON format
(``TransferFunction.js:74-85``), so TFs authored in the reference UI load
directly.  Rasterization is a pure function of the bump parameter arrays —
gradients flow to positions, sizes, and colors, which is what inverse TF
fitting optimizes.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SIZE = 256  # widget default (TransferFunction.js:33-34)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TransferFunctionBumps:
    """Batched bump parameters: positions/sizes (N, 2), colors (N, 4)."""

    positions: jnp.ndarray
    sizes: jnp.ndarray
    colors: jnp.ndarray

    def tree_flatten(self):
        return (self.positions, self.sizes, self.colors), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_bumps(self) -> int:
        return self.positions.shape[0]

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_list(bumps: Sequence[Any]) -> "TransferFunctionBumps":
        """From the widget's JSON structure:
        [{"position": {"x","y"}, "size": {"x","y"}, "color": {"r","g","b","a"}}]."""
        pos = np.array([[b["position"]["x"], b["position"]["y"]] for b in bumps],
                       dtype=np.float32).reshape(-1, 2)
        size = np.array([[b["size"]["x"], b["size"]["y"]] for b in bumps],
                        dtype=np.float32).reshape(-1, 2)
        col = np.array([[b["color"]["r"], b["color"]["g"], b["color"]["b"],
                         b["color"]["a"]] for b in bumps],
                       dtype=np.float32).reshape(-1, 4)
        return TransferFunctionBumps(jnp.asarray(pos), jnp.asarray(size),
                                     jnp.asarray(col))

    @staticmethod
    def default() -> "TransferFunctionBumps":
        """The widget's default new bump (TransferFunction.js:129-144)."""
        return TransferFunctionBumps.from_list([{
            "position": {"x": 0.5, "y": 0.5},
            "size": {"x": 0.2, "y": 0.2},
            "color": {"r": 1.0, "g": 0.0, "b": 0.0, "a": 1.0},
        }])

    def to_list(self) -> List[dict]:
        pos = np.asarray(self.positions)
        size = np.asarray(self.sizes)
        col = np.asarray(self.colors)
        return [{
            "position": {"x": float(pos[i, 0]), "y": float(pos[i, 1])},
            "size": {"x": float(size[i, 0]), "y": float(size[i, 1])},
            "color": {"r": float(col[i, 0]), "g": float(col[i, 1]),
                      "b": float(col[i, 2]), "a": float(col[i, 3])},
        } for i in range(self.num_bumps)]

    # -- JSON serde compatible with the widget -----------------------------
    def to_json(self) -> str:
        return json.dumps(self.to_list())

    @staticmethod
    def from_json(text: str) -> "TransferFunctionBumps":
        return TransferFunctionBumps.from_list(json.loads(text))


def rasterize(bumps: TransferFunctionBumps, height: int = DEFAULT_SIZE,
              width: int = DEFAULT_SIZE) -> jnp.ndarray:
    """Render the bump list to an (H, W, 4) float32 RGBA texture.

    Each bump draw computes ``src = color * exp(-r²)`` on the full quad and
    composites ``dst = src + dst * (1 - src.a)`` in bump order, matching the
    widget's GL pipeline exactly.  Row 0 is y = 0 (bottom)."""
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    uu, vv = jnp.meshgrid(u, v)
    uv = jnp.stack([uu, vv], axis=-1)  # (H, W, 2)

    def draw(dst, bump):
        position, size, color = bump
        delta = (position - uv) / size
        r2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
        src = color * jnp.exp(-r2)
        return dst * (1.0 - src[..., 3:4]) + src, None

    init = jnp.zeros((height, width, 4), jnp.float32)
    out, _ = jax.lax.scan(draw, init,
                          (bumps.positions, bumps.sizes, bumps.colors))
    return out


def to_gl_texture(texture, srgb: bool = True,
                  quantize: bool = True) -> jnp.ndarray:
    """Emulate the reference's GL texture path for the TF.

    The widget canvas uploads as SRGB8_ALPHA8 (AbstractRenderer.js:31-44):
    the 8-bit color channels are sRGB-decoded to linear when sampled, alpha
    stays linear.  Apply this to a rasterized TF for sampling-time parity
    with the reference's renderers; skip it (the default elsewhere) to
    treat the authored colors as already linear."""
    tex = jnp.asarray(texture, jnp.float32)
    if quantize:
        tex = jnp.round(jnp.clip(tex, 0.0, 1.0) * 255.0) / 255.0
    if srgb:
        rgb = tex[..., :3]
        linear = jnp.where(rgb <= 0.04045, rgb / 12.92,
                           jnp.power((rgb + 0.055) / 1.055, 2.4))
        tex = jnp.concatenate([linear, tex[..., 3:4]], axis=-1)
    return tex


def gray_ramp(height: int = 2, width: int = DEFAULT_SIZE,
              alpha_scale: float = 1.0) -> jnp.ndarray:
    """Simple diagnostic TF: color = value, alpha = value * scale."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    row = jnp.stack([u, u, u, u * alpha_scale], axis=-1)
    return jnp.broadcast_to(row[None], (height, width, 4)).astype(jnp.float32)
