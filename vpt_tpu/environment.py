"""Environment maps (equirectangular RGBA textures).

The reference initializes a 1×1 white environment texture
(``RenderingContext.js:88-97``) and lets users load equirectangular images
(``setEnvironmentMap``, ``RenderingContext.js:136-141``); MCS/MCM sample it
for rays that leave the volume (``MCMRenderer.glsl:80-83``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def white(height: int = 1, width: int = 1) -> jnp.ndarray:
    """Constant white environment — the reference default."""
    return jnp.ones((height, width, 4), jnp.float32)


def constant(color, height: int = 1, width: int = 1) -> jnp.ndarray:
    c = jnp.asarray(color, jnp.float32)
    if c.shape[-1] == 3:
        c = jnp.concatenate([c, jnp.ones((1,), jnp.float32)])
    return jnp.broadcast_to(c, (height, width, 4)).astype(jnp.float32)


def gradient_sky(height: int = 64, width: int = 128,
                 horizon=(1.0, 0.9, 0.7), zenith=(0.3, 0.5, 1.0)):
    """Simple vertical-gradient sky for tests and demos."""
    t = (np.arange(height, dtype=np.float32) + 0.5) / height
    horizon = np.asarray(horizon, np.float32)
    zenith = np.asarray(zenith, np.float32)
    rows = horizon[None] * (1 - t[:, None]) + zenith[None] * t[:, None]
    rgba = np.concatenate([
        np.broadcast_to(rows[:, None, :], (height, width, 3)),
        np.ones((height, width, 1), np.float32),
    ], axis=-1)
    return jnp.asarray(rgba)


def from_image(image: np.ndarray) -> jnp.ndarray:
    """Convert an (H, W, 3|4) uint8/float image to a float32 RGBA env map."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.ones(img.shape[:-1] + (1,), np.float32)], axis=-1)
    return jnp.asarray(img)
