"""Volumes: the 3D scalar-field data the renderers sample.

Counterpart of the reference's ``src/js/Volume.js`` (GL 3D texture owner).
Here a volume is a plain (D, H, W, C) float32 JAX array in [0, 1] plus
metadata; channel 0 is the scalar value, optional channel 1 the gradient
magnitude (the ``.rg`` pair every renderer feeds to the 2D transfer function).
The array layout matches the GL upload order (z-major slices,
``Volume.js:60-71``), so BVP/RAW blocks load without transposition.

Also provides the synthetic test volumes used by the golden-image and
gradient-oracle tests, and :func:`with_gradient_magnitude` to derive channel 1
for 2D transfer functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Volume:
    """data: (D, H, W, C) float32 in [0, 1]; ``filter`` in
    {'linear', 'nearest', 'cubic'} mirrors Volume.setFilter (Volume.js:115-125)."""

    data: jnp.ndarray
    filter: str = "linear"

    def tree_flatten(self):
        return (self.data,), self.filter

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.data.shape[:3]

    @property
    def channels(self) -> int:
        return self.data.shape[3]


def normalized_grid(depth: int, height: int, width: int):
    """Texture-space coordinates of voxel centers, three (D, H, W) arrays
    (x, y, z)."""
    z = (np.arange(depth, dtype=np.float32) + 0.5) / depth
    y = (np.arange(height, dtype=np.float32) + 0.5) / height
    x = (np.arange(width, dtype=np.float32) + 0.5) / width
    zz, yy, xx = np.meshgrid(z, y, x, indexing="ij")
    return xx, yy, zz


def sphere_volume(n: int = 64, center=(0.5, 0.5, 0.5), radius: float = 0.3,
                  soft: float = 0.1) -> Volume:
    """Soft-edged spherical density blob."""
    x, y, z = normalized_grid(n, n, n)
    r = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                + (z - center[2]) ** 2)
    t = np.clip((radius - r) / max(soft, 1e-6) + 0.5, 0.0, 1.0)
    val = (t * t * (3.0 - 2.0 * t)).astype(np.float32)
    return Volume(jnp.asarray(val[..., None]))


def shell_volume(n: int = 64, radius: float = 0.35,
                 thickness: float = 0.08) -> Volume:
    """Hollow spherical shell — exercises isosurfaces and interior scattering."""
    x, y, z = normalized_grid(n, n, n)
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    val = np.exp(-((r - radius) / thickness) ** 2).astype(np.float32)
    return Volume(jnp.asarray(val[..., None]))


def blobs_volume(n: int = 64, seed: int = 0, count: int = 5) -> Volume:
    """Sum of random Gaussian blobs — an asymmetric test scene."""
    rng = np.random.default_rng(seed)
    x, y, z = normalized_grid(n, n, n)
    val = np.zeros((n, n, n), np.float32)
    for _ in range(count):
        c = rng.uniform(0.25, 0.75, size=3)
        s = rng.uniform(0.05, 0.15)
        a = rng.uniform(0.4, 1.0)
        val += a * np.exp(-(((x - c[0]) ** 2 + (y - c[1]) ** 2
                             + (z - c[2]) ** 2) / (2 * s * s)))
    val = np.clip(val, 0.0, 1.0).astype(np.float32)
    return Volume(jnp.asarray(val[..., None]))


def gradient_magnitude(values: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient magnitude of a (D, H, W) scalar field in
    voxel units, normalized so results stay in [0, 1] for typical data."""
    def diff(axis):
        a = jnp.roll(values, -1, axis=axis)
        b = jnp.roll(values, 1, axis=axis)
        d = (a - b) * 0.5
        # clamp the wrap-around at the boundaries to one-sided differences
        idx_first = [slice(None)] * 3
        idx_first[axis] = slice(0, 1)
        idx_last = [slice(None)] * 3
        idx_last[axis] = slice(-1, None)
        d = d.at[tuple(idx_first)].set(
            (jnp.take(values, jnp.array([1]), axis=axis)
             - jnp.take(values, jnp.array([0]), axis=axis)))
        d = d.at[tuple(idx_last)].set(
            (jnp.take(values, jnp.array([values.shape[axis] - 1]), axis=axis)
             - jnp.take(values, jnp.array([values.shape[axis] - 2]),
                        axis=axis)))
        return d

    g = jnp.stack([diff(2), diff(1), diff(0)], axis=-1)
    mag = jnp.sqrt(jnp.sum(g * g, axis=-1))
    return jnp.clip(mag * 2.0, 0.0, 1.0)


def with_gradient_magnitude(volume: Volume) -> Volume:
    """Append a gradient-magnitude channel for 2D transfer functions."""
    values = volume.data[..., 0]
    mag = gradient_magnitude(values)
    return Volume(jnp.stack([values, mag], axis=-1), volume.filter)


def with_lao_gradient(volume: Volume,
                      voxel_size: float = 1.0 / 32.0) -> Volume:
    """Append LAO's own gradient magnitude as channel 1, baked at voxel
    centers: the raw (unnormalized) central difference over ±voxel_size in
    normalized coordinates through the GL trilinear sampler — exactly the
    per-sample stencil of LAORenderer.glsl:73-80 (with its hard-coded
    1/32 voxelSize).  The baked channel equals the in-shader gradient at
    voxel centers; between centers the renderer trilinearly interpolates
    |∇| instead of recomputing ∇ of the interpolant — the approximation
    that makes lao.Params(baked_gradient=True) an opt-in fast mode
    (1 volume tap replaces 7 per slice)."""
    from . import sampling

    data = volume.data if isinstance(volume, Volume) else jnp.asarray(volume)
    d, h, w = data.shape[:3]
    x, y, z = normalized_grid(d, h, w)
    pos = jnp.asarray(np.stack([x, y, z], axis=-1))        # (D, H, W, 3)
    grad = sampling.raw_gradient(data[..., :1], pos, voxel_size)
    mag = jnp.sqrt(jnp.sum(grad * grad, axis=-1))
    vol_filter = volume.filter if isinstance(volume, Volume) else "linear"
    return Volume(jnp.stack([data[..., 0], mag], axis=-1), vol_filter)


def from_raw_bytes(data: bytes, depth: int, height: int, width: int,
                   dtype=np.uint8) -> Volume:
    """Decode a headerless RAW volume (one scalar per voxel, z-major), the
    RAWReader path (readers/RAWReader.js:15-71); uint8 normalizes to [0, 1]."""
    arr = np.frombuffer(data, dtype=dtype, count=depth * height * width)
    arr = arr.reshape(depth, height, width).astype(np.float32)
    if np.issubdtype(dtype, np.integer):
        arr = arr / float(np.iinfo(dtype).max)
    return Volume(jnp.asarray(arr[..., None]))
