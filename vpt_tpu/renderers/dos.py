"""DOS — directional occlusion shading via a view-aligned slice sweep.

Re-implements the reference DOS renderer (``src/glsl/renderers/
DOSRenderer.glsl`` integrate:66-82 + occlusion:56-64, JS orchestration
``DOSRenderer.js``): the volume is swept front to back in view-aligned
slices; each slice composites ``1 − exp(−σ·Δs)`` opacity modulated by a
ping-ponged occlusion buffer, and the occlusion buffer is advanced as the
mean of N disk-sample taps times the slice transmittance.

Host-side pieces of the reference move into the functional state:
- the centered-disk occlusion sample offsets (``generateOcclusionSamples``,
  DOSRenderer.js:105-138) are generated at reset from the GLSL-parity RNG;
- the per-frame depth range from the 8 box corners (``calculateDepth``,
  DOSRenderer.js:140-164) is computed from the model-view matrix in-jit;
- the per-slice NDC depth / occlusion scale (DOSRenderer.js:240-248) come
  from the projection matrix.

One ``render_frame`` advances ``steps`` slices of the ``slices``-slice sweep
(DOSRenderer.js:226-254) as a ``lax.scan``; slices past the far depth are
no-ops, mirroring the early ``break``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import math3d as m4
from .. import rng, sampling
from .base import Scene, params_dataclass, static_field


@params_dataclass
class Params:
    extinction: float = 100.0
    aperture: float = 30.0        # degrees
    steps: int = static_field(default=50)     # slices advanced per frame
    slices: int = static_field(default=200)   # total sweep resolution
    samples: int = static_field(default=8)    # occlusion disk taps


def _occlusion_samples(count: int):
    """Centered disk samples (DOSRenderer.js:105-128), deterministic."""
    state = rng.pcg(jnp.arange(2 * count, dtype=jnp.uint32) + jnp.uint32(17))
    _, sq = rng.square(state[:count])
    radius = jnp.sqrt(sq[:, 0])
    angle = sq[:, 1] * 2.0 * jnp.pi
    pts = radius[:, None] * jnp.stack([jnp.cos(angle), jnp.sin(angle)],
                                      axis=-1)
    return pts - jnp.mean(pts, axis=0, keepdims=True)


_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], np.float32)


def _depth_range(model_view):
    """[min, max] of −(V·M·C · corner).z over the 8 cube corners
    (calculateDepth, DOSRenderer.js:140-164); min clamped to 0."""
    cam = m4.transform_point(model_view, _CORNERS)
    depths = -cam[:, 2]
    return jnp.maximum(jnp.min(depths), 0.0), jnp.max(depths)


def reset(params: Params, height: int, width: int, scene: Scene = None):
    assert scene is not None, "DOS reset needs the scene (depth range)"
    min_depth, max_depth = _depth_range(scene.model_view)
    return {
        "color": jnp.zeros((height, width, 4), jnp.float32),
        "occlusion": jnp.ones((height, width), jnp.float32),
        "depth": min_depth,
        "max_depth": max_depth,
        "slice_distance": (max_depth - min_depth) / params.slices,
        "offsets": _occlusion_samples(params.samples),
    }


def render_frame(state, scene: Scene, params: Params, seed, frame_number,
                 *, ndc=None, sample_occlusion=None):
    """``ndc`` / ``sample_occlusion`` are sharding hooks: a spatially
    sharded caller passes this device's global pixel NDC block and a
    halo-aware tap sampler (parallel/dos_halo.py); defaults reproduce the
    single-device behavior."""
    height, width = state["color"].shape[:2]
    if ndc is None:
        ndc = sampling.pixel_ndc(height, width)
    if sample_occlusion is None:
        def sample_occlusion(occlusion, taps):
            # corner-pack the slice's occlusion buffer so each of the N
            # disk taps costs one gather instead of four (the pack itself
            # is four cheap shifted copies on the VPU); bit-identical to
            # sample_texture2d (tests/test_sampling.py)
            packed = sampling.pack_corner_texture2d(occlusion[..., None])
            return sampling.sample_texture2d_packed(
                packed, occlusion.shape + (1,), taps)[..., 0]
    mapped = ndc * 0.5 + 0.5
    slice_distance = state["slice_distance"]
    occlusion_extent = slice_distance * jnp.tan(
        params.aperture * jnp.pi / 180.0)

    def slice_step(carry, _):
        color, occlusion, depth = carry
        active = depth <= state["max_depth"]

        # per-slice NDC depth + occlusion scale: project [1, 1, -depth]
        # (DOSRenderer.js:240-248)
        corr = m4.transform_point(scene.projection,
                                  jnp.stack([1.0, 1.0, -depth]))
        occlusion_scale = corr[:2] * occlusion_extent
        ndc_depth = corr[2]

        # slice position in texture space (DOS integrate vertex:17-23)
        pos3d_h = jnp.concatenate(
            [ndc, jnp.broadcast_to(ndc_depth, ndc.shape[:-1])[..., None],
             jnp.ones(ndc.shape[:-1] + (1,), jnp.float32)], axis=-1)
        pos3d = sampling.apply_mat4(scene.mvp_inverse, pos3d_h)
        pos3d = pos3d[..., :3] / pos3d[..., 3:4]

        outside = jnp.any((pos3d > 1.0) | (pos3d < 0.0), axis=-1)
        ts = scene.sample_color(pos3d)
        extinction = ts[..., 3] * params.extinction
        alpha = 1.0 - jnp.exp(-extinction * slice_distance)
        contrib = ts[..., :3] * occlusion[..., None] * alpha[..., None]
        new_color = color + jnp.concatenate(
            [contrib * (1.0 - color[..., 3:4]), alpha[..., None]], axis=-1)
        new_color = new_color.at[..., 3].min(1.0)

        # occlusion: mean of disk taps on the previous occlusion buffer
        # times the slice transmittance (DOS glsl:56-64)
        taps = mapped[None] + state["offsets"][:, None, None, :] \
            * occlusion_scale
        gathered = sample_occlusion(occlusion, taps)
        new_occlusion = jnp.mean(gathered, axis=0) \
            * jnp.exp(-extinction * slice_distance)

        write = active & ~outside
        color = jnp.where(write[..., None], new_color, color)
        occlusion = jnp.where(write, new_occlusion, occlusion)
        depth = jnp.where(active, depth + slice_distance, depth)
        return (color, occlusion, depth), None

    (color, occlusion, depth), _ = lax.scan(
        slice_step, (state["color"], state["occlusion"], state["depth"]),
        None, length=params.steps)
    return dict(state, color=color, occlusion=occlusion, depth=depth)


def display(state, scene: Scene, params: Params):
    """mix(white, color, alpha) (DOS render fragment:113-116)."""
    color = state["color"]
    rgb = 1.0 + (color[..., :3] - 1.0) * color[..., 3:4]
    return jnp.concatenate(
        [rgb, jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)], axis=-1)
