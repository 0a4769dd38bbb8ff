"""MIP — maximum-intensity projection.

Re-implements the reference MIP renderer (``src/glsl/renderers/
MIPRenderer.glsl`` generate:51-72, integrate:105-109; defaults
``MIPRenderer.js:18-31``): a per-frame jittered march taking the maximum
transfer-function alpha along the ray, integrated as a running max over
progressive frames.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import rng, sampling
from . import _march
from .base import Scene, march_interval, params_dataclass, static_field


@params_dataclass
class Params:
    steps: int = static_field(default=64)


def reset(params: Params, height: int, width: int, scene=None):
    return jnp.zeros((height, width), jnp.float32)


def generate(scene: Scene, params: Params, seed, height: int, width: int):
    ndc = sampling.pixel_ndc(height, width)
    ray_from, ray_to = sampling.unproject(ndc, scene.mvp_inverse)
    direction = ray_to - ray_from
    # occupied-interval clamp when the scene opts in (march_clamp)
    tb = march_interval(scene, ray_from, direction)
    miss = tb[..., 0] >= tb[..., 1]

    start = ray_from + tb[..., 0:1] * direction
    end = ray_from + tb[..., 1:2] * direction
    step_size = jnp.float32(1.0 / params.steps)
    _, offset0 = rng.uniform(rng.pcg(rng.float_bits_to_uint(seed)))

    # the GLSL do/while walks offset = mod(offset + step, 1) for exactly
    # `steps` iterations (MIPRenderer.glsl:64-69)
    def composite(val, t, color, valid):
        alpha = jnp.where(valid, color[..., 3], 0.0)
        return jnp.maximum(val, alpha)

    ts = jnp.mod(
        offset0 + jnp.arange(params.steps, dtype=jnp.float32) * step_size,
        1.0)
    val0 = jnp.zeros((height, width), jnp.float32)
    val = _march.march(scene, start, end, ts, composite, val0)
    return jnp.where(miss, 0.0, val)


def render_frame(state, scene: Scene, params: Params, seed, frame_number):
    """integrate = max(acc, frame) (MIP integrate fragment)."""
    height, width = state.shape[:2]
    frame = generate(scene, params, seed, height, width)
    return jnp.maximum(state, frame)


def display(state, scene: Scene, params: Params):
    """grayscale expansion: vec4(acc, acc, acc, 1)."""
    rgb = jnp.repeat(state[..., None], 3, axis=-1)
    return jnp.concatenate(
        [rgb, jnp.ones(state.shape + (1,), jnp.float32)], axis=-1)
