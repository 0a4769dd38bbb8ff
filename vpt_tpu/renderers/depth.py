"""Depth — first-crossing depth image.

Re-implements the reference Depth renderer (``src/glsl/renderers/
DepthRenderer.glsl`` generate:53-79; defaults ``DepthRenderer.js:18-53``):
an EAM-style march accumulating opacity until it crosses ``threshold``; the
output is the ray parameter ``t`` (in [tnear, tfar] units) at the crossing,
or −1 when the ray never reaches the threshold.  Progressive integrate is the
same running mean as EAM.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import rng, sampling
from . import _march
from .base import Scene, march_interval, params_dataclass, static_field


@params_dataclass
class Params:
    extinction: float = 100.0
    slices: int = static_field(default=64)
    threshold: float = 0.1
    random: bool = static_field(default=False)


def reset(params: Params, height: int, width: int, scene=None):
    acc = jnp.zeros((height, width, 4), jnp.float32)
    return acc.at[..., 3].set(1.0)


def generate(scene: Scene, params: Params, seed, height: int, width: int):
    ndc = sampling.pixel_ndc(height, width)
    ray_from, ray_to = sampling.unproject(ndc, scene.mvp_inverse)
    direction = ray_to - ray_from
    # occupied-interval clamp when the scene opts in (march_clamp); the
    # depth output below uses the SAME clamped (tnear, tfar), so the
    # reported depth stays an absolute ray parameter
    tb = march_interval(scene, ray_from, direction)
    miss = tb[..., 0] >= tb[..., 1]

    start = ray_from + tb[..., 0:1] * direction
    end = ray_from + tb[..., 1:2] * direction
    step_size = jnp.float32(1.0 / params.slices)
    seg_len = jnp.sqrt(jnp.sum((end - start) ** 2, axis=-1))
    ray_step_length = seg_len * step_size

    if params.random:
        _, offset = rng.uniform(rng.pcg(rng.float_bits_to_uint(seed)))
    else:
        offset = jnp.float32(0.0)
    t0 = step_size * offset

    # While a pixel is active its carried t equals the static schedule
    # t0 + i·step (all pixels advance in lockstep until they deactivate,
    # after which the sampled value is masked out), so the march can sample
    # at the schedule and keep the per-pixel t only as the frozen output.
    def composite(carry, t_sched, color, valid):
        t, acc = carry
        active = valid & (t < 1.0) & (acc < params.threshold)
        alpha = color[..., 3]
        new_acc = acc + (1.0 - acc) * alpha * ray_step_length * params.extinction
        acc = jnp.where(active, new_acc, acc)
        t = jnp.where(active, t + step_size, t)
        return t, acc

    ts = t0 + jnp.arange(params.slices, dtype=jnp.float32) * step_size
    t_init = jnp.full((height, width), t0, jnp.float32)
    acc_init = jnp.zeros((height, width), jnp.float32)
    t, acc = _march.march(scene, start, end, ts, composite,
                          (t_init, acc_init))

    # oDepth = mix(tnear, tfar, t) at the exit t, else -1 (glsl:73-77)
    depth = tb[..., 0] + t * (tb[..., 1] - tb[..., 0])
    depth = jnp.where(acc < params.threshold, -1.0, depth)
    depth = jnp.where(miss, -1.0, depth)
    return depth


def render_frame(state, scene: Scene, params: Params, seed, frame_number):
    height, width = state.shape[:2]
    depth = generate(scene, params, seed, height, width)
    frame = jnp.concatenate(
        [depth[..., None], jnp.zeros((height, width, 2), jnp.float32),
         jnp.ones((height, width, 1), jnp.float32)], axis=-1)
    mix = 1.0 / frame_number.astype(jnp.float32)
    return state + (frame - state) * mix


def display(state, scene: Scene, params: Params):
    """vec4(vec3(depth), 1) — grayscale depth (render fragment)."""
    depth = state[..., 0]
    rgb = jnp.repeat(depth[..., None], 3, axis=-1)
    return jnp.concatenate(
        [rgb, jnp.ones(depth.shape + (1,), jnp.float32)], axis=-1)
