"""LAO — ray marching with local ambient occlusion and soft shadows.

Re-implements the reference LAO renderer (``src/glsl/renderers/
LAORenderer.glsl:97-191``; defaults ``LAORenderer.js:18-122``): a front-to-
back march with a 2D transfer-function lookup of (value, |∇|), a per-step
local-ambient-occlusion loop (:135-151), and a stochastic soft-shadow loop
(:153-167), each darkening the slice color by fixed tint vectors (:176-177).

Faithfulness notes (reproduced, not "fixed", so images match):
- the reference's ``rand`` is a stateless hash of ``vPosition * seed`` with a
  *constant* seed (:60, mixins/rand.glsl), so every call in a pixel returns
  the same value — its AO/shadow sample loops are perfectly correlated and
  reduce to a single evaluation (the sample counts cancel), which is what
  this implementation computes;
- ``voxelSize`` is the hard-coded 1/32 of the shader (:59, reference TODO);
- the light is the MVP-inverse-transformed light position without
  dehomogenization (vertex:25);
- ``nDotL`` is computed but unused by the shader; it is omitted here.
- the integrate stage overwrites the accumulator with the latest frame
  (LAO integrate fragment:226), i.e. LAO is non-progressive.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import rng, sampling
from .base import Scene, params_dataclass, static_field


@params_dataclass
class Params:
    extinction: float = 100.0
    lao_weight: float = 0.69
    soft_shadows_weight: float = 0.54
    light_radius: float = 0.19
    light_position: tuple = (2.0, 12.0, 3.0)
    light_coefficient: float = 1.0
    local_ambient_occlusion: bool = static_field(default=True)
    num_lao_samples: int = static_field(default=1)
    lao_step_size: float = static_field(default=0.05)
    soft_shadows: bool = static_field(default=True)
    num_shadow_samples: int = static_field(default=10)
    slices: int = static_field(default=64)
    #: read (value, |∇|) from a 2-channel volume baked with
    #: volume.with_lao_gradient instead of recomputing the 7-tap central
    #: difference per sample — an opt-in fast mode (the baked |∇| equals
    #: the in-shader stencil at voxel centers and is trilinearly
    #: interpolated between them); requires a 2-channel volume.
    baked_gradient: bool = static_field(default=False)


_VOXEL_SIZE = 1.0 / 32.0  # LAORenderer.glsl:59 (reference hard-codes this)


def reset(params: Params, height: int, width: int, scene=None):
    acc = jnp.zeros((height, width, 4), jnp.float32)
    return acc.at[..., 3].set(1.0)


def generate(scene: Scene, params: Params, seed, height: int, width: int):
    shape = getattr(scene, "volume_shape", None)
    if shape is None:
        shape = scene.volume.shape
    if params.baked_gradient and shape[-1] < 2:
        raise ValueError(
            "baked_gradient needs a 2-channel (value, |grad|) volume — "
            "bake one with volume.with_lao_gradient")
    ndc = sampling.pixel_ndc(height, width)
    ray_from, ray_to = sampling.unproject(ndc, scene.mvp_inverse)
    direction = ray_to - ray_from
    tb = jnp.maximum(sampling.intersect_cube(ray_from, direction), 0.0)
    miss = tb[..., 0] >= tb[..., 1]

    start = ray_from + tb[..., 0:1] * direction
    end = ray_from + tb[..., 1:2] * direction
    step_size = jnp.float32(1.0 / params.slices)

    # vLight = (inverseMvp · [lightPos, 1]).xyz without /w (vertex:25)
    lp = jnp.concatenate([jnp.asarray(params.light_position, jnp.float32),
                          jnp.ones((1,), jnp.float32)])
    light = sampling.apply_mat4(scene.mvp_inverse, lp)[:3]

    # the reference's stateless per-pixel random value (:60,115)
    seed_vec = jnp.array([3.14, 2.71], jnp.float32)
    rx = rng.rand_vec2(ndc * seed_vec)[..., 0]
    # rand(seed).x with the constant seed — a scalar constant (:156)
    rconst = rng.rand_vec2(seed_vec)[0]

    t0 = jnp.clip(rx * step_size * 1.5, 0.0, 1.0)

    def value_at(p):
        return scene.sample_value(p)

    def march(carry, i):
        acc = carry
        t = t0 + i.astype(jnp.float32) * step_size
        # continue-condition: t < 1 and the 0.9/0.98/0.99 breaks (:119-182)
        active = (t < 1.0) & (acc[..., 3] <= 0.9)
        position = start + t[..., None] * (end - start)

        if params.baked_gradient:
            # one gather yields (value, baked |∇|) — see Params
            rg = scene.sample_volume_rg(position)
            value, grad_mag = rg[..., 0], rg[..., 1]
        else:
            grad = scene.raw_gradient(position, _VOXEL_SIZE)
            grad_mag = jnp.sqrt(jnp.sum(grad * grad, axis=-1))
            value = value_at(position)

        # --- local ambient occlusion (:135-151).  The stateless rand makes
        # every sample identical, but the reference does NOT reset its inner
        # accumulator between samples (:136-148): each iteration adds the
        # same inner sum S to the carried value, rescales by 1/coefficient,
        # clamps, and adds to the total — reproduced exactly for N > 1. ---
        lao = jnp.zeros_like(value)
        if params.local_ambient_occlusion:
            rdir = jnp.sign(2.0 * rx - 1.0)[..., None] \
                * (rx / np.sqrt(3.0))[..., None] * jnp.ones((1, 1, 3))
            t2s = np.arange(0.001, 1.0, params.lao_step_size,
                            dtype=np.float32)
            inner = jnp.zeros_like(value)
            for t2 in t2s:
                lao_half = light + rdir * (params.light_radius * t2) \
                    - position
                lao_half = lao_half / jnp.sqrt(jnp.maximum(
                    jnp.sum(lao_half ** 2, axis=-1, keepdims=True), 1e-20))
                sample_pos = position + lao_half * t2
                inner = inner + value_at(sample_pos) \
                    * np.float32((1.0 - t2) ** 2)
            carried = jnp.zeros_like(value)
            total = jnp.zeros_like(value)
            for _ in range(params.num_lao_samples):
                carried = jnp.clip((carried + inner)
                                   / params.light_coefficient, 0.0, 1.0)
                total = total + carried
            lao = total / params.num_lao_samples

        # --- soft shadows (:153-167); again one evaluation suffices ---
        soft = jnp.zeros_like(value)
        if params.soft_shadows:
            sdir = jnp.stack([
                -1.0 + light[0] * rx,
                light[1] + rx * light[2],
                jnp.broadcast_to(-1.0 + 2.0 * rconst, rx.shape),
            ], axis=-1)
            sdir = sdir / jnp.sqrt(jnp.maximum(
                jnp.sum(sdir ** 2, axis=-1, keepdims=True), 1e-20))
            sdir = sdir * rx[..., None]
            vshadow = value_at(position + sdir * params.light_radius)
            contrib = vshadow * (vshadow * 0.2) * jnp.sqrt(
                jnp.sum(sdir ** 2, axis=-1))
            contrib = jnp.clip(contrib * 20.0, 0.0, 1.0)
            # mix(1 - 0, contrib, 1.2) then /1.3, clamp (:166-170)
            soft = jnp.clip((-0.2 + 1.2 * contrib) / 1.3, 0.0, 1.0)

        color = scene.sample_transfer(jnp.stack([value, grad_mag], axis=-1))
        tint_lao = jnp.array([0.15, 0.18, 0.32, 1.0], jnp.float32)
        tint_shadow = jnp.array([0.15, 0.18, 0.22, 1.0], jnp.float32)
        w1 = (lao * params.lao_weight)[..., None]
        color = color * (1.0 - w1) + color * tint_lao * w1
        w2 = (soft * params.soft_shadows_weight)[..., None]
        color = color * (1.0 - w2) + color * tint_shadow * w2

        new_rgb = acc[..., :3] + (1.0 - acc[..., 3:4]) * color[..., :3] \
            * value[..., None]
        new_a = acc[..., 3] + (1.0 - acc[..., 3]) * value \
            * params.extinction / 100.0
        new_acc = jnp.concatenate([new_rgb, new_a[..., None]], axis=-1)
        return jnp.where(active[..., None], new_acc, acc), None

    acc0 = jnp.zeros((height, width, 4), jnp.float32)
    acc, _ = lax.scan(march, acc0, jnp.arange(params.slices))

    over = acc[..., 3:4] > 1.0
    rgb = jnp.where(over, acc[..., :3] / jnp.maximum(acc[..., 3:4], 1e-6),
                    acc[..., :3])
    frame = jnp.concatenate(
        [rgb, jnp.ones((height, width, 1), jnp.float32)], axis=-1)
    return jnp.where(miss[..., None],
                     jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), frame)


def render_frame(state, scene: Scene, params: Params, seed, frame_number):
    """LAO integrate simply replaces the accumulator with the frame
    (integrate fragment:226)."""
    height, width = state.shape[:2]
    return generate(scene, params, seed, height, width)


def display(state, scene: Scene, params: Params):
    return state
