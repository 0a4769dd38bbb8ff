"""Spatially sharded volumes: z-slab decomposition with halo planes.

For grids too large to replicate per chip (SURVEY.md §2h item 2), the volume
shards into z slabs across the mesh's ``space`` axis.  Each device holds its
slab plus one halo plane from the +z neighbor, so trilinear reads at the
partition face never need remote taps; arbitrary sample positions (MCM
photons jump anywhere) are handled by *ownership masking*: every device
evaluates the trilinear fetch for the positions whose cell it owns and
contributes zero elsewhere, and a ``psum`` over ``space`` assembles the
exact value.  This generalizes ray handoff — photons crossing slab
boundaries simply change owner on the next event, no explicit migration.

Composition: ``sharded_render_frame(module, mesh, …)`` shard_maps a whole
renderer frame with pixel rows on ``data`` and slabs on ``space``; inside,
a :class:`HaloScene` duck-types the Scene sampler interface, so every
renderer runs unmodified.  Results are bit-identical to the replicated
render (asserted in tests/test_halo.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..renderers.base import Scene


def shard_volume_with_halo(volume, num_slabs: int):
    """(D, H, W, C) → (S, Ds+1, H, W, C): slab k holds z planes
    [k·Ds, (k+1)·Ds] inclusive — one halo plane from the next slab (the last
    slab replicates its final plane, matching CLAMP_TO_EDGE)."""
    d = volume.shape[0]
    if d % num_slabs != 0:
        raise ValueError(f"depth {d} not divisible by {num_slabs} slabs")
    ds = d // num_slabs
    padded = jnp.concatenate([volume, volume[-1:]], axis=0)  # (D+1, ...)
    slabs = jnp.stack([padded[k * ds:k * ds + ds + 1]
                       for k in range(num_slabs)])
    return slabs


class HaloScene:
    """Scene-alike over a local z slab inside a shard_map body.

    Sampler methods mask to locally owned cells and psum over ``axis``;
    everything else mirrors the replicated Scene.
    """

    def __init__(self, slab, slab_index, num_slabs: int, volume_shape,
                 transfer, environment, mvp_inverse, model_view, projection,
                 axis: str = "space"):
        self.slab = slab                    # (Ds+1, H, W, C)
        self.slab_index = slab_index
        self.num_slabs = num_slabs
        self.volume_shape = volume_shape    # global (D, H, W, C)
        self.transfer = transfer
        self.environment = environment
        self.mvp_inverse = mvp_inverse
        self.model_view = model_view
        self.projection = projection
        self.axis = axis
        self.majorant = None   # local-majorant tracking: replicated-scene only

    # -- trilinear over the local slab with ownership masking --------------
    def _sample(self, position):
        d, h, w, c = self.volume_shape
        ds = d // self.num_slabs
        dims = jnp.array([w, h, d], jnp.float32)
        u = jnp.clip(position * dims - 0.5, 0.0, dims - 1.0)
        i0 = jnp.floor(u)
        f = u - i0
        i0 = jnp.clip(i0.astype(jnp.int32), 0,
                      jnp.array([w - 1, h - 1, d - 1], jnp.int32))
        x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
        owner = jnp.clip(z0 // ds, 0, self.num_slabs - 1)
        local = owner == self.slab_index
        zloc = jnp.clip(z0 - self.slab_index * ds, 0, ds - 1)

        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        z1 = zloc + 1                       # halo plane, always present

        flat = self.slab.reshape((ds + 1) * h * w, c)

        def g(x, y, z):
            return jnp.take(flat, (z * h + y) * w + x, axis=0)

        fx, fy, fz = f[..., 0:1], f[..., 1:2], f[..., 2:3]
        c00 = g(x0, y0, zloc) * (1 - fx) + g(x1, y0, zloc) * fx
        c10 = g(x0, y1, zloc) * (1 - fx) + g(x1, y1, zloc) * fx
        c01 = g(x0, y0, z1) * (1 - fx) + g(x1, y0, z1) * fx
        c11 = g(x0, y1, z1) * (1 - fx) + g(x1, y1, z1) * fx
        val = (c00 * (1 - fy) + c10 * fy) * (1 - fz) \
            + (c01 * (1 - fy) + c11 * fy) * fz
        val = jnp.where(local[..., None], val, 0.0)
        return lax.psum(val, self.axis)

    # -- Scene sampler interface ------------------------------------------
    def sample_volume_rg(self, position):
        s = self._sample(position)
        if s.shape[-1] >= 2:
            return s[..., :2]
        return jnp.concatenate([s, jnp.zeros_like(s)], axis=-1)

    def sample_value(self, position):
        return self._sample(position)[..., 0]

    def sample_transfer(self, uv):
        from .. import sampling

        return sampling.sample_texture2d(self.transfer, uv)

    def sample_color(self, position):
        return self.sample_transfer(self.sample_volume_rg(position))

    def sample_env(self, direction):
        from .. import sampling

        eh, ew = self.environment.shape[:2]
        if eh == 1 and ew == 1:
            return jnp.broadcast_to(self.environment[0, 0],
                                    direction.shape[:-1] + (4,))
        return sampling.sample_environment(self.environment, direction)

    def value_gradient(self, position, h):
        from .. import sampling

        return sampling.central_value_gradient(self.sample_color, position, h)

    def raw_gradient(self, position, voxel_size):
        from .. import sampling

        return sampling.central_raw_gradient(self.sample_value, position,
                                             voxel_size)


def sharded_render_frame(module, mesh: Mesh, scene: Scene, num_slabs: int,
                         state_example, data_axis: str = "data",
                         space_axis: str = "space"):
    """Build a jitted frame function over a halo-sharded volume.

    Returns ``(frame_fn, slabs)``: call
    ``frame_fn(state, slabs, seed, frame_number)`` with the state row-sharded
    over ``data`` and ``slabs`` sharded over ``space``; output keeps the
    state sharding.  ``module`` is any renderer module whose render_frame
    only touches the scene through the sampler interface."""
    volume_shape = scene.volume.shape
    slabs = shard_volume_with_halo(scene.volume, num_slabs)

    state_specs = jax.tree_util.tree_map(lambda _: P(), state_example)

    def body(state, slab_block, transfer, environment, mvp_inverse,
             model_view, projection, params, seed, frame_number):
        sidx = lax.axis_index(space_axis)
        hscene = HaloScene(
            slab_block[0], sidx, num_slabs, volume_shape, transfer,
            environment, mvp_inverse, model_view, projection,
            axis=space_axis)
        return module.render_frame(state, hscene, params, seed, frame_number)

    # manual only over `space`: each device's body sees the full pixel grid
    # (auto-partitioned over `data` by XLA) and its own volume slab — so the
    # renderers' iota-derived pixel coordinates stay global.
    mapped = shard_map(
        body, mesh=mesh, axis_names={space_axis},
        in_specs=(state_specs, P(space_axis, None, None, None, None),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=state_specs,
        check_vma=False,
    )

    @jax.jit
    def frame_fn(state, slabs, params, seed, frame_number):
        return mapped(state, slabs, scene.transfer, scene.environment,
                      scene.mvp_inverse, scene.model_view, scene.projection,
                      params, seed, frame_number)

    placed = jax.device_put(
        slabs, NamedSharding(mesh, P(space_axis, None, None, None, None)))
    return frame_fn, placed
