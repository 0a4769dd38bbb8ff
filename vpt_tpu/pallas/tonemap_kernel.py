"""Fused tone-mapping Pallas kernel.

The display stage (tone curve + gamma + alpha fill — the reference's
tone-mapper fragment shaders) as one VMEM pass.  The (H, W, 4) HDR image is
viewed as a 2D (H, W·4) array so channel values land on vector lanes with
no padding waste; the curve is applied per lane (all supported curves are
per-channel elementwise) and alpha lanes are forced to 1 with an iota mask.
Curve numerics come from :data:`vpt_tpu.tonemap.RAW_CURVES`, so results
equal the XLA path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tonemap as tm


def _kernel(curve_fn, hdr_ref, params_ref, out_ref):
    exposure = params_ref[0, 0]
    inv_gamma = params_ref[0, 1]
    x = hdr_ref[:]
    y = jnp.power(jnp.maximum(curve_fn(x * exposure), 0.0), inv_gamma)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out_ref[:] = jnp.where(lane % 4 == 3, 1.0, y)


@functools.partial(jax.jit,
                   static_argnames=("name", "tile_rows", "interpret"))
def tonemap(image, name: str = "reinhard", exposure=1.0, gamma=2.2,
            tile_rows: int = 128, interpret: bool = False):
    """Apply tone mapper ``name`` to an (H, W, 4) HDR image via Pallas."""
    if name not in tm.RAW_CURVES:
        raise ValueError(
            f"pallas tonemap supports {sorted(tm.RAW_CURVES)}, not {name!r}")
    h, w, c = image.shape
    assert c == 4, "pallas tonemap expects RGBA input"
    flat = image.reshape(h, w * 4).astype(jnp.float32)
    params = jnp.array([[exposure, 1.0 / gamma]], jnp.float32)
    tile = min(tile_rows, h)
    out = pl.pallas_call(
        functools.partial(_kernel, tm.RAW_CURVES[name]),
        out_shape=jax.ShapeDtypeStruct((h, w * 4), jnp.float32),
        grid=(pl.cdiv(h, tile),),
        in_specs=[
            pl.BlockSpec((tile, w * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, w * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, params)
    return out.reshape(h, w, 4)
