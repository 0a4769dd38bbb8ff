"""In-VMEM 1D transfer-function lookup via lane shuffles.

For single-channel volumes (the dominant case — the reference's RAW path is
R8), the 2D transfer-function lookup collapses to a 1D piecewise-linear
table at y = 0.  Mosaic supports per-lane shuffles within 128-wide rows
(``take_along_axis(axis=1)`` on same-shape (T, 128) operands), so the table
lives in vector registers as bank rows and the lookup costs zero HBM
gathers: for each tap, shuffle every 128-entry bank by the in-bank index
and select the right bank — then lerp.

This is the Pallas replacement for the TF half of the sampler gathers
(sampling.sample_texture2d_packed); it matches the XLA bilinear-at-y=0 path
exactly (same clamping, same lerp order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lookup(table_ref, idx, n_banks, width):
    """table_ref: (n_banks*4, 128) rows = [bank0_r, bank0_g, bank0_b,
    bank0_a, bank1_r, ...]; idx: (T, 128) int32 in [0, width);
    returns 4 channel arrays of shape (T, 128)."""
    bank = idx // LANES
    within = idx % LANES
    t = idx.shape[0]
    out = []
    for ch in range(4):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for b in range(n_banks):
            row = table_ref[b * 4 + ch, :]
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(row, (t, LANES)), within, axis=1)
            acc = jnp.where(bank == b, gathered, acc)
        out.append(acc)
    return out


def _kernel(n_banks, width, table_ref, values_ref, out_ref):
    v = values_ref[:]
    u = jnp.clip(v * width - 0.5, 0.0, width - 1.0)
    i0 = jnp.floor(u)
    f = u - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, width - 1)
    c0 = _lookup(table_ref, i0, n_banks, width)
    c1 = _lookup(table_ref, i1, n_banks, width)
    for ch in range(4):
        out_ref[ch, :, :] = c0[ch] * (1.0 - f) + c1[ch] * f


def pack_table(tf_texture):
    """(TH, TW, 4) TF texture → (n_banks*4, 128) register-resident banks of
    its y = 0 row (GL clamp: the row single-channel volumes sample)."""
    row = jnp.asarray(tf_texture[0], jnp.float32)        # (TW, 4)
    width = row.shape[0]
    if width % LANES != 0:
        pad = LANES - width % LANES
        row = jnp.concatenate(
            [row, jnp.broadcast_to(row[-1:], (pad, 4))], axis=0)
    n_banks = row.shape[0] // LANES
    banks = row.reshape(n_banks, LANES, 4).transpose(0, 2, 1)
    return banks.reshape(n_banks * 4, LANES), width


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def lookup_1d(table, values, width: int, interpret: bool = False):
    """Piecewise-linear TF lookup: values (H, W) in [0,1] → (H, W, 4).

    ``table``: output of :func:`pack_table` (first element).  The pixel
    count must be a multiple of 128 (Mosaic lane shuffles operate on
    128-wide rows)."""
    n_banks = table.shape[0] // 4
    h, w = values.shape
    if (h * w) % LANES != 0:
        raise ValueError("pixel count must be a multiple of 128")
    rows = values.reshape(h * w // LANES, LANES).astype(jnp.float32)
    n_rows = rows.shape[0]
    tile = min(512, n_rows)
    out = pl.pallas_call(
        functools.partial(_kernel, n_banks, width),
        out_shape=jax.ShapeDtypeStruct((4, n_rows, LANES), jnp.float32),
        grid=(pl.cdiv(n_rows, tile),),
        in_specs=[pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, tile, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(table, rows)
    return jnp.moveaxis(out, 0, -1).reshape(h, w, 4)
