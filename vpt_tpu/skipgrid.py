"""Super-voxel majorant grid: local-majorant null-collision tracking.

A TPU-native acceleration with no reference counterpart: the reference's
MCM kernel (src/glsl/renderers/MCMRenderer.glsl:129-166) tracks against a
single *global* majorant (uExtinction, with TF alpha as the local ratio),
so photons crossing nearly-empty space burn one null-collision event per
global mean free path.  This module builds a coarse N³ grid over the
normalized [0,1]³ volume storing, per cell:

- ``maxalpha``: a conservative upper bound of the transfer-function alpha
  anywhere in the cell's *trilinear support* (voxels dilated by one) — the
  TF alpha is maximized over every texel the bilinear lookup can touch for
  any interpolated value in the cell's [vmin, vmax] range, which bounds
  non-monotone TFs correctly (interpolated volume values are convex
  combinations of corner values; piecewise-linear alpha over an interval
  is bounded by the covering texels' max).
- ``chebdist``: the Chebyshev distance (in cells) to the nearest cell with
  maxalpha > 0 (0 for such cells themselves), enabling multi-cell hops
  through exactly-empty space.

The tracking loop (renderers/mcm.py with ``make_scene(majorant_grid=N)``)
samples free paths against mu_cell = extinction·maxalpha instead of the
global extinction, hopping cell boundaries by DDA when the tentative
collision falls outside the current cell (valid by memorylessness of the
exponential), and classifies collisions with the ratio alpha/maxalpha in
place of the reference's alpha.  Distributionally this is the same
null-collision estimator — it only removes collisions that were certain
to be null — but it consumes a different per-pixel RNG stream than the
GLSL-exact machine, so it is an opt-in performance mode validated
statistically (tests/test_skipgrid.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Cell-indexing nudge along the ray (normalized units).  Positions landing
# exactly on a cell face index the *next* cell; collisions in the 1e-5
# sliver behind a face may rate against the neighbor's majorant, which the
# ratio clip in the tracking loop bounds conservatively.
EPS_NUDGE = 1e-5


def build_majorant_grid(volume, transfer, n_cells: int):
    """(D, H, W, C) volume + (TH, TW, 4) transfer → (N, N, N, 2) float32
    [maxalpha, chebdist] grid, or None when unsupported.

    Single-channel volumes only (the TF is then sampled at uv = (value, 0),
    texel row 0 — MCMRenderer.glsl:85-89); cell windows must tile the voxel
    grid exactly (dims divisible by n_cells)."""
    d, h, w, c = volume.shape
    if c != 1:
        return None
    if d % n_cells or h % n_cells or w % n_cells:
        return None
    bz, by, bx = d // n_cells, h // n_cells, w // n_cells
    v = volume[..., 0]

    def pooled(op, init):
        return lax.reduce_window(
            v, init, op,
            window_dimensions=(bz + 2, by + 2, bx + 2),
            window_strides=(bz, by, bx),
            padding=((1, 1), (1, 1), (1, 1)))

    vmin = pooled(lax.min, jnp.float32(jnp.inf))
    vmax = pooled(lax.max, jnp.float32(-jnp.inf))

    # TF texels a bilinear lookup at uv=(value, 0) can touch for any value
    # in [vmin, vmax]: u = value·TW − 0.5, corners floor(u) and floor(u)+1.
    tw = transfer.shape[1]
    alpha_row = transfer[0, :, 3]                        # (TW,)
    lo = jnp.clip(jnp.floor(vmin * tw - 0.5), 0, tw - 1)
    hi = jnp.clip(jnp.floor(vmax * tw - 0.5) + 1.0, 0, tw - 1)
    t = jax.lax.broadcasted_iota(jnp.float32, (n_cells ** 3, tw), 1)
    in_range = (t >= lo.reshape(-1, 1)) & (t <= hi.reshape(-1, 1))
    maxalpha = jnp.max(jnp.where(in_range, alpha_row, 0.0), axis=1)
    maxalpha = maxalpha.reshape(n_cells, n_cells, n_cells)
    occupied = maxalpha > 0.0

    # Chebyshev distance transform by iterated 3³ dilation.
    dist = jnp.where(occupied, 0.0, float(n_cells))
    reach = occupied
    for k in range(1, n_cells):
        reach = lax.reduce_window(
            reach, False, lax.bitwise_or,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)))
        dist = jnp.minimum(dist, jnp.where(reach, float(k),
                                           float(n_cells)))
    return jnp.stack([maxalpha, dist.astype(jnp.float32)], axis=-1)


def flight_step(grid, position, direction):
    """Per-photon local-majorant flight geometry.

    Returns (maxalpha, t_bound): the current cell's conservative alpha
    majorant and the distance along ``direction`` at which the photon
    leaves the cell's majorant validity (the DDA boundary crossing,
    extended to a (chebdist−1)-cell hop through exactly-empty space).
    One coarse gather; everything else is VPU math."""
    n = grid.shape[0]
    p_idx = position + EPS_NUDGE * direction
    cell = jnp.clip(jnp.floor(p_idx * n).astype(jnp.int32), 0, n - 1)
    flat = (cell[..., 2] * n + cell[..., 1]) * n + cell[..., 0]
    rows = jnp.take(grid.reshape(-1, 2), flat, axis=0)
    maxalpha, cheb = rows[..., 0], rows[..., 1]

    # DDA: distance to the cell face in the direction of travel, per axis.
    step_pos = direction > 0.0
    boundary = (cell.astype(jnp.float32) + step_pos) / n
    t_axis = jnp.where(direction != 0.0,
                       (boundary - position) / direction, jnp.inf)
    t_bound = jnp.min(t_axis, axis=-1)
    # exactly-empty regions: any point within (chebdist−1) cells (L∞ hence
    # L2) of this cell has alpha ≡ 0, so the hop may extend that far.
    hop_far = jnp.maximum(cheb - 1.0, 0.0) / n
    t_bound = jnp.where((maxalpha == 0.0) & (cheb >= 2.0),
                        jnp.maximum(t_bound, hop_far), t_bound)
    return maxalpha, jnp.maximum(t_bound, 0.0)
