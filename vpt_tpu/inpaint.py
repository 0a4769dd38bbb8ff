"""Occlusion-aware volume completion for inverse rendering.

The config-3 forensics (BENCH_NOTES.md "config-3 null space") measured
that after a multi-view fit all *optically visible* material recovers
28x while blob cores — 1.1% of voxels behind optical depth >> 1 from
every view — are a physical gradient null space: radiance measurements
do not constrain them, and the r4 prior-flow probe
(benchmarks/prior_flow_probe.py) measured that in-loop stiff smoothness
penalties cannot move them either (Adam's per-step motion is bounded by
the learning rate, and the biharmonic/tri-harmonic flows checkerboard
under per-voxel normalization).  This module completes the null space
*directly*: detect the unobserved set from the fitted volume itself,
then solve the prior's Euler-Lagrange equation on that set exactly
(conjugate gradients on the quadratic `mean(lap^2)` form) instead of
descending it.

Why biharmonic, and why log space: the minimizer of ∫(Δu)² with the
observed shell frozen is the quadratic continuation of the shell's value
AND slope (harmonic fill is bounded by the boundary max — it can never
rebuild a peak).  A Gaussian blob is exactly quadratic in log space, so
log-domain biharmonic completion reproduces a Gaussian core from its
visible skirt exactly; clipped-plateau cores are also penalty-free
(Δ log v = 0 there).

The reference (MOj0/vpt) has no inverse pipeline at all — this is a
vpt_tpu extension past parity (the transport being inverted is
MCMRenderer.glsl:129-166's).

Pieces (all jittable; python loops only over pyramid levels):
- ``optical_depth_min6`` / ``unobserved_mask``: cheap conservative proxy
  for multi-orbit-view visibility — cumulative optical depth along the
  six axis directions (pure cumsums, no gathers), min over directions.
  Orbit captures see the volume from all sides, so a voxel whose
  *best* axis direction already exceeds ``tau`` is treated as unseen.
- ``biharmonic_fill``: coarse-to-fine CG solve of Δ²u = 0 on the masked
  voxels with the rest frozen.
- ``complete_occluded``: mask + fill in one call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["optical_depth_min6", "unobserved_mask", "biharmonic_fill",
           "complete_occluded"]


def _density(volume):
    return volume[..., 0] if volume.ndim == 4 else volume


def optical_depth_min6(volume, extinction: float):
    """Min over the six axis directions of the accumulated optical depth
    from the volume boundary to each voxel (exclusive of the voxel).

    The volume spans the unit cube, so the per-step length is 1/n per
    axis.  Exact for axis-aligned rays; a conservative proxy for the
    best orbit view (any real view's depth >= the best direction's up to
    path-length factors, stated assumption of the detector)."""
    rho = _density(volume)
    od = None
    for axis in range(3):
        h = extinction / rho.shape[axis]
        cs = jnp.cumsum(rho, axis=axis) * h
        fwd = cs - rho * h          # exclusive prefix: depth *to* the voxel
        rev = cs[_last_slice(rho, axis)] - cs  # exclusive suffix
        for d in (fwd, rev):
            od = d if od is None else jnp.minimum(od, d)
    return od


def _last_slice(x, axis):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None)
    return tuple(idx)


def unobserved_mask(volume, extinction: float, tau: float = 3.0):
    """Voxels whose best axis-aligned view exceeds optical depth ``tau``
    (transmittance < e^-tau): the data null space to complete."""
    return optical_depth_min6(volume, extinction) > tau


def _lap(u):
    return sum(jnp.roll(u, -1, a) + jnp.roll(u, 1, a) - 2.0 * u
               for a in range(3))


def _cg_fill(u0, mask, iters: int):
    """CG on J(x) = sum(lap(u)^2), u = where(mask, x, u0) — quadratic and
    SPD on the mask subspace, so CG converges where gradient descent on
    the same penalty measurably stalls (prior_flow_probe).  Fixed
    iteration count (no data-dependent control flow under jit)."""
    mask = mask.astype(u0.dtype)

    def matvec(x):
        return mask * _lap(_lap(x * mask))

    b = -mask * _lap(_lap(u0 * (1.0 - mask)))
    x = u0 * mask
    r = b - matvec(x)
    p = r

    def body(_, carry):
        x, r, p, rs = carry
        ap = matvec(p)
        denom = jnp.vdot(p, ap)
        alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        return x, r, r + beta * p, rs_new

    x, _, _, _ = lax.fori_loop(
        0, iters, body, (x, r, p, jnp.vdot(r, r)))
    return u0 * (1.0 - mask) + x * mask


@functools.partial(jax.jit, static_argnames=("iters",))
def _level_fill(u, mask, iters):
    return _cg_fill(u, mask, iters)


def biharmonic_fill(volume, mask, log_space: bool = True,
                    floor: float = 0.01, coarsest: int = 32,
                    cg_iters: int = 200, clip: bool = True):
    """Fill ``mask`` voxels with the biharmonic (Δ²u = 0) continuation of
    the unmasked data, coarse-to-fine from ``coarsest`` with CG at every
    level (coarse levels propagate across whole cores in a few cheap
    iterations; the fine level polishes near the boundary).

    ``log_space`` solves on log(max(v, floor)) — exact for Gaussian
    cores (quadratic in log) — then exponentiates the filled region."""
    v = _density(volume)
    u = jnp.log(jnp.maximum(v, floor)) if log_space else v
    n = v.shape[0]
    levels = []
    lv = min(coarsest, n)
    while lv < n:
        levels.append(lv)
        lv *= 2
    levels.append(n)

    filled = None
    for lv in levels:
        ul = u if lv == n else jax.image.resize(u, (lv,) * 3, "trilinear")
        ml = mask if lv == n else (
            jax.image.resize(mask.astype(jnp.float32), (lv,) * 3,
                             "trilinear") > 0.5)
        if filled is not None:
            up = jax.image.resize(filled, (lv,) * 3, "trilinear")
            ul = jnp.where(ml, up, ul)  # carry the coarse fill down
        filled = _level_fill(ul, ml, cg_iters)
    out = jnp.where(mask, jnp.exp(filled) if log_space else filled, v)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out[..., None] if volume.ndim == 4 else out


def complete_occluded(volume, extinction: float, tau: float = 3.0,
                      **fill_kwargs):
    """Detect the unobserved set of ``volume`` at ``extinction`` and fill
    it with the log-domain biharmonic continuation of the observed
    material.  Returns ``(completed_volume, mask)``."""
    mask = unobserved_mask(volume, extinction, tau)
    return biharmonic_fill(volume, mask, **fill_kwargs), mask
