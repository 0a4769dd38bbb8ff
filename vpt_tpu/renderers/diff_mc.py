"""Differentiable Monte-Carlo estimators for the MCS/MCM renderers.

The forward MC kernels sample *discrete* events (collide/absorb/scatter/
null), which have no pathwise derivative.  This module re-runs the exact
same event chains (same RNG streams, same branch outcomes) but multiplies
each path's contribution by ratio weights

    w_k(θ) = p_k(θ) / stop_grad(p_k(θ))

for every discrete decision k with probability ``p_k`` that depends on the
scene parameters θ (voxel densities / transfer function).  Each ``w_k``
equals 1 in value — the rendered image is bit-comparable to the analog
estimator — but its derivative contributes the score-function (likelihood-
ratio) term, so

    ∇_θ E[C] = E[∇_θ (C · Π_k w_k)]

is an unbiased gradient of the *expected* radiance: the pathwise part flows
through the continuous factors (transmittance tints, TF colors) and the
score part through the weights.  This is the standard detached-decision
estimator for delta tracking (cf. weighted delta-tracking literature and the
reference's analog null-collision loop, MCMRenderer.glsl:129-166).

Variance note: score-function terms are noisy; ``score_floor`` drops the
score contribution of low-probability decisions (the 1/p variance tail) —
see _ratio.  Gradient validation is split (tests/test_gradient_oracles.py):
the pathwise part against common-random-numbers finite differences at
FD-truncation tolerance, the score part against an exact closed-form
enumeration oracle; the statistical mean-gradient tests (test_diff_mc.py,
SURVEY.md §4.3) cover the combined estimator end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import rng, sampling
from .base import Scene
from .mcm import Params as MCMParams
from .mcs import Params as MCSParams

sg = lax.stop_gradient


def _ratio(p, eps=1e-8, floor=None):
    """p / stop_grad(p): value 1, gradient d log p.

    ``floor``: drop the score contribution of decisions with probability
    below the floor (``max(p, floor)`` — value still exactly 1, gradient
    magnitude bounded by |p'|/floor).  Low-probability decisions carry the
    large 1/p score factors that dominate estimator variance, so this is
    the standard value-preserving variance control for likelihood-ratio
    gradients.  ``floor >= 1`` drops every score term, isolating the
    pathwise gradient (used by the CRN finite-difference oracle,
    tests/test_gradient_oracles.py).

    Note a value-level clip of the accumulated log-weight CANNOT implement
    this: Σ log(p/sg(p)) is identically zero in value, so clipping it to
    ±c is a gradient no-op for c > 0 and only freezes c == 0 through
    JAX's tie-gradient convention at the clip boundary (measured: it
    leaked a fraction of the score into the "frozen" gradient)."""
    if floor is not None and floor >= 1.0:
        return jnp.ones_like(p)
    p = jnp.maximum(p, eps if floor is None else max(eps, floor))
    return p / sg(p)


def mcm_render_frame(state, scene: Scene, params: MCMParams, seed,
                     frame_number, score_floor: float | None = None):
    """Differentiable twin of mcm.render_frame: identical event chain and
    RNG stream, with per-path ratio weights folded into the deposits.

    The extra per-pixel carry ``logw`` accumulates Σ log w_k along the
    current path and resets with the photon.

    ``score_floor``: drop the score term of decisions with probability
    below the floor (see _ratio) — biased but variance-bounded gradients
    for long multiple-scattering paths; ``>= 1`` freezes the score part
    entirely (pathwise-only gradients).  None = unbiased.  Values are
    unaffected in every mode (w == 1 in value)."""
    height, width = state["position"].shape[:2]
    ndc = sampling.pixel_ndc(height, width)
    mapped = ndc * 0.5 + 0.5
    inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)
    rstate = rng.seed_pixels(mapped, jnp.asarray(seed, jnp.float32))

    from .mcm import _photon_reset

    logw0 = state.get("logw", jnp.zeros((height, width), jnp.float32))
    # "cheb" (a tracking-scene reset's skip carry) is not part of the
    # differentiable machine — see mcm_reset
    ph0 = {k: v for k, v in state.items() if k not in ("logw", "cheb")}

    def event(_, carry):
        ph, logw, rstate = carry
        rstate, dist = rng.exponential(rstate, sg(params.extinction))
        position = ph["position"] + dist[..., None] * ph["direction"]

        vs = scene.sample_color(position)
        alpha = vs[..., 3]
        p_null = 1.0 - alpha
        capped = ph["bounces"] >= params.max_bounces
        p_scatter = jnp.where(capped, 0.0,
                              alpha * sampling.max3(vs[..., :3]))
        p_absorb = 1.0 - p_null - p_scatter

        rstate, fortune = rng.uniform(rstate)
        oob = jnp.any((position > 1.0) | (position < 0.0), axis=-1)
        absorb = (~oob) & (fortune < sg(p_absorb))
        scatter = (~oob) & (~absorb) & (fortune < sg(p_absorb + p_scatter))
        deposit = oob | absorb

        # ratio weight of this event's discrete decision
        p_taken = jnp.where(absorb, p_absorb,
                            jnp.where(scatter, p_scatter,
                                      jnp.where(oob, 1.0, p_null)))
        logw_ev = jnp.log(_ratio(p_taken, floor=score_floor))
        logw = logw + jnp.where(oob, 0.0, logw_ev)

        env = scene.sample_env(ph["direction"])
        # path weight: exp(logw) == 1 in value, carries the score gradient
        w = jnp.exp(logw)
        r_new = jnp.where(oob[..., None],
                          ph["transmittance"] * env[..., :3]
                          * w[..., None], 0.0)
        # absorption deposits 0 — its weight contributes no gradient either
        samples = jnp.where(deposit, ph["samples"] + 1.0, ph["samples"])
        radiance = jnp.where(
            deposit[..., None],
            ph["radiance"] + (r_new - ph["radiance"])
            / jnp.maximum(samples, 1.0)[..., None],
            ph["radiance"])

        rs_reset, pos_reset, dir_reset = _photon_reset(
            rstate, ndc, scene, params, inv_res)
        rs_scat, dir_scat = sampling.henyey_greenstein(
            rstate, sg(params.anisotropy), sg(ph["direction"]))

        dmask = deposit[..., None]
        smask = scatter[..., None]
        # the scatter tint vs.rgb is the pathwise factor (as in the analog
        # estimator); its sampling probability α·max3 is covered by logw
        new_ph = {
            "position": jnp.where(dmask, pos_reset, sg(position)),
            "direction": jnp.where(dmask, dir_reset,
                                   jnp.where(smask, dir_scat,
                                             ph["direction"])),
            "bounces": jnp.where(deposit, 0.0,
                                 jnp.where(scatter, ph["bounces"] + 1.0,
                                           ph["bounces"])),
            "transmittance": jnp.where(
                dmask, 1.0,
                jnp.where(smask, ph["transmittance"] * vs[..., :3],
                          ph["transmittance"])),
            "radiance": radiance,
            "samples": samples,
        }
        logw = jnp.where(deposit, 0.0, logw)
        new_rstate = jnp.where(deposit, rs_reset,
                               jnp.where(scatter, rs_scat, rstate))
        return new_ph, logw, new_rstate

    ph, logw, _ = lax.fori_loop(0, params.steps, event,
                                (ph0, logw0, rstate))
    return dict(ph, logw=logw)


def mcm_reset(params: MCMParams, height: int, width: int, scene: Scene,
              seed=0.0):
    from . import mcm

    state = mcm.reset(params, height, width, scene, seed=seed)
    # the differentiable machine always runs the exact global-majorant
    # event chain over the clean (differentiable) tables — drop the
    # cheb-skip carry a tracking scene's reset would add
    state.pop("cheb", None)
    state["logw"] = jnp.zeros((height, width), jnp.float32)
    return state


def mcm_expected_image(scene: Scene, params: MCMParams, height: int,
                       width: int, frames: int, seed0: float = 0.0,
                       score_floor: float | None = None):
    """Mean radiance over ``frames`` progressive frames, differentiable
    w.r.t. scene.volume / scene.transfer.  Seeds derive from the frame
    index so the estimate is deterministic.

    Deliberately NOT jax.checkpoint'ed: rematerializing the frames
    recompiles the event chain in a different fusion context, where
    borderline float comparisons can flip discrete MC branches — the
    recomputed backward would then walk a *different* path tree than the
    primal (measured: scan- vs unrolled-compiled frames differ in ~0.3%
    of branch outcomes on CPU).  Residual storage keeps value and
    gradient on the same sampled paths."""
    state = mcm_reset(params, height, width, scene, seed=seed0)

    def frame(i, st):
        seed = rng.pcg(jnp.uint32(i) + rng.float_bits_to_uint(
            jnp.float32(seed0))).astype(jnp.float32) / jnp.float32(2 ** 32)
        return mcm_render_frame(st, scene, params, seed, i + 1,
                                score_floor=score_floor)

    state = lax.fori_loop(0, frames, frame, state)
    return state["radiance"]


# ---------------------------------------------------------------------------
# MCS
# ---------------------------------------------------------------------------

def mcs_generate(scene: Scene, params: MCSParams, seed, height: int,
                 width: int, track_steps: int = 128,
                 score_floor: float | None = None):
    """Differentiable twin of mcs.generate: same tracking loops with ratio
    weights on the collision decisions; the collision-product transmittance
    (1 − α) factors are already pathwise-differentiable.

    ``score_floor``: same score variance control as mcm_render_frame's
    (see _ratio; ``>= 1`` freezes the score term entirely, isolating the
    pathwise gradient; rendered values are unaffected in every mode).

    Reverse-mode AD cannot traverse unbounded while loops, so the tracking
    loops run as masked scans with a static ``track_steps`` budget — exact
    as long as every path terminates within the budget (expected events per
    path ≈ extinction · path length; the geometric tail makes overflow
    probability negligible for budgets a few × that)."""
    ndc = sampling.pixel_ndc(height, width)
    mapped = ndc * 0.5 + 0.5
    ray_from, ray_to = sampling.unproject(ndc, scene.mvp_inverse)
    direction = ray_to - ray_from
    dir_unit = direction / jnp.sqrt(
        jnp.maximum(jnp.sum(direction ** 2, axis=-1, keepdims=True), 1e-20))
    tb = jnp.maximum(sampling.intersect_cube(ray_from, direction), 0.0)
    miss = tb[..., 0] >= tb[..., 1]

    start = ray_from + tb[..., 0:1] * direction
    end = ray_from + tb[..., 1:2] * direction
    max_distance = jnp.maximum(
        jnp.sqrt(jnp.sum((end - start) ** 2, axis=-1)), 1e-20)

    def alpha_at(pos):
        return scene.sample_color(pos)[..., 3]

    def sample_distance(state):
        def body(c, _):
            st, dist, done, logw = c
            s1, d = rng.exponential(st, sg(params.extinction))
            ndist = dist + d
            over = ndist > max_distance
            pos = start + (ndist / max_distance)[..., None] * (end - start)
            a = alpha_at(pos)
            s2, u = rng.uniform(s1)
            collide = (~over) & (u < sg(a))
            # decision weight: collide with prob a, continue with 1-a
            p_taken = jnp.where(collide, a, 1.0 - a)
            step_logw = jnp.log(_ratio(p_taken, floor=score_floor))
            active = ~done
            logw = logw + jnp.where(active & (~over), step_logw, 0.0)
            st_next = jnp.where(done, st, jnp.where(over, s1, s2))
            dist_next = jnp.where(done, dist, ndist)
            return (st_next, dist_next, done | over | collide, logw), None

        done0 = jnp.zeros(state.shape, bool)
        z = jnp.zeros(state.shape, jnp.float32)
        (st, dist, _, logw), _ = lax.scan(
            body, (state, z, done0, z), None, length=track_steps)
        return st, dist, logw

    def sample_transmittance(state, seg_from, seg_to, max_dist):
        def body(c, _):
            st, dist, trans, done = c
            s1, d = rng.exponential(st, sg(params.extinction))
            ndist = dist + d
            over = ndist > max_dist
            pos = seg_from + (ndist / max_dist)[..., None] \
                * (seg_to - seg_from)
            active = (~done) & (~over)
            st_next = jnp.where(done, st, s1)
            dist_next = jnp.where(done, dist, ndist)
            trans_next = jnp.where(active,
                                   trans * (1.0 - alpha_at(pos)), trans)
            return (st_next, dist_next, trans_next, done | over), None

        done0 = jnp.zeros(state.shape, bool)
        z = jnp.zeros(state.shape, jnp.float32)
        (st, _, trans, _), _ = lax.scan(
            body, (state, z, jnp.ones_like(z), done0), None,
            length=track_steps)
        return st, trans

    dir_state = rng.pcg(rng.float_bits_to_uint(seed) ^ jnp.uint32(0x9E3779B9))
    _, scatter_dir = rng.sphere(dir_state)

    state = rng.seed_pixels(mapped, jnp.asarray(seed, jnp.float32))
    state, dist, logw = sample_distance(state)
    escaped = dist > max_distance

    t = (sg(dist) / max_distance)[..., None]
    spoint = start + t * (end - start)
    tb2 = jnp.maximum(sampling.intersect_cube(spoint, scatter_dir), 0.0)
    sto = spoint + scatter_dir * tb2[..., 1:2]
    sdist = jnp.maximum(jnp.sqrt(jnp.sum((sto - spoint) ** 2, axis=-1)),
                        1e-20)

    diffuse = scene.sample_color(spoint)
    light = scene.sample_env(scatter_dir)
    state, trans = sample_transmittance(state, spoint, sto, sdist)

    w = jnp.exp(logw)[..., None]
    scatter_color = diffuse * light * trans[..., None] * w
    env_color = scene.sample_env(dir_unit) \
        * jnp.exp(logw)[..., None]  # escape weight: continue decisions
    color = jnp.where((miss | escaped)[..., None], env_color, scatter_color)
    return color


def mcs_expected_image(scene: Scene, params: MCSParams, height: int,
                       width: int, frames: int, seed0: float = 0.0,
                       track_steps: int = 128,
                       score_floor: float | None = None):
    def frame(i, acc):
        seed = rng.pcg(jnp.uint32(i) + rng.float_bits_to_uint(
            jnp.float32(seed0))).astype(jnp.float32) / jnp.float32(2 ** 32)
        color = mcs_generate(scene, params, seed, height, width,
                             track_steps=track_steps,
                             score_floor=score_floor)
        return acc + (color - acc) / (i + 1).astype(jnp.float32)

    acc0 = jnp.zeros((height, width, 4), jnp.float32)
    return lax.fori_loop(0, frames, frame, acc0)
