"""Sequential GLSL-emulation oracles for the march renderers.

Per-pixel scalar numpy emulations of the reference fragment shaders —
EAMRenderer.glsl:52-80, MIPRenderer.glsl:51-72, ISORenderer.glsl:52-76,
DepthRenderer.glsl:53-79 — executed exactly as a fragment invocation would
run (sequential march, scalar accumulators, same RNG offset chain), checked
against the vectorized TPU machines at ≤1e-4.  Extends the MCM oracle
(test_renderers.py::test_mcm_matches_sequential_emulation) to the rest of
the family (VERDICT r1 "Next round" #6).

One deliberate deviation mirrored here: the GLSL loops accumulate
``t += uStepSize`` while the TPU machines evaluate the equivalent schedule
``t0 + k·step`` (value-equal in exact arithmetic; the schedule form avoids
carried float error), so the emulation uses the schedule form too.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu import sampling, transfer, volume
from vpt_tpu.renderers import make_scene


def _py_pcg(x):
    x &= 0xFFFFFFFF
    x = (x * 747796405 + 2891336453) & 0xFFFFFFFF
    x = (((x >> ((x >> 28) + 4)) ^ x) * 277803737) & 0xFFFFFFFF
    return ((x >> 22) ^ x) & 0xFFFFFFFF


def _frame_offset(seed):
    """offset = uniform(pcg(bits(seed))) — the per-frame scalar jitter the
    renderers derive from the seed (uOffset = Math.random() in the JS)."""
    state = _py_pcg(int(np.float32(seed).view(np.uint32)))
    state = _py_pcg(state)
    return np.float32(state) / np.float32(4294967295.0)


N = 9
PIXELS = [(4, 4), (0, 0), (2, 6), (6, 3)]


@pytest.fixture(scope="module")
def sc():
    return make_scene(volume.sphere_volume(16),
                      transfer.gray_ramp(alpha_scale=0.9))


class Rays:
    """Scalar ray setup shared by every fragment shader (unproject +
    intersectCube, mixins/unproject.glsl:3-11, intersectCube.glsl:3-12)."""

    def __init__(self, sc, n=N):
        self.ndc = np.asarray(sampling.pixel_ndc(n, n))
        self.mvp_inv = np.asarray(sc.mvp_inverse)
        self.sc = sc

    def pixel(self, i, j):
        x, y = self.ndc[i, j]
        nearh = self.mvp_inv @ np.array([x, y, -1, 1], np.float32)
        farh = self.mvp_inv @ np.array([x, y, 1, 1], np.float32)
        rf = (nearh[:3] / nearh[3]).astype(np.float32)
        rt = (farh[:3] / farh[3]).astype(np.float32)
        d = rt - rf
        with np.errstate(divide="ignore", invalid="ignore"):
            tmin = (0 - rf) / d
            tmax = (1 - rf) / d
        t1 = np.minimum(tmin, tmax)
        t2 = np.maximum(tmin, tmax)
        tn = max(float(t1.max()), 0.0)
        tf_ = max(float(t2.min()), 0.0)
        start = (rf + np.float32(tn) * d).astype(np.float32)
        end = (rf + np.float32(tf_) * d).astype(np.float32)
        return start, end, np.float32(tn), np.float32(tf_), tn >= tf_

    def sample(self, pos):
        return np.asarray(self.sc.sample_color(
            jnp.asarray(pos, jnp.float32)[None]))[0]


def test_eam_matches_sequential_emulation(sc):
    from vpt_tpu.renderers import eam

    params = eam.Params(extinction=60.0, slices=16, random=True)
    seed = np.float32(0.42)
    frame = np.asarray(eam.generate(sc, params, jnp.float32(seed), N, N))

    rays = Rays(sc)
    offset = _frame_offset(seed)
    step = np.float32(1.0 / 16)
    for (i, j) in PIXELS:
        start, end, _, _, miss = rays.pixel(i, j)
        if miss:
            expect = np.array([0, 0, 0, 1], np.float32)
        else:
            rsl = np.float32(np.linalg.norm(end - start)) * step
            acc = np.zeros(4, np.float32)
            t0 = step * offset
            for k in range(16):
                t = np.float32(t0 + np.float32(k) * step)
                if not (t < 1.0 and acc[3] < 0.99):
                    continue
                c = rays.sample(start + t * (end - start))
                a = np.float32(c[3] * rsl * np.float32(60.0))
                acc[:3] += (1 - acc[3]) * c[:3] * a
                acc[3] += (1 - acc[3]) * a
            rgb = acc[:3] / acc[3] if acc[3] > 1.0 else acc[:3]
            expect = np.array([rgb[0], rgb[1], rgb[2], 1], np.float32)
        assert np.allclose(frame[i, j], expect, atol=1e-4), (i, j)


def test_mip_matches_sequential_emulation(sc):
    from vpt_tpu.renderers import mip

    params = mip.Params(steps=16)
    seed = np.float32(0.13)
    frame = np.asarray(mip.generate(sc, params, jnp.float32(seed), N, N))

    rays = Rays(sc)
    offset = _frame_offset(seed)
    step = np.float32(1.0 / 16)
    for (i, j) in PIXELS:
        start, end, _, _, miss = rays.pixel(i, j)
        if miss:
            expect = np.float32(0.0)
        else:
            val = np.float32(0.0)
            for k in range(16):
                t = np.float32(np.mod(offset + np.float32(k) * step, 1.0))
                c = rays.sample(start + t * (end - start))
                val = max(val, c[3])
        assert np.allclose(frame[i, j], expect if miss else val,
                           atol=1e-4), (i, j)


def test_iso_matches_sequential_emulation(sc):
    from vpt_tpu.renderers import iso

    params = iso.Params(isovalue=0.5, steps=16)
    seed = np.float32(0.77)
    frame = np.asarray(iso.generate(sc, params, jnp.float32(seed), N, N))

    rays = Rays(sc)
    offset = _frame_offset(seed)
    step = np.float32(1.0 / 16)
    for (i, j) in PIXELS:
        start, end, _, _, miss = rays.pixel(i, j)
        closest = np.full(4, -1.0, np.float32)
        if not miss:
            for k in range(16):
                t = np.float32(1.0 - offset * step - np.float32(k) * step)
                pos = start + t * (end - start)
                if rays.sample(pos)[3] >= 0.5:
                    closest = np.array([pos[0], pos[1], pos[2], t],
                                       np.float32)
        assert np.allclose(frame[i, j], closest, atol=1e-4), (i, j)


def test_depth_matches_sequential_emulation(sc):
    from vpt_tpu.renderers import depth

    params = depth.Params(extinction=120.0, slices=16, threshold=0.1,
                          random=False)
    frame = np.asarray(depth.generate(sc, params, jnp.float32(0.0), N, N))

    rays = Rays(sc)
    step = np.float32(1.0 / 16)
    for (i, j) in PIXELS:
        start, end, tn, tf_, miss = rays.pixel(i, j)
        if miss:
            expect = np.float32(-1.0)
        else:
            t, acc = np.float32(0.0), np.float32(0.0)
            while t < 1.0 and acc < 0.1:
                c = rays.sample(start + t * (end - start))
                acc += (1 - acc) * c[3] * np.float32(
                    np.linalg.norm(end - start)) * step * np.float32(120.0)
                t = np.float32(t + step)
            expect = np.float32(tn + t * (tf_ - tn)) if acc >= 0.1 \
                else np.float32(-1.0)
        assert np.allclose(frame[i, j], expect, atol=1e-4), (i, j)


# ---------------------------------------------------------------------------
# MCS — delta-tracking single scattering (MCSRenderer.glsl:59-105)
# ---------------------------------------------------------------------------

def _py_uniform(state):
    state = _py_pcg(state)
    return state, np.float32(state) / np.float32(4294967295.0)


def _py_exponential(state, rate):
    state, u = _py_uniform(state)
    u = max(u, np.float32(1e-38))
    return state, np.float32(-np.log(u) / np.float32(rate))


_TWOPI = np.float32(6.28318530718)


def test_mcs_matches_sequential_emulation(sc):
    """The while_loop delta-tracking machine must reproduce a per-pixel
    sequential GLSL execution: sampleDistance consumes 2 draws per
    continuing iteration and 1 in its escaping iteration
    (MCSRenderer.glsl:70-87); sampleTransmittance consumes exactly 1 per
    iteration (:89-105)."""
    from vpt_tpu.renderers import mcs

    ext = np.float32(40.0)
    params = mcs.Params(extinction=float(ext))
    seed = np.float32(0.29)
    frame = np.asarray(mcs.generate(sc, params, jnp.float32(seed), N, N))

    # per-frame scattering direction: sphere(pcg(bits(seed) ^ golden))
    dstate = _py_pcg((int(seed.view(np.uint32)) ^ 0x9E3779B9) & 0xFFFFFFFF)
    dstate, r = _py_uniform(dstate)
    dstate, a = _py_uniform(dstate)
    disk = np.float32(np.sqrt(r)) * np.array(
        [np.cos(_TWOPI * a), np.sin(_TWOPI * a)], np.float32)
    norm = np.float32(disk @ disk)
    sdir = np.array([2 * np.sqrt(max(1 - norm, np.float32(0))) * disk[0],
                     2 * np.sqrt(max(1 - norm, np.float32(0))) * disk[1],
                     1 - 2 * norm], np.float32)

    rays = Rays(sc)
    ndc = rays.ndc
    env = np.array([1, 1, 1, 1], np.float32)   # default 1x1 white env

    # (0,0) misses; the rest traverse the sphere (collide/escape/shadow)
    for (i, j) in [(0, 0), (3, 3), (3, 4), (4, 4), (5, 5), (4, 5)]:
        start, end, tn, tf_, miss = rays.pixel(i, j)
        if miss:
            expect = env
        else:
            maxd = np.float32(np.linalg.norm(end - start))
            px = (ndc[i, j] * np.float32(0.5) + np.float32(0.5)).astype(
                np.float32)
            state = _py_pcg((19 * int(px[0].view(np.uint32))
                             + 47 * int(px[1].view(np.uint32))
                             + 101 * int(seed.view(np.uint32)) + 131)
                            & 0xFFFFFFFF)
            # sampleDistance
            dist = np.float32(0.0)
            while True:
                state, d = _py_exponential(state, ext)
                dist = np.float32(dist + d)
                if dist > max(maxd, np.float32(1e-20)):
                    break
                pos = (start + (dist / maxd) * (end - start)).astype(
                    np.float32)
                state, u = _py_uniform(state)
                if u < rays.sample(pos)[3]:
                    break
            if dist > maxd:
                expect = env                    # escaped
            else:
                t = np.float32(dist / maxd)
                spoint = (start + t * (end - start)).astype(np.float32)
                with np.errstate(divide="ignore", invalid="ignore"):
                    tmin = (0 - spoint) / sdir
                    tmax = (1 - spoint) / sdir
                t2 = np.maximum(np.minimum(tmin, tmax), 0)  # unused floor
                tfar = max(float(np.maximum(tmin, tmax).min()), 0.0)
                sto = (spoint + sdir * np.float32(tfar)).astype(np.float32)
                sd = np.float32(np.linalg.norm(sto - spoint))
                diffuse = rays.sample(spoint)
                # sampleTransmittance
                dist2, trans = np.float32(0.0), np.float32(1.0)
                while True:
                    state, d = _py_exponential(state, ext)
                    ndist = np.float32(dist2 + d)
                    if ndist > max(sd, np.float32(1e-20)):
                        break
                    pos = (spoint + (ndist / sd)[None]
                           * (sto - spoint)).astype(np.float32)
                    trans = np.float32(trans * (1 - rays.sample(pos)[3]))
                    dist2 = ndist
                expect = diffuse * env * trans
        assert np.allclose(frame[i, j], expect, atol=1e-4), (i, j)


# ---------------------------------------------------------------------------
# DOS — view-aligned slice sweep with occlusion buffer
# (DOSRenderer.glsl integrate:66-82, occlusion:56-64; JS sweep
#  DOSRenderer.js:226-254)
# ---------------------------------------------------------------------------

def _np_bilinear_clamp(tex, uv):
    """Scalar re-implementation of the GL bilinear CLAMP_TO_EDGE fetch on a
    single-channel (H, W) texture (sampling.sample_texture2d)."""
    h, w = tex.shape
    dims = np.array([w, h], np.float32)
    u = np.clip(uv * dims - np.float32(0.5), 0.0, dims - 1)
    i0 = np.floor(u).astype(np.int32)
    f = (u - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, np.array([w - 1, h - 1], np.int32))
    c00 = tex[i0[1], i0[0]]
    c10 = tex[i0[1], i1[0]]
    c01 = tex[i1[1], i0[0]]
    c11 = tex[i1[1], i1[0]]
    c0 = c00 * (1 - f[0]) + c10 * f[0]
    c1 = c01 * (1 - f[0]) + c11 * f[0]
    return np.float32(c0 * (1 - f[1]) + c1 * f[1])


def test_dos_matches_sequential_emulation(sc):
    """Full-image numpy emulation of the slice sweep, sequential in slices:
    per slice, composite 1−exp(−σΔs) modulated by the previous occlusion
    buffer, then advance the occlusion buffer as the mean of the disk taps
    times the slice transmittance — exactly the ping-pong order of the
    reference (occlusion reads the *previous* buffer)."""
    from vpt_tpu.renderers import dos

    params = dos.Params(extinction=60.0, aperture=30.0, steps=10, slices=10,
                        samples=4)
    state0 = dos.reset(params, N, N, sc)
    state1 = dos.render_frame(state0, sc, params, jnp.float32(0.0),
                              jnp.int32(1))
    got_img = np.asarray(dos.display(state1, sc, params))

    ndc = np.asarray(sampling.pixel_ndc(N, N))
    mapped = (ndc * 0.5 + 0.5).astype(np.float32)
    mvp_inv = np.asarray(sc.mvp_inverse)
    proj = np.asarray(sc.projection)
    offsets = np.asarray(state0["offsets"])
    depth0 = np.float32(state0["depth"])
    max_depth = np.float32(state0["max_depth"])
    sdist = np.float32(state0["slice_distance"])
    occl_extent = np.float32(sdist * np.tan(np.float32(30.0)
                                            * np.pi / 180.0))

    color = np.zeros((N, N, 4), np.float32)
    occlusion = np.ones((N, N), np.float32)
    for s in range(params.steps):
        depth = np.float32(depth0 + np.float32(s) * sdist)
        if depth > max_depth:
            continue
        corrh = proj @ np.array([1.0, 1.0, -depth, 1.0], np.float32)
        corr = (corrh[:3] / corrh[3]).astype(np.float32)
        occl_scale = (corr[:2] * occl_extent).astype(np.float32)

        new_occl = occlusion.copy()
        new_color = color.copy()
        for i in range(N):
            for j in range(N):
                ph = mvp_inv @ np.array([ndc[i, j, 0], ndc[i, j, 1],
                                         corr[2], 1.0], np.float32)
                pos = (ph[:3] / ph[3]).astype(np.float32)
                if np.any(pos > 1.0) or np.any(pos < 0.0):
                    continue
                ts = np.asarray(sc.sample_color(
                    jnp.asarray(pos, jnp.float32)[None]))[0]
                extinction = np.float32(ts[3] * np.float32(60.0))
                alpha = np.float32(1.0 - np.exp(-extinction * sdist))
                c = color[i, j]
                nc = c + np.concatenate(
                    [ts[:3] * occlusion[i, j] * alpha * (1.0 - c[3]),
                     [alpha]]).astype(np.float32)
                nc[3] = min(nc[3], np.float32(1.0))
                new_color[i, j] = nc
                taps = np.float32(0.0)
                for k in range(params.samples):
                    uv = (mapped[i, j] + offsets[k] * occl_scale).astype(
                        np.float32)
                    taps += _np_bilinear_clamp(occlusion, uv)
                new_occl[i, j] = (taps / params.samples) \
                    * np.exp(-extinction * sdist)
        color, occlusion = new_color, new_occl

    assert np.allclose(np.asarray(state1["color"]), color, atol=1e-4)
    assert np.allclose(np.asarray(state1["occlusion"]), occlusion, atol=1e-4)
    rgb = 1.0 + (color[..., :3] - 1.0) * color[..., 3:4]
    assert np.allclose(got_img[..., :3], rgb, atol=1e-4)


# ---------------------------------------------------------------------------
# LAO — march with local ambient occlusion + soft shadows
# (LAORenderer.glsl:97-191)
# ---------------------------------------------------------------------------

def test_lao_matches_sequential_emulation(sc):
    """Per-pixel scalar emulation of the LAO fragment shader: front-to-back
    march with 2D TF lookup of (value, |∇|), the per-step AO loop with its
    carried (non-reset) inner accumulator, and the stochastic soft-shadow
    term — all driven by the reference's stateless ``rand`` hash, so the
    emulation is deterministic."""
    from vpt_tpu import rng
    from vpt_tpu.renderers import lao

    params = lao.Params(extinction=80.0, slices=8, lao_step_size=0.4,
                        num_lao_samples=2, num_shadow_samples=3)
    frame = np.asarray(lao.generate(sc, params, jnp.float32(0.0), N, N))

    rays = Rays(sc)
    ndc = rays.ndc
    step = np.float32(1.0 / params.slices)
    voxel = np.float32(1.0 / 32.0)

    # vLight = (inverseMvp · [lightPos, 1]).xyz without /w (vertex:25)
    lp = np.array([2.0, 12.0, 3.0, 1.0], np.float32)
    light = (rays.mvp_inv @ lp)[:3].astype(np.float32)
    seed_vec = np.array([3.14, 2.71], np.float32)
    rconst = float(np.asarray(rng.rand_vec2(jnp.asarray(seed_vec)))[0])

    def value_at(p):
        return float(np.asarray(sc.sample_value(
            jnp.asarray(p, jnp.float32)[None]))[0])

    def grad_mag_at(p):
        g = np.asarray(sc.raw_gradient(
            jnp.asarray(p, jnp.float32)[None], voxel))[0]
        return float(np.sqrt(g @ g))

    def tf_at(value, gmag):
        return np.asarray(sc.sample_transfer(
            jnp.asarray([value, gmag], jnp.float32)[None]))[0]

    t2s = np.arange(0.001, 1.0, params.lao_step_size, dtype=np.float32)
    tint_lao = np.array([0.15, 0.18, 0.32, 1.0], np.float32)
    tint_shadow = np.array([0.15, 0.18, 0.22, 1.0], np.float32)

    # (0,0) misses; the rest march through the sphere
    for (i, j) in [(0, 0), (3, 3), (4, 4), (5, 4), (5, 5)]:
        start, end, _, _, miss = rays.pixel(i, j)
        if miss:
            expect = np.array([0, 0, 0, 1], np.float32)
        else:
            rx = float(np.asarray(rng.rand_vec2(
                jnp.asarray(ndc[i, j] * seed_vec)))[0])
            t0 = np.float32(np.clip(rx * step * 1.5, 0.0, 1.0))
            acc = np.zeros(4, np.float32)
            for k in range(params.slices):
                t = np.float32(t0 + np.float32(k) * step)
                if not (t < 1.0 and acc[3] <= 0.9):
                    continue
                pos = (start + t * (end - start)).astype(np.float32)
                value = value_at(pos)
                gmag = grad_mag_at(pos)

                # local ambient occlusion: carried inner accumulator
                rdir = (np.sign(2 * rx - 1) * (rx / np.sqrt(3.0))
                        * np.ones(3)).astype(np.float32)
                inner = np.float32(0.0)
                for t2 in t2s:
                    half = light + rdir * np.float32(0.19 * t2) - pos
                    half = half / max(np.linalg.norm(half), 1e-10)
                    inner += value_at(pos + half * t2) \
                        * np.float32((1.0 - t2) ** 2)
                carried, total = np.float32(0.0), np.float32(0.0)
                for _ in range(params.num_lao_samples):
                    carried = np.float32(np.clip(carried + inner, 0.0, 1.0))
                    total += carried
                lao_term = total / params.num_lao_samples

                # soft shadows
                sdir = np.array([-1.0 + light[0] * rx,
                                 light[1] + rx * light[2],
                                 -1.0 + 2.0 * rconst], np.float32)
                sdir = (sdir / max(np.linalg.norm(sdir), 1e-10)) \
                    * np.float32(rx)
                vshadow = value_at(pos + sdir * np.float32(0.19))
                contrib = vshadow * (vshadow * 0.2) * np.linalg.norm(sdir)
                contrib = np.clip(contrib * 20.0, 0.0, 1.0)
                soft = np.float32(np.clip((-0.2 + 1.2 * contrib) / 1.3,
                                          0.0, 1.0))

                color = tf_at(value, gmag)
                w1 = np.float32(lao_term * 0.69)
                color = color * (1 - w1) + color * tint_lao * w1
                w2 = np.float32(soft * 0.54)
                color = color * (1 - w2) + color * tint_shadow * w2

                acc[:3] += (1 - acc[3]) * color[:3] * value
                acc[3] += (1 - acc[3]) * value * np.float32(80.0 / 100.0)
            rgb = acc[:3] / max(acc[3], 1e-6) if acc[3] > 1.0 else acc[:3]
            expect = np.array([rgb[0], rgb[1], rgb[2], 1], np.float32)
        assert np.allclose(frame[i, j], expect, atol=1e-4), (i, j)
