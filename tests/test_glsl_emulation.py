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
