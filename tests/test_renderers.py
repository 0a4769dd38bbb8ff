import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu import environment, sampling, transfer, volume
from vpt_tpu.renderers import MODULES, make_renderer, make_scene


@pytest.fixture(scope="module")
def scene64():
    vol = volume.sphere_volume(32)
    tf = transfer.gray_ramp(alpha_scale=1.0)
    return make_scene(vol, tf)


ALL = sorted(MODULES)


@pytest.mark.parametrize("key", ALL)
def test_runs_and_finite(key, scene64):
    r = make_renderer(key, height=32, width=32)
    img = np.asarray(r.render_progressive(scene64, frames=2, seed0=3))
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()


@pytest.mark.parametrize("key", ALL)
def test_deterministic(key, scene64):
    a = np.asarray(make_renderer(key, height=16, width=16)
                   .render_progressive(scene64, frames=2, seed0=5))
    b = np.asarray(make_renderer(key, height=16, width=16)
                   .render_progressive(scene64, frames=2, seed0=5))
    assert np.array_equal(a, b)


def test_mip_center_value(scene64):
    # the center ray passes the sphere center where value = 1 -> TF alpha = 1
    r = make_renderer("mip", height=33, width=33)
    img = np.asarray(r.render_progressive(scene64, frames=4, seed0=0))
    assert img[16, 16, 0] > 0.95
    assert img[0, 0, 0] == 0.0  # corner ray misses the sphere


def test_mip_progressive_monotone(scene64):
    r = make_renderer("mip", height=16, width=16)
    r.reset(scene64)
    prev = None
    for i in range(3):
        r.render(scene64, 0.1 * (i + 1))
        cur = np.asarray(r.state)
        if prev is not None:
            assert np.all(cur >= prev - 1e-7)
        prev = cur


def test_eam_homogeneous_analytic():
    """Homogeneous unit-density volume, alpha-only TF: discrete front-to-back
    compositing has closed form 1 - (1 - a)^n for per-step opacity a."""
    n = 8
    vol = volume.Volume(jnp.ones((n, n, n, 1), jnp.float32))
    # TF: alpha = 0.5 at value 1, rgb = 1
    tf = np.zeros((2, 256, 4), np.float32)
    tf[..., :3] = 1.0
    tf[..., 3] = 0.5
    from vpt_tpu.renderers import eam
    sc = make_scene(vol, jnp.asarray(tf))
    params = eam.Params(extinction=100.0, slices=64, random=False)
    frame = np.asarray(eam.generate(sc, params, jnp.float32(0.0), 65, 65))
    # center pixel: ray crosses the full cube depth 1.0,
    # step length = 1/64, per-step alpha = 0.5 * (L/64) * 100 clipped by the
    # compositing; march stops once acc > 0.99.
    # emulate scalar front-to-back:
    L = 1.0  # cube depth along the center ray
    a_step = 0.5 * (L / 64) * 100
    acc_rgb, acc_a, t = 0.0, 0.0, 0.0
    while t < 1.0 and acc_a < 0.99:
        acc_rgb += (1 - acc_a) * a_step * 1.0
        acc_a += (1 - acc_a) * a_step
        t += 1 / 64
    if acc_a > 1.0:
        acc_rgb /= acc_a
    assert np.allclose(frame[32, 32, 0], acc_rgb, atol=1e-3)


def test_eam_running_mean(scene64):
    from vpt_tpu.renderers import eam
    params = eam.Params()
    state = eam.reset(params, 16, 16)
    f1 = eam.generate(scene64, params, jnp.float32(0.1), 16, 16)
    f2 = eam.generate(scene64, params, jnp.float32(0.7), 16, 16)
    s1 = eam.render_frame(state, scene64, params, jnp.float32(0.1),
                          jnp.int32(1))
    s2 = eam.render_frame(s1, scene64, params, jnp.float32(0.7), jnp.int32(2))
    expect = (np.asarray(f1) + np.asarray(f2)) / 2
    assert np.allclose(np.asarray(s2), expect, atol=1e-6)


def test_iso_hit_depth(scene64):
    """Center ray should hit the isosurface near the analytic sphere front."""
    r = make_renderer("iso", height=33, width=33)
    r.render(scene64, 0.5)
    closest = np.asarray(r.state)
    pos = closest[16, 16, :3]
    # sphere: radius 0.3, soft edge 0.1; isovalue 0.5 is at r = 0.3
    dist = np.linalg.norm(pos - 0.5)
    assert closest[16, 16, 3] > 0  # hit
    assert abs(dist - 0.3) < 0.05
    # front side: z > 0.5 (camera at +z)
    assert pos[2] > 0.5
    assert closest[0, 0, 3] == -1.0  # corner missed


def test_iso_integrate_keeps_nearer():
    from vpt_tpu.renderers import iso
    a = jnp.full((1, 1, 4), -1.0)
    f = jnp.asarray(np.array([[[0.5, 0.5, 0.5, 0.4]]], np.float32))
    out = iso.render_frame.__wrapped__ if hasattr(iso.render_frame, "__wrapped__") else None
    # manual: state=-1, frame hit -> frame
    s1 = np.asarray(jnp.where((f[..., 3:4] > 0) & (a[..., 3:4] > 0),
                              jnp.where(f[..., 3:4] < a[..., 3:4], f, a),
                              jnp.where(f[..., 3:4] > 0, f, a)))
    assert np.allclose(s1, np.asarray(f))


def test_depth_values_in_bounds(scene64):
    r = make_renderer("depth", height=32, width=32)
    img = np.asarray(r.render_progressive(scene64, frames=1, seed0=0))
    d = img[..., 0]
    hit = d >= 0
    assert hit.sum() > 0
    assert np.all(d[hit] <= 1.0)
    assert np.all(d[~hit] == -1.0)


def test_dos_background_white(scene64):
    r = make_renderer("dos", height=32, width=32)
    img = np.asarray(r.render_progressive(scene64, frames=4, seed0=0))
    assert np.allclose(img[0, 0, :3], 1.0, atol=1e-4)  # empty corner
    assert img[16, 16, :3].mean() < 0.9  # occluded center


def test_mcs_escaped_rays_see_environment():
    vol = volume.Volume(jnp.zeros((8, 8, 8, 1), jnp.float32))
    tf = jnp.zeros((2, 2, 4), jnp.float32)  # fully transparent
    env = environment.constant([0.25, 0.5, 0.75])
    sc = make_scene(vol, tf, environment=env)
    r = make_renderer("mcs", height=8, width=8)
    img = np.asarray(r.render_progressive(sc, frames=2, seed0=0))
    assert np.allclose(img[..., :3], [0.25, 0.5, 0.75], atol=1e-5)


def test_mcm_empty_volume_unit_radiance():
    """With a transparent volume every photon escapes to the white env with
    transmittance 1 -> radiance converges to exactly 1."""
    vol = volume.Volume(jnp.zeros((8, 8, 8, 1), jnp.float32))
    tf = jnp.zeros((2, 2, 4), jnp.float32)
    sc = make_scene(vol, tf)
    r = make_renderer("mcm", height=8, width=8)
    img = np.asarray(r.render_progressive(sc, frames=4, seed0=0))
    assert np.allclose(img[..., :3], 1.0, atol=1e-5)


def _py_pcg(x):
    x &= 0xFFFFFFFF
    x = (x * 747796405 + 2891336453) & 0xFFFFFFFF
    x = (((x >> ((x >> 28) + 4)) ^ x) * 277803737) & 0xFFFFFFFF
    return ((x >> 22) ^ x) & 0xFFFFFFFF


def _py_uniform(state):
    state = _py_pcg(state)
    return state, np.float32(state) / np.float32(4294967295.0)


def test_mcm_matches_sequential_emulation():
    """The vectorized event machine must reproduce a per-pixel *sequential*
    GLSL-style execution: same RNG chain, same branch outcomes (MCM
    integrate, MCMRenderer.glsl:129-166)."""
    from vpt_tpu.renderers import mcm

    n = 4
    vol = volume.sphere_volume(8)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    sc = make_scene(vol, tf)
    params = mcm.Params(extinction=50.0, anisotropy=0.0, max_bounces=8,
                        steps=16)
    seed = np.float32(0.37)
    state0 = mcm.reset(params, n, n, sc, seed=0.11)
    state1 = mcm.render_frame(state0, sc, params, jnp.float32(seed),
                              jnp.int32(1))

    # sequential emulation for a few pixels
    ndc = np.asarray(sampling.pixel_ndc(n, n))
    mapped = ndc * 0.5 + 0.5
    mvp_inv = np.asarray(sc.mvp_inverse)
    vol_np = np.asarray(sc.volume)
    tf_np = np.asarray(sc.transfer)

    def sample_color(p):
        c = np.asarray(sampling.sample_volume_color(
            jnp.asarray(vol_np), jnp.asarray(tf_np),
            jnp.asarray(p, jnp.float32)[None]))[0]
        return c

    def unproject_rand(state, pos2d):
        draws = []
        for _ in range(4):
            state, u = _py_uniform(state)
            draws.append(u)
        radius = np.float32(np.sqrt(draws[0]))
        angle = np.float32(6.28318530718) * draws[1]
        disk = radius * np.array([np.cos(angle), np.sin(angle)], np.float32)
        near_xy = pos2d + disk * np.float32(0.0)  # blur = 0
        aa = np.array([draws[2], draws[3]], np.float32)
        far_xy = pos2d + (aa * 2 - 1) * np.float32(1.0 / n)
        nearh = mvp_inv @ np.array([near_xy[0], near_xy[1], -1, 1],
                                   np.float32)
        farh = mvp_inv @ np.array([far_xy[0], far_xy[1], 1, 1], np.float32)
        return state, nearh[:3] / nearh[3], farh[:3] / farh[3]

    def intersect_cube(o, d):
        with np.errstate(divide="ignore", invalid="ignore"):
            tmin = (0 - o) / d
            tmax = (1 - o) / d
        t1 = np.minimum(tmin, tmax)
        t2 = np.maximum(tmin, tmax)
        return max(t1.max(), 0.0), max(t2.min(), 0.0)

    for (i, j) in [(0, 0), (2, 2), (1, 3)]:
        px = mapped[i, j].astype(np.float32)
        state = _py_pcg((19 * int(px[0].view(np.uint32))
                         + 47 * int(px[1].view(np.uint32))
                         + 101 * int(seed.view(np.uint32)) + 131)
                        & 0xFFFFFFFF)
        ph_pos = np.asarray(state0["position"])[i, j].copy()
        ph_dir = np.asarray(state0["direction"])[i, j].copy()
        ph_tr = np.asarray(state0["transmittance"])[i, j].copy()
        ph_rad = np.asarray(state0["radiance"])[i, j].copy()
        ph_b = float(np.asarray(state0["bounces"])[i, j])
        ph_s = float(np.asarray(state0["samples"])[i, j])

        for _ in range(params.steps):
            state, u = _py_uniform(state)
            dist = -np.log(max(u, np.float32(1e-38))) / np.float32(50.0)
            ph_pos = (ph_pos + dist * ph_dir).astype(np.float32)
            c = sample_color(ph_pos)
            alpha = c[3]
            p_null = 1 - alpha
            p_scatter = 0.0 if ph_b >= 8 else alpha * c[:3].max()
            p_absorb = 1 - p_null - p_scatter
            state, fortune = _py_uniform(state)
            oob = np.any(ph_pos > 1) or np.any(ph_pos < 0)
            if oob or fortune < p_absorb:
                r_new = ph_tr * 1.0 if oob else np.zeros(3, np.float32)
                ph_s += 1
                ph_rad = ph_rad + (r_new - ph_rad) / np.float32(ph_s)
                state, f3, t3 = unproject_rand(state, ndc[i, j])
                d = t3 - f3
                d = d / np.linalg.norm(d)
                tn, _ = intersect_cube(f3, d)
                ph_pos = (f3 + np.float32(tn) * d).astype(np.float32)
                ph_dir = d.astype(np.float32)
                ph_tr = np.ones(3, np.float32)
                ph_b = 0
            elif fortune < p_absorb + p_scatter:
                ph_tr = (ph_tr * c[:3]).astype(np.float32)
                # isotropic HG: sphere sample (2 draws)
                state, r1 = _py_uniform(state)
                state, r2 = _py_uniform(state)
                radius = np.float32(np.sqrt(r1))
                angle = np.float32(6.28318530718) * r2
                disk = radius * np.array([np.cos(angle), np.sin(angle)],
                                         np.float32)
                norm = float(disk @ disk)
                ph_dir = np.array([2 * np.sqrt(max(1 - norm, 0.0)) * disk[0],
                                   2 * np.sqrt(max(1 - norm, 0.0)) * disk[1],
                                   1 - 2 * norm], np.float32)
                ph_b += 1

        got_rad = np.asarray(state1["radiance"])[i, j]
        got_pos = np.asarray(state1["position"])[i, j]
        got_smp = float(np.asarray(state1["samples"])[i, j])
        assert got_smp == ph_s, (i, j)
        assert np.allclose(got_rad, ph_rad, atol=1e-4), (i, j)
        assert np.allclose(got_pos, ph_pos, atol=1e-3), (i, j)


def test_mcm_homogeneous_unbiased():
    """Homogeneous medium sanity: with a purely absorbing TF (rgb=0) photons
    either escape (radiance=env=1) or are absorbed (0); the per-pixel mean
    estimates beam transmittance along each pixel's ray through the cube.
    For the center pixel that's roughly exp(-sigma*L)."""
    from vpt_tpu.renderers import mcm

    n = 9
    vol = volume.Volume(jnp.ones((8, 8, 8, 1), jnp.float32))
    tf = np.zeros((2, 256, 4), np.float32)
    tf[..., 3] = 0.4  # alpha 0.4 everywhere -> effective sigma = 0.4*ext
    sc = make_scene(vol, jnp.asarray(tf))
    params = mcm.Params(extinction=4.0, anisotropy=0.0, steps=64)
    r = make_renderer("mcm", params=params, height=n, width=n)
    img = np.asarray(r.render_progressive(sc, frames=100, seed0=7))
    center = img[n // 2, n // 2, 0]
    # analytic: L ~= 1 through cube center, effective sigma = 1.6
    expect = np.exp(-1.6 * 1.0)
    assert abs(center - expect) < 0.1


def test_static_param_changes_recompile_cleanly(scene64):
    from vpt_tpu.renderers import eam
    p1 = eam.Params(slices=16)
    p2 = eam.Params(slices=32)
    f1 = eam.generate(scene64, p1, jnp.float32(0.0), 8, 8)
    f2 = eam.generate(scene64, p2, jnp.float32(0.0), 8, 8)
    assert f1.shape == f2.shape
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_lao_num_samples_changes_output(scene64):
    """The reference's carried (non-reset) LAO accumulator makes N>1 differ
    from N=1 (LAORenderer.glsl:136-150)."""
    from vpt_tpu.renderers import lao

    p1 = lao.Params(num_lao_samples=1)
    p4 = lao.Params(num_lao_samples=4)
    a = lao.generate(scene64, p1, jnp.float32(0.1), 24, 24)
    b = lao.generate(scene64, p4, jnp.float32(0.1), 24, 24)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dos_shifted_taps_match_gather_sampler():
    """The gather-free shifted-bilinear occlusion taps must match per-tap
    sample_texture2d fetches (including CLAMP_TO_EDGE at the borders and
    large offsets that clip whole rows)."""
    from vpt_tpu.renderers import dos

    rng_np = np.random.default_rng(4)
    h = w = 24
    occ = jnp.asarray(rng_np.uniform(0, 1, (h, w)).astype(np.float32))
    offsets = dos._occlusion_samples(8)
    ndc = sampling.pixel_ndc(h, w)
    mapped = ndc * 0.5 + 0.5
    for scale in ([0.01, 0.015], [0.2, 0.3], [1.5, 1.5]):
        sc = jnp.asarray(scale, jnp.float32)
        got = np.asarray(dos._shifted_occlusion_taps(occ, offsets, sc))
        taps = mapped[None] + offsets[:, None, None, :] * sc
        ref = np.asarray(jnp.mean(
            sampling.sample_texture2d(occ[..., None], taps)[..., 0],
            axis=0))
        assert np.allclose(got, ref, atol=1e-6), scale
