"""Pallas kernels vs their XLA oracles (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu import tonemap as tm
from vpt_tpu import transfer
from vpt_tpu.pallas import tf1d, tonemap_kernel


@pytest.mark.parametrize("name", ["reinhard", "aces", "filmic", "uchimura"])
def test_pallas_tonemap_matches_xla(name):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 4, (64, 128, 4)).astype(np.float32))
    ref = np.asarray(tm.get(name)(img, exposure=1.3, gamma=2.0))
    got = np.asarray(tonemap_kernel.tonemap(
        img, name, exposure=1.3, gamma=2.0, interpret=True))
    assert np.allclose(got, ref, atol=1e-6)


def test_pallas_tonemap_rejects_unsupported():
    with pytest.raises(ValueError):
        tonemap_kernel.tonemap(jnp.zeros((8, 128, 4)), "artistic",
                               interpret=True)


def test_tf1d_lookup_matches_bilinear_at_y0():
    from vpt_tpu import sampling

    tf = transfer.rasterize(transfer.TransferFunctionBumps.from_list([
        {"position": {"x": 0.3, "y": 0.0}, "size": {"x": 0.2, "y": 0.5},
         "color": {"r": 1, "g": 0.5, "b": 0.2, "a": 0.8}},
        {"position": {"x": 0.8, "y": 0.0}, "size": {"x": 0.1, "y": 0.4},
         "color": {"r": 0.1, "g": 0.9, "b": 1, "a": 0.5}},
    ]), 64, 256)
    table, width = tf1d.pack_table(tf)
    rng = np.random.default_rng(1)
    values = jnp.asarray(rng.uniform(-0.1, 1.1, (16, 128)).astype(np.float32))

    got = np.asarray(tf1d.lookup_1d(table, values, width, interpret=True))
    # oracle: bilinear 2D sample at (value, 0) — clamps to row 0
    uv = jnp.stack([values, jnp.zeros_like(values)], axis=-1)
    ref = np.asarray(sampling.sample_texture2d(tf, uv))
    assert np.allclose(got, ref, atol=1e-6)


def test_tf1d_pack_nonmultiple_width():
    tf = jnp.asarray(np.random.default_rng(2)
                     .uniform(0, 1, (2, 200, 4)).astype(np.float32))
    table, width = tf1d.pack_table(tf)
    assert width == 200
    assert table.shape == (8, 128)  # padded to 2 banks
    values = jnp.asarray(np.linspace(0, 1, 256, dtype=np.float32)
                         .reshape(2, 128))
    got = np.asarray(tf1d.lookup_1d(table, values, width, interpret=True))
    from vpt_tpu import sampling
    uv = jnp.stack([values, jnp.zeros_like(values)], axis=-1)
    ref = np.asarray(sampling.sample_texture2d(tf, uv))
    assert np.allclose(got, ref, atol=1e-6)


def test_tf_banks_active_in_march_renderers():
    """Regression: tf_banks must engage for the marchers' chunked (4-D)
    position batches, matching the gather path."""
    import numpy as np
    import jax.numpy as jnp
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import eam, make_scene

    v = volume.sphere_volume(16)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    sc_banks = make_scene(v, tf, tf_banks=True)
    assert sc_banks.transfer_banks is not None
    sc_ref = make_scene(v, tf)
    params = eam.Params(slices=16, random=False)
    # 16x16 pixels x 8-slice chunks -> 4-D positions inside _march
    a = eam.generate(sc_banks, params, jnp.float32(0.0), 16, 16)
    b = eam.generate(sc_ref, params, jnp.float32(0.0), 16, 16)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
