"""Unit tests for the roofline traffic model and the v5p pod projection
arithmetic (VERDICT r3 #2: 'docs/SCALING.md commits the model with a unit
test on its arithmetic')."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from benchmarks import projection, roofline  # noqa: E402
from vpt_tpu import transfer, volume  # noqa: E402
from vpt_tpu.renderers import make_scene, mcm  # noqa: E402


# ---------------------------------------------------------------------------
# GatherCurve
# ---------------------------------------------------------------------------

def test_gather_curve_reproduces_measured_points():
    c = projection.MEASURED_V5E_CURVE
    assert c.row_ns(1 << 16) == pytest.approx(4.1)
    assert c.row_ns(1 << 21) == pytest.approx(5.7)
    assert c.row_ns(1 << 24) == pytest.approx(13.1)


def test_gather_curve_interpolates_and_extrapolates():
    c = projection.MEASURED_V5E_CURVE
    # linear in log2 between 2^21 (5.7) and 2^22 (12.0)
    mid = c.row_ns(int(2 ** 21.5))
    assert 5.7 < mid < 12.0
    assert mid == pytest.approx((5.7 + 12.0) / 2, rel=1e-6)
    # flat extrapolation beyond the measured range
    assert c.row_ns(1 << 30) == pytest.approx(13.1)
    assert c.row_ns(1 << 10) == pytest.approx(4.1)
    # monotone non-decreasing over the whole range
    xs = [c.row_ns(1 << k) for k in range(10, 30)]
    assert all(b >= a - 1e-9 for a, b in zip(xs, xs[1:]))


def test_gather_curve_speedup_scales_everything():
    c = projection.GatherCurve(speedup=2.0)
    base = projection.GatherCurve()
    assert c.row_ns(1 << 20) == pytest.approx(base.row_ns(1 << 20) / 2)
    assert c.event_ns(1 << 20) == pytest.approx(base.event_ns(1 << 20) / 2)


# ---------------------------------------------------------------------------
# Event traffic model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tracking_scene():
    tf = np.asarray(transfer.gray_ramp(alpha_scale=0.8)).copy()
    tf[:, :8, 3] = 0.0
    return make_scene(volume.sphere_volume(16), jnp.asarray(tf),
                      pack_dtype=jnp.bfloat16, tf_mxu=True, tracking="cheb")


def test_event_traffic_bytes_arithmetic(tracking_scene):
    params = mcm.Params(extinction=20.0, steps=4)
    h = w = 8
    state = mcm.reset(params, h, w, tracking_scene)
    t = roofline.event_traffic_bytes(state, tracking_scene)
    # carry: position 12 + direction 12 + bounces 4 + transmittance 12 +
    # radiance 12 + samples 4 + cheb 4 + rng 4 = 64 B/pixel, read + write
    assert t["carry_rw"] == pytest.approx(128.0)
    # tracking table rows are 8 bf16 lanes = 16 B
    assert t["volume_row"] == 16.0
    assert t["tf_row"] == 0.0            # MXU path: FLOPs, not bytes
    assert t["tf_mxu_flops"] == 2 * 256 * 4
    assert t["total"] == pytest.approx(128.0 + 16.0)


def test_event_traffic_bytes_gather_tf():
    sc = make_scene(volume.sphere_volume(16),
                    transfer.gray_ramp(alpha_scale=0.8))  # f32, TF gather
    params = mcm.Params(extinction=20.0, steps=4)
    state = mcm.reset(params, 8, 8, sc)
    t = roofline.event_traffic_bytes(state, sc)
    assert t["volume_row"] == 8 * 4       # f32 8-lane corner row
    assert t["tf_row"] == sc.transfer_packed.shape[-1] * 4
    assert t["tf_mxu_flops"] == 0


# ---------------------------------------------------------------------------
# Roofline field arithmetic
# ---------------------------------------------------------------------------

def test_forward_roofline_fields(tracking_scene):
    params = mcm.Params(extinction=20.0, steps=4)
    state = mcm.reset(params, 8, 8, tracking_scene)
    out = roofline.forward_roofline(
        events_per_s=100e6, state=state, scene=tracking_scene,
        hbm_gbps=800.0, mxu_tflops=9.0, gather_ns=5.0)
    assert out["gather_bound_events_per_s"] == 200_000_000
    assert out["gather_fraction"] == pytest.approx(0.5)
    assert out["achieved_hbm_gbps"] == pytest.approx(
        100e6 * out["bytes_per_event"] / 1e9, rel=1e-3)
    assert out["hbm_fraction"] == pytest.approx(
        out["achieved_hbm_gbps"] / 800.0, rel=1e-2)
    # the gather bound binds long before the stream bound on these numbers
    assert out["binding_resource"] == "gather-engine"
    assert out["hbm_bound_events_per_s"] > out["gather_bound_events_per_s"]


def test_backward_roofline_fields():
    out = roofline.backward_roofline(
        grad_events_per_s=20e6, fold_rows=1 << 18, fold_lanes=64,
        hbm_gbps=800.0, gather_ns=5.0, scatter_ns=20.0)
    assert out["op_bound_events_per_s"] == 40_000_000
    assert out["op_fraction"] == pytest.approx(0.5)
    # bytes: update row 256 + RMW 512 + fwd row 16
    assert out["min_bytes_per_event"] == pytest.approx(256 + 512 + 16)


# ---------------------------------------------------------------------------
# Pod projection
# ---------------------------------------------------------------------------

def test_dp_replicated_is_linear():
    out = projection.dp_replicated(8, 180e6, 1.5)
    assert out["aggregate_events_per_s"] == pytest.approx(8 * 180e6)
    assert out["aggregate_paths_per_s"] == pytest.approx(8 * 180e6 / 1.5)
    assert out["efficiency"] == 1.0
    assert out["collectives_per_event"] == 0


def test_spatial_sharded_arithmetic():
    curve = projection.GatherCurve()
    out = projection.spatial_sharded(
        8, 8, 1024 * 1024, (256, 256, 256), curve, projection.V5P,
        mean_path_events=1.4)
    # slab table: 32 + 1 halo planes of 256² rows
    assert out["slab_rows"] == 33 * 256 * 256
    # psum: ring all-reduce of 16 B over 8 chips on a 200 GB/s axis
    expect_comm = 2 * 7 / 8 * 16 / 200.0
    assert out["psum_ns_per_event"] == pytest.approx(expect_comm)
    expect_agg = 1 * 1e9 / (curve.event_ns(33 * 256 * 256) + expect_comm)
    assert out["aggregate_events_per_s"] == pytest.approx(expect_agg)
    # efficiency compares against 8 chips at the FULL-table rate
    full = 1e9 / curve.event_ns(256 ** 3)
    assert out["efficiency"] == pytest.approx(expect_agg / (8 * full))


def test_spatial_sharded_rejects_bad_mesh():
    with pytest.raises(ValueError):
        projection.spatial_sharded(8, 3, 1024, (64, 64, 64),
                                   projection.MEASURED_V5E_CURVE,
                                   projection.V5P, 1.4)


def test_grad_allreduce_efficiency():
    # 512³ f32 voxel grads, 8 chips, 0.32 s/step, 80% overlapped
    out = projection.grad_allreduce_efficiency(
        grad_bytes=512 ** 3 * 4, n_chips=8, step_time_s=0.32,
        chip=projection.V5P, overlap_fraction=0.8)
    expect_comm = 2 * 7 / 8 * 512 ** 3 * 4 / 200e9
    assert out["comm_s_per_step"] == pytest.approx(expect_comm)
    assert out["efficiency"] == pytest.approx(
        0.32 / (0.32 + 0.2 * expect_comm))
    assert out["efficiency"] > 0.99      # the config-4 overlap headroom


def test_v5p16_projection_meets_north_star_at_the_floor():
    """The committed claim of docs/SCALING.md: the 128³ headline,
    data-parallel over 8 v5p chips, meets the 1e9 rays/s aggregate even
    if a v5p chip gathers NO faster than the measured v5e-lite."""
    table = projection.v5p16_projection()
    assert table["v5e-floor"]["dp128"]["aggregate_paths_per_s"] >= 1e9
    assert table["v5e-floor"]["dp128"]["efficiency"] >= 0.85
    # the hbm-scaled scenario clears it with margin at 256³ too
    assert table["hbm-scaled"]["dp256"]["aggregate_paths_per_s"] >= 1e9
    # spatial sharding is reported as the capacity mode it is — its
    # throughput efficiency must NOT silently read as meeting the target
    assert table["v5e-floor"]["spatial512"]["efficiency"] < 0.5


def test_resident_sharded_arithmetic():
    """The r5 resident-photon column: parking efficiency follows the
    geometric formula, the amortized tax divides by migrate_every, and
    the measured-input configuration beats halo at the same capacity
    while staying below replicated DP (the committed docs/SCALING.md
    story)."""
    kw = dict(n_chips=8, space=8, pixels=1024 * 1024,
              dims=(256, 256, 256), curve=projection.MEASURED_V5E_CURVE,
              chip=projection.V5P, mean_path_events=1.39)
    r = projection.resident_sharded(**kw)
    f, k = 0.14, 8
    assert r["delivered_fraction"] == pytest.approx(
        (1 - (1 - f) ** k) / (f * k))
    # k=1 pays the full tax and delivers every event
    r1 = projection.resident_sharded(**kw, migrate_every=1)
    assert r1["delivered_fraction"] == pytest.approx(1.0)
    assert r1["slot_ns"] > r["slot_ns"]
    # the committed ordering: DP > resident > halo at 256^3
    halo = projection.spatial_sharded(8, 8, 1024 * 1024, (256,) * 3,
                                      projection.MEASURED_V5E_CURVE,
                                      projection.V5P, 1.39)
    dp = projection.dp_replicated(8, 79.9e6, 1.39)
    assert halo["aggregate_events_per_s"] \
        < r["aggregate_events_per_s"] < dp["aggregate_events_per_s"]
    assert r["aggregate_events_per_s"] \
        > 1.8 * halo["aggregate_events_per_s"]
