"""Benchmark: MCM throughput on the flagship renderer.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
...}.  Secondary configs go to stderr.

Two rates are measured and reported (BENCH_NOTES.md "Metric definitions"):

- **events/s** — null-collision tracking events (pixels × steps × frames /
  wall time): the machine-throughput measure; every event costs one volume
  gather + VPU event logic regardless of the scene.
- **paths/s** — completed photon paths (growth of the per-pixel ``samples``
  counters / wall time): the "rays/s" of the north-star target.  Scene-
  dependent (mean path length = events/paths varies with opacity), so it is
  reported alongside, not instead.

The headline scene runs the reference's ACTUAL transfer-function pipeline
(``tf_srgb=True`` — the TF is an SRGB8_ALPHA8 GL texture whose 8-bit alpha
rounds the gray ramp's near-zero floor to exact 0, AbstractRenderer.js:31-44)
with the r3 auto-tracking policy (``tracking="auto"`` — cheb-skip engages
because the sphere's exterior is TF-empty under 8-bit alpha).  The float-TF
configuration of rounds 1–2 is reported on stderr for continuity, along
with a sparse 256³ scene with the policy active (VERDICT r2 #1).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` divides
events/s by the north-star 1e9 rays/s aggregate on a v5p-16 (8 chips)
=> 1.25e8 per chip; ``paths_vs_baseline`` is the stricter ratio using
completed paths as the ray metric.

``--check``: regression gate (VERDICT r2 #8) — re-measures the configs in
benchmarks/bench_baseline.json and exits non-zero if events/s or paths/s
dropped more than the documented ±15% tunnel-variance band below the
committed baselines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_TABLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "bench_baseline.json")


def probe_backend(retries: int = 6, delay_s: float = 30.0) -> None:
    """Tiny matmul with bounded retry: the tunneled TPU backend sometimes
    stalls for stretches of many minutes (observed up to ~25 min in r3) —
    probe before timing so a hung tunnel fails loudly instead of polluting
    the measurement, with enough patience to ride out short sulks."""
    import numpy as np

    for attempt in range(retries):
        try:
            x = jnp.ones((128, 128), jnp.float32)
            val = float(np.asarray((x @ x)[0, 0]))
            assert val == 128.0, val
            return
        except Exception as exc:  # noqa: BLE001 - backend errors vary
            if attempt == retries - 1:
                raise RuntimeError(
                    f"backend probe failed after {retries} tries") from exc
            print(f"# backend probe attempt {attempt + 1} failed "
                  f"({exc}); retrying in {delay_s:.0f}s", file=sys.stderr)
            time.sleep(delay_s)


def time_config(scene, steps: int, frames: int, extinction: float = 40.0,
                height: int = 512, width: int = 512) -> tuple[float, float]:
    """Returns (events/s, paths/s) for one MCM config."""
    from vpt_tpu.renderers import mcm

    params = mcm.Params(extinction=extinction, anisotropy=0.3, steps=steps)
    state = mcm.reset(params, height, width, scene)
    frame_fn = jax.jit(mcm.render_frame, donate_argnums=(0,))
    total_samples = jax.jit(lambda s: jnp.sum(s["samples"], dtype=jnp.float64
                                              if jax.config.jax_enable_x64
                                              else jnp.float32))

    def sync(s):
        # device→host copy forces completion (block_until_ready does not
        # reliably block on tunneled PJRT backends)
        import numpy as np
        return float(np.asarray(total_samples(s)))

    # warmup / compile
    state = frame_fn(state, scene, params, jnp.float32(0.123), jnp.int32(1))
    paths0 = sync(state)

    t0 = time.perf_counter()
    for i in range(frames):
        state = frame_fn(state, scene, params,
                         jnp.float32(0.2 + 0.001 * i), jnp.int32(i + 2))
    paths1 = sync(state)
    dt = time.perf_counter() - t0
    return (height * width * steps * frames / dt, (paths1 - paths0) / dt)


def headline_scene():
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene

    vol = volume.sphere_volume(128)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    # bf16 corner tables: ~4x faster gathers; 8-bit-mantissa table precision,
    # comparable to the reference's R8/SRGB8 GL texture formats.
    # tf_mxu: 1D TF lookup as a one-hot MXU matmul instead of an HBM gather.
    # tf_srgb + tracking="auto": reference TF texture semantics + the
    # cheb-skip empty-space policy (see module docstring).
    return make_scene(vol, tf, pack_dtype=jnp.bfloat16, tf_mxu=True,
                      tf_srgb=True, tracking="auto")


def legacy_scene():
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene

    return make_scene(volume.sphere_volume(128),
                      transfer.gray_ramp(alpha_scale=0.8),
                      pack_dtype=jnp.bfloat16, tf_mxu=True)


def sparse_scene():
    from vpt_tpu import transfer
    from vpt_tpu.renderers import make_scene
    from benchmarks.tracking_bench import sparse_ball

    return make_scene(sparse_ball(256), transfer.gray_ramp(alpha_scale=0.5),
                      pack_dtype=jnp.bfloat16, tf_mxu=True, tf_srgb=True,
                      tracking="auto")


def dense256_scene():
    """The milestone scale (BASELINE.json configs 2-4 name 256³+): the
    headline sphere at 256³, reference TF semantics + the auto tracking
    policy — regression-gated so the 256³ rates live in every BENCH_rN,
    not only in notes (VERDICT r3 #4)."""
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene

    return make_scene(volume.sphere_volume(256),
                      transfer.gray_ramp(alpha_scale=0.8),
                      pack_dtype=jnp.bfloat16, tf_mxu=True,
                      tf_srgb=True, tracking="auto")


def dense512_scene():
    """BASELINE config 4's volume scale, measured (VERDICT r4 #3): the
    bf16 corner table is ~2.1 GiB (transiently ~4.3 GiB f32 while
    packing) and fits this chip; measured r5 at the 256³ rate — the
    gather curve's flat extrapolation past 2²⁴ rows holds on the real
    event loop (77M events/s at 512²)."""
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene

    return make_scene(volume.sphere_volume(512),
                      transfer.gray_ramp(alpha_scale=0.8),
                      pack=True, pack_dtype=jnp.bfloat16, tf_mxu=True)


#: config name -> (scene builder, steps, frames, extinction)
CONFIGS = {
    "headline-srgb-auto/steps32": (headline_scene, 32, 15, 40.0),
    "headline-srgb-auto/steps8": (headline_scene, 8, 30, 40.0),
    "legacy-float/steps32": (legacy_scene, 32, 15, 40.0),
    "sparse256-auto/steps32": (sparse_scene, 32, 10, 100.0),
    "dense256-srgb-auto/steps32": (dense256_scene, 32, 10, 40.0),
    "dense512/steps8": (dense512_scene, 8, 10, 40.0),
}


def run_config(name: str) -> dict:
    builder, steps, frames, ext = CONFIGS[name]
    ev, pa = time_config(builder(), steps=steps, frames=frames,
                         extinction=ext)
    return {"config": name, "events_per_s": round(ev), "paths_per_s":
            round(pa), "mean_path_events": round(ev / max(pa, 1.0), 3)}


def _forward_roofline_fields(events_per_s: float, config) -> dict:
    """Forward roofline for the headline config (benchmarks/roofline.py):
    measured HBM stream + MXU + gather-engine ceilings, the event traffic
    model, and the achieved fractions."""
    from benchmarks import roofline
    from vpt_tpu.renderers import mcm

    builder, steps, _, ext = config
    scene = builder()
    params = mcm.Params(extinction=ext, anisotropy=0.3, steps=steps)
    state = mcm.reset(params, 512, 512, scene)
    hbm = roofline.measure_hbm_gbps()
    mxu = roofline.measure_matmul_tflops()
    table = (scene.tracking_packed if scene.tracking_packed is not None
             else scene.volume_packed)
    g_ns = roofline.measure_gather_ns(int(table.shape[0]),
                                      lanes=int(table.shape[-1]))
    return roofline.forward_roofline(events_per_s, state, scene,
                                     hbm, mxu, g_ns)


def _backward_roofline_fields() -> dict:
    """Backward roofline at the headline's 128³ scale: measured grad
    events/s through the folded differentiable estimator vs the
    gather+scatter op bound and the HBM stream bound."""
    from benchmarks import backward as bwd_mod
    from benchmarks import roofline
    from vpt_tpu import sampling

    vol_n = 128
    fold = sampling.scatter_fold_log2(vol_n ** 3, 8, vol_n)
    rows, lanes = (vol_n ** 3) >> fold, 8 << fold
    row = bwd_mod.bench(512, vol_n, 8, 2, "folded", iters=3)
    hbm = roofline.measure_hbm_gbps()
    g_ns = roofline.measure_gather_ns(rows, lanes=lanes)
    s_ns = roofline.measure_scatter_ns(rows, lanes=lanes)
    out = roofline.backward_roofline(row["value"], rows, lanes, hbm,
                                     g_ns, s_ns)
    out["config"] = row["config"]
    return out


def check_mode() -> int:
    """Regression gate: re-measure the committed baseline configs and flag
    drops beyond the tunnel-variance band."""
    with open(BASELINE_TABLE) as f:
        table = json.load(f)
    band = table["variance_band"]
    failures = []
    for name, base in table["configs"].items():
        row = run_config(name)
        print(json.dumps(row), file=sys.stderr)
        for key in ("events_per_s", "paths_per_s"):
            floor = base[key] * (1.0 - band)
            if row[key] < floor:
                failures.append(
                    f"{name}.{key}: {row[key]:.3g} < {floor:.3g} "
                    f"(baseline {base[key]:.3g} - {band:.0%})")
    if failures:
        print("REGRESSION:\n  " + "\n  ".join(failures), file=sys.stderr)
        return 1
    print("# bench --check: all configs within the variance band",
          file=sys.stderr)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="regression gate vs benchmarks/bench_baseline.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    probe_backend()
    if args.check:
        return check_mode()

    # Two event budgets: steps=8 is the reference's UI default
    # (MCMRenderer.js steps=8); steps=32 amortizes per-frame launch overhead
    # over a 4x larger event batch (+7-9%, BENCH_NOTES.md) and is the
    # production setting for converging a still image.  The headline is the
    # best sustained event rate; other configs go to stderr.
    rates = {}
    scene = headline_scene()
    for name in ("headline-srgb-auto/steps8", "headline-srgb-auto/steps32"):
        _, steps, frames, ext = CONFIGS[name]
        rates[steps] = time_config(scene, steps=steps, frames=frames,
                                   extinction=ext)
        ev, pa = rates[steps]
        print(f"# steps={steps}: {ev / 1e6:.1f}M events/s, "
              f"{pa / 1e6:.1f}M paths/s "
              f"(mean path length {ev / max(pa, 1.0):.2f} events)",
              file=sys.stderr)

    best_steps = max(rates, key=lambda s: rates[s][0])
    events_per_s, paths_per_s = rates[best_steps]
    baseline_per_chip = 1e9 / 8.0  # north-star aggregate / v5p-16 chips
    headline = {
        "metric": "mcm_events_per_s",
        "value": round(events_per_s),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / baseline_per_chip, 4),
        "paths_per_s": round(paths_per_s),
        "paths_vs_baseline": round(paths_per_s / baseline_per_chip, 4),
        "mean_path_events": round(events_per_s / max(paths_per_s, 1.0), 3),
    }

    # roofline fields (VERDICT r3 #2): the headline rate as a fraction of
    # the MEASURED chip ceilings — the gather-engine bound (the binding
    # resource) and the HBM stream bound — plus the backward pass at the
    # same scale.  Failures here must not void the headline metric.
    try:
        headline["roofline"] = _forward_roofline_fields(
            events_per_s, CONFIGS["headline-srgb-auto/steps32"])
    except Exception as exc:  # noqa: BLE001
        print(f"# roofline (forward) failed: {exc}", file=sys.stderr)
    try:
        headline["roofline_bwd"] = _backward_roofline_fields()
    except Exception as exc:  # noqa: BLE001
        print(f"# roofline (backward) failed: {exc}", file=sys.stderr)
    print(json.dumps(headline), flush=True)

    # secondary configs (stderr; failures here must not void the headline)
    for name in ("legacy-float/steps32", "sparse256-auto/steps32",
                  "dense256-srgb-auto/steps32", "dense512/steps8"):
        try:
            print("# " + json.dumps(run_config(name)), file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# secondary config {name} failed: {exc}",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
