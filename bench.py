"""Benchmark: MCM throughput on the flagship renderer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Two rates are measured and reported (BENCH_NOTES.md "Metric definitions"):

- **events/s** — null-collision tracking events (pixels × steps × frames /
  wall time): the machine-throughput measure; every event costs one volume
  gather + VPU event logic regardless of the scene.
- **paths/s** — completed photon paths (growth of the per-pixel ``samples``
  counters / wall time): the "rays/s" of the north-star target.  Scene-
  dependent (mean path length = events/paths varies with opacity), so it is
  reported alongside, not instead.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` divides
events/s by the north-star 1e9 rays/s aggregate on a v5p-16 (8 chips)
=> 1.25e8 per chip; ``paths_vs_baseline`` is the stricter ratio using
completed paths as the ray metric.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def probe_backend(retries: int = 3, delay_s: float = 20.0) -> None:
    """Tiny matmul with bounded retry: the tunneled TPU backend sometimes
    stalls for long stretches — probe before timing so a hung tunnel fails
    fast (and loudly) instead of polluting the measurement."""
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


def time_config(scene, steps: int, frames: int,
                height: int = 512, width: int = 512) -> tuple[float, float]:
    """Returns (events/s, paths/s) for one MCM config."""
    from vpt_tpu.renderers import mcm

    params = mcm.Params(extinction=40.0, anisotropy=0.3, steps=steps)
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


def main():
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene

    probe_backend()

    vol = volume.sphere_volume(128)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    # bf16 corner tables: ~4x faster gathers; 8-bit-mantissa table precision,
    # comparable to the reference's R8/SRGB8 GL texture formats.
    # tf_mxu: 1D TF lookup as a one-hot MXU matmul instead of an HBM gather
    # (same 8-bit-fraction precision class; ~2x the TF-gather speed)
    scene = make_scene(vol, tf, pack_dtype=jnp.bfloat16, tf_mxu=True)

    # Two event budgets: steps=8 is the reference's UI default
    # (MCMRenderer.js steps=8); steps=32 amortizes per-frame launch overhead
    # over a 4x larger event batch (+7-9%, BENCH_NOTES.md) and is the
    # production setting for converging a still image.  The headline is the
    # best sustained event rate; the other config goes to stderr.
    rates = {s: time_config(scene, steps=s, frames=f)
             for s, f in ((8, 30), (32, 15))}
    for s, (ev, pa) in rates.items():
        print(f"# steps={s}: {ev / 1e6:.1f}M events/s, "
              f"{pa / 1e6:.1f}M paths/s "
              f"(mean path length {ev / max(pa, 1.0):.2f} events)",
              file=sys.stderr)

    best_steps = max(rates, key=lambda s: rates[s][0])
    events_per_s, paths_per_s = rates[best_steps]
    baseline_per_chip = 1e9 / 8.0  # north-star aggregate / v5p-16 chips
    print(json.dumps({
        "metric": "mcm_events_per_s",
        "value": round(events_per_s),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / baseline_per_chip, 4),
        "paths_per_s": round(paths_per_s),
        "paths_vs_baseline": round(paths_per_s / baseline_per_chip, 4),
        "mean_path_events": round(events_per_s / max(paths_per_s, 1.0), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
