"""Benchmark: MCM photon-event throughput on the flagship renderer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: null-collision tracking events per second for the MCM renderer
(pixels × steps × frames / wall time) on one chip — the reference publishes
no numbers (BASELINE.md), so vs_baseline is measured against the north-star
target of 1e9 rays/s aggregate on a v5p-16 (8 chips) => 1.25e8 events/s/chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene, mcm

    height = width = 512
    steps = 8
    vol = volume.sphere_volume(128)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    # bf16 corner tables: ~4x faster gathers; 8-bit-mantissa table precision,
    # comparable to the reference's R8/SRGB8 GL texture formats.
    # tf_mxu: 1D TF lookup as a one-hot MXU matmul instead of an HBM gather
    # (same 8-bit-fraction precision class; ~2x the TF-gather speed)
    scene = make_scene(vol, tf, pack_dtype=jnp.bfloat16, tf_mxu=True)
    params = mcm.Params(extinction=40.0, anisotropy=0.3, steps=steps)

    state = mcm.reset(params, height, width, scene)
    frame_fn = jax.jit(mcm.render_frame, donate_argnums=(0,))

    def sync(s):
        # device→host copy forces completion (block_until_ready does not
        # reliably block on tunneled PJRT backends)
        import numpy as np
        return np.asarray(s["samples"][:1, :1])

    # warmup / compile
    state = frame_fn(state, scene, params, jnp.float32(0.123), jnp.int32(1))
    sync(state)

    frames = 30
    t0 = time.perf_counter()
    for i in range(frames):
        state = frame_fn(state, scene, params,
                         jnp.float32(0.2 + 0.001 * i), jnp.int32(i + 2))
    sync(state)
    dt = time.perf_counter() - t0

    events_per_s = height * width * steps * frames / dt
    baseline_per_chip = 1e9 / 8.0  # north-star aggregate / v5p-16 chips
    print(json.dumps({
        "metric": "mcm_events_per_s",
        "value": round(events_per_s),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
