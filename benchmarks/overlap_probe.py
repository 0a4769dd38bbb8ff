"""Forward gather/VPU overlap probe (VERDICT r4 #6).

The MCM forward runs at 0.75 of the pure-gather ceiling because each
event's logic serially follows its own gather (next index depends on
this event): per event, cost ≈ gather (4-6 ns) + TF-MXU/VPU logic
(~2 ns).  The chains of DIFFERENT photons are independent, though — so
splitting the pixel grid into two half-batches and running both events
inside one fori_loop body gives XLA's scheduler the freedom to overlap
half A's gather with half B's event logic (and vice versa), without
changing any per-pixel stream: the op sequence per photon is identical,
only the loop body's instruction-level parallelism changes.

This probe measures the standard machine against the two-half body on
the same scene (512², 128³ bf16+MXU — the headline config) and reports
both against the measured pure-gather bound.  A null result is the
floor-proof the VERDICT asked for; a win is free throughput.

Run: python benchmarks/overlap_probe.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def two_half_render_frame(scene, params, height, width):
    """The MCM frame with the pixel grid split into two independent
    half-batches per loop iteration — same per-pixel op sequence and RNG
    streams as mcm.render_frame, different instruction schedule."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vpt_tpu import rng, sampling
    from vpt_tpu.renderers import mcm

    ndc = sampling.pixel_ndc(height, width)
    inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)
    hh = height // 2
    ndcs = (ndc[:hh], ndc[hh:])

    @jax.jit
    def frame(state, scene, params, seed):
        mapped = ndc * 0.5 + 0.5
        rstate = rng.seed_pixels(mapped, jnp.asarray(seed, jnp.float32))
        halves = []
        for part, nd in zip((slice(None, hh), slice(hh, None)), ndcs):
            halves.append(({k: v[part] for k, v in state.items()},
                           rstate[part], nd))

        def event(_, carry):
            out = []
            for (ph, rs, nd) in carry:
                rs, pos = mcm.flight_phase(ph, rs, params, False, None)
                vs = scene.sample_color(pos)
                ph, rs = mcm.interact_phase(ph, rs, pos, vs, None, scene,
                                            params, nd, inv_res, False)
                out.append((ph, rs, nd))
            return tuple(out)

        halves = lax.fori_loop(0, params.steps, event, tuple(halves))
        return {k: jnp.concatenate([halves[0][0][k], halves[1][0][k]])
                for k in state}

    return frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from bench import probe_backend
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import make_scene, mcm

    if args.platform != "cpu":
        probe_backend()
    size = args.size
    scene = make_scene(volume.sphere_volume(128),
                       transfer.gray_ramp(alpha_scale=0.8),
                       pack_dtype=jnp.bfloat16, tf_mxu=True)
    params = mcm.Params(extinction=40.0, anisotropy=0.3,
                        steps=args.steps)

    def run(frame_fn, label, state):
        st = frame_fn(state, scene, params, jnp.float32(0.1))
        np.asarray(st["samples"][:1, :1])
        t0 = time.perf_counter()
        for i in range(args.frames):
            st = frame_fn(st, scene, params,
                          jnp.float32(0.2 + 0.001 * i))
        np.asarray(st["samples"][:1, :1])
        dt = time.perf_counter() - t0
        ev = size * size * args.steps * args.frames / dt
        print(json.dumps({"variant": label,
                          "events_per_s": round(ev / 1e6, 1),
                          "ns_per_event": round(1e9 / ev, 2)}),
              flush=True)
        return st

    state0 = mcm.reset(params, size, size, scene)

    std = jax.jit(lambda st, sc, p, s: mcm.render_frame(
        st, sc, p, s, jnp.int32(1)))
    st_a = run(std, "standard", state0)

    halves = two_half_render_frame(scene, params, size, size)
    st_b = run(halves, "two-half", mcm.reset(params, size, size, scene))

    # the two variants are the same machine: identical committed state
    same = all(bool(jnp.array_equal(st_a[k], st_b[k])) for k in st_a)
    print(json.dumps({"streams_identical": same}), flush=True)


if __name__ == "__main__":
    main()
