"""Resident-photon ray handoff: the single-chip-measurable cost model.

One real chip exists here, so the resident machine's pod economics are
assembled from three measurable pieces plus one published constant
(VERDICT r4 #1's asked-for pricing):

1. ``--mode machinery`` (TPU): the pool-machinery tax.  A space=1 mesh
   runs the FULL resident frame — pool layout, per-round sort/group/
   grant/scatter/merge, a degenerate all_to_all — with zero actual
   migration, against the replicated machine on the same scene.  The
   events/s gap is the per-event overhead every resident chip pays
   regardless of traffic.
2. ``--mode crossing`` (CPU virtual mesh, real volume): migration
   traffic.  The resident machine's own ``migrated`` counters give the
   exact per-event crossing fraction for S ∈ {2,4,8} slabs on the bench
   scene families (crossing depends on scene/extinction/slab thickness,
   not image size, so a small image suffices).
3. ``--mode rowcost`` (TPU): ns per migrated row for the on-chip half of
   a migration (scatter into the send buffer + merge scatter out of the
   receive buffer) at production pool sizes.
4. The wire cost is modeled from the published v5p ICI bandwidth
   (projection.py): row bytes ≈ 4 B × 23 lanes ≈ 92 B → negligible vs
   the on-chip sort/scatter at any measured crossing fraction.

projection.resident_projection composes these into the v5p-16 column
next to DP-replicated and halo (docs/SCALING.md).

Usage: python benchmarks/resident_probe.py --mode machinery|crossing|rowcost
       [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def mode_machinery(args):
    """Resident frame at space=1 (no migration possible) vs the
    replicated machine: the pool tax in events/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import probe_backend, time_config
    from vpt_tpu.parallel import make_mesh
    from vpt_tpu.parallel.resident import (
        resident_render_frame, resident_reset,
    )
    from vpt_tpu.renderers import make_scene, mcm
    from vpt_tpu import transfer, volume

    probe_backend()
    size = args.size
    for vol_n in (128, 256):
        scene = make_scene(volume.sphere_volume(vol_n),
                           transfer.gray_ramp(alpha_scale=0.8),
                           pack_dtype=jnp.bfloat16, tf_mxu=True)
        ev_rep, _ = time_config(scene, steps=args.steps,
                                frames=args.frames, height=size,
                                width=size)

        mesh = make_mesh(1, axes=("data", "space"), space=1)
        params = mcm.Params(extinction=40.0, anisotropy=0.3,
                            steps=args.steps)
        k = size * size
        for div, mig in ((16, 1), (16, 4), (16, 8), (8, 1), (1, 1)):
            pool = resident_reset(scene, params, size, size, mesh, 1)
            frame_fn, tables = resident_render_frame(
                mesh, scene, 1, size, size, fanout=k // div,
                migrate_every=mig)

            def sync(p):
                return float(np.asarray(jnp.sum(p["samples"])))

            pool = frame_fn(pool, tables, params, jnp.float32(0.123),
                            jnp.int32(1))
            sync(pool)
            t0 = time.perf_counter()
            for i in range(args.frames):
                pool = frame_fn(pool, tables, params,
                                jnp.float32(0.2 + 0.001 * i),
                                jnp.int32(i + 2))
            sync(pool)
            dt = time.perf_counter() - t0
            ev_res = size * size * args.steps * args.frames / dt
            print(json.dumps({
                "mode": "machinery", "volume": vol_n, "image": size,
                "steps": args.steps, "fanout": k // div,
                "migrate_every": mig,
                "replicated_events_per_s": round(ev_rep / 1e6, 1),
                "resident_s1_events_per_s": round(ev_res / 1e6, 1),
                "pool_tax_ns_per_event": round(
                    1e9 / ev_res - 1e9 / ev_rep, 2),
            }), flush=True)


def mode_crossing(args):
    """Exact migration fractions from the resident machine's own
    counters on the virtual CPU mesh, real volumes."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from benchmarks.tracking_bench import sparse_ball
    from vpt_tpu.parallel import make_mesh
    from vpt_tpu.parallel.resident import (
        resident_render_frame, resident_reset,
    )
    from vpt_tpu.renderers import make_scene, mcm
    from vpt_tpu import transfer, volume

    n_dev = len(jax.devices())
    size = args.size
    scenes = {
        "sphere128_ext40": (make_scene(
            volume.sphere_volume(128),
            transfer.gray_ramp(alpha_scale=0.8),
            pack_dtype=jnp.bfloat16, tf_mxu=True), 40.0),
        "sparse256_ext100": (make_scene(
            sparse_ball(256), transfer.gray_ramp(alpha_scale=0.5),
            pack_dtype=jnp.bfloat16, tf_mxu=True), 100.0),
    }
    for name, (scene, ext) in scenes.items():
        for space in (2, 4, 8):
            if space > n_dev:
                continue
            for interleave in (1, 4):
                mesh = make_mesh(space, axes=("data", "space"),
                                 space=space)
                params = mcm.Params(extinction=ext, anisotropy=0.3,
                                    steps=args.steps)
                pool = resident_reset(scene, params, size, size, mesh,
                                      space, interleave=interleave)
                frame_fn, tables = resident_render_frame(
                    mesh, scene, space, size, size,
                    interleave=interleave)
                for i in range(args.frames):
                    pool = frame_fn(pool, tables, params,
                                    jnp.float32(0.1 + 0.001 * i),
                                    jnp.int32(i + 1))
                events = size * size * args.steps * args.frames
                moved = int(np.asarray(pool["migrated"]).sum())
                occ = np.asarray(pool["occupied"]).sum(axis=-1)  # (1, S)
                print(json.dumps({
                    "mode": "crossing", "scene": name, "space": space,
                    "interleave": interleave,
                    "events": events, "migrated_rows": moved,
                    "crossing_fraction": round(moved / events, 4),
                    "stalled": int(np.asarray(pool["stalled"]).sum()),
                    "occupancy_end": occ.ravel().tolist(),
                    "imbalance_end": round(
                        float(occ.max())
                        / max(float(occ.mean()), 1.0), 3),
                }), flush=True)


def mode_rowcost(args):
    """ns per migrated row of the on-chip migration halves: scatter K
    rows into an (S, fanout) send buffer + merge back — the sort/group
    cost is in the machinery tax; this isolates marginal traffic cost."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import probe_backend

    probe_backend()
    lanes = 23                                # the pool row in f32 lanes
    for k in (1 << 15, 1 << 18):
        for frac in (0.05, 0.25):
            m = int(k * frac)
            rows = jnp.arange(k * lanes, dtype=jnp.float32) \
                .reshape(k, lanes)
            idx = jnp.asarray(
                np.random.default_rng(0).permutation(k)[:m], jnp.int32)

            @jax.jit
            def move(rows, idx):
                buf = jnp.zeros((k + 1, lanes), jnp.float32)
                buf = buf.at[idx].set(jnp.take(rows, idx, axis=0))
                back = rows.at[idx].set(jnp.take(buf, idx, axis=0))
                return back

            out = move(rows, idx)
            np.asarray(out[:1, :1])
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                out = move(out, idx)
            np.asarray(out[:1, :1])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "mode": "rowcost", "pool": k, "moved": m,
                "ns_per_moved_row": round(dt / iters / m * 1e9, 1),
            }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["machinery", "crossing", "rowcost"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.size is None:
        args.size = 64 if args.mode == "crossing" else 512
    if args.mode == "crossing" and args.platform == "cpu" \
            and "host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        print("# hint: XLA_FLAGS=--xla_force_host_platform_device_count=8",
              file=sys.stderr)
    {"machinery": mode_machinery, "crossing": mode_crossing,
     "rowcost": mode_rowcost}[args.mode](args)


if __name__ == "__main__":
    main()
