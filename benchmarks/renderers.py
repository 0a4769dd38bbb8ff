"""Per-renderer frame throughput on one chip.

Times one progressive frame of each of the eight renderer families at the
reference's default 512² resolution and prints one JSON line per renderer.
The reference's implicit interactive budget is one rAF tick (~16 ms) per
progressive sample (SURVEY.md §6); `within_budget` marks renderers that
beat it on this chip.

Usage: python benchmarks/renderers.py [--frames 20] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_renderer(key: str, size: int, frames: int,
                   lao_baked: bool = False) -> dict:
    from vpt_tpu import transfer, volume
    from vpt_tpu.renderers import factory, make_scene

    vol = volume.sphere_volume(128)
    if lao_baked:
        # opt-in (value, |grad|) fast mode: 1 volume tap replaces 7/slice
        vol = volume.with_lao_gradient(vol)
    tf = transfer.gray_ramp(alpha_scale=0.8)
    scene = make_scene(vol, tf, pack_dtype=jnp.bfloat16, tf_mxu=True)
    if lao_baked:
        from vpt_tpu.renderers import lao

        renderer = factory.make_renderer(
            key, params=lao.Params(baked_gradient=True),
            height=size, width=size)
    else:
        renderer = factory.make_renderer(key, height=size, width=size)
    renderer.reset(scene)

    def sync():
        leaf = jax.tree_util.tree_leaves(renderer.state)[0]
        return np.asarray(leaf.ravel()[:1])

    renderer.render(scene, 0.123)   # compile + warm
    sync()
    t0 = time.perf_counter()
    for i in range(frames):
        renderer.render(scene, 0.2 + 0.001 * i)
    sync()
    ms = (time.perf_counter() - t0) / frames * 1e3
    return {
        "renderer": key + ("+baked" if lao_baked else ""),
        "ms_per_frame": round(ms, 2),
        "fps": round(1000.0 / ms, 1),
        "within_budget": ms <= 16.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--only", default=None,
                    help="comma-separated renderer keys (default: all)")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu - the "
                         "JAX_PLATFORMS env var is pinned at interpreter "
                         "startup on this machine and has no effect)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import probe_backend

    probe_backend()
    from vpt_tpu.renderers import factory

    keys = args.only.split(",") if args.only else list(factory.MODULES)
    for key in keys:
        print(json.dumps(bench_renderer(key, args.size, args.frames)),
              flush=True)
        if key == "lao":
            print(json.dumps(bench_renderer(key, args.size, args.frames,
                                            lao_baked=True)), flush=True)


if __name__ == "__main__":
    main()
