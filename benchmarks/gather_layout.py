"""Measure the gather-engine cost of table row LAYOUT above the 2^18-row
cliff (VERDICT r1 missing #1 / BENCH_NOTES "config sweep": 256^3 volumes
halve MCM throughput because the 16M-row corner table leaves the fast
gather regime).

Hypothesis tested: above the cliff the cost tracks the *page working set*
of the touched rows, so brick tiling / Morton order should restore the
floor for clustered photon clouds.

RESULT (v5e tunnel chip, 2026-08-18): **disproven** — all layouts and all
index distributions measure identically (~11.9 ns/row at 2^24 rows); a
follow-up sweep showed the per-row cost is a function of the table's total
row count only (BENCH_NOTES.md "The 256³ gather floor").  Kept as the
measurement artifact.

Run: python benchmarks/gather_layout.py [--platform cpu] [--size 256]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def bit_spread3(v):
    """Spread the low 10 bits of int32 v so there are two zero bits between
    each (x -> x2x1x0 -> x2 0 0 x1 0 0 x0): the Morton interleave step."""
    import jax.numpy as jnp

    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.int32(0x030000FF)
    v = (v | (v << 8)) & jnp.int32(0x0300F00F)
    v = (v | (v << 4)) & jnp.int32(0x030C30C3)
    v = (v | (v << 2)) & jnp.int32(0x09249249)
    return v


def morton3(x, y, z):
    return bit_spread3(x) | (bit_spread3(y) << 1) | (bit_spread3(z) << 2)


def brick_index(x, y, z, size, blog2):
    """Row index in a brick-tiled layout: (size/B)^3 bricks of B^3 voxels,
    each brick contiguous; B = 1 << blog2."""
    b = blog2
    nb = size >> b
    mask = (1 << b) - 1
    block = ((z >> b) * nb + (y >> b)) * nb + (x >> b)
    local = (((z & mask) << b | (y & mask)) << b) | (x & mask)
    return (block << (3 * b)) | local


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", type=int, default=256,
                    help="cube side (rows = size^3)")
    ap.add_argument("--n", type=int, default=512 * 512 * 8,
                    help="indices per gather (events per frame equivalent)")
    ap.add_argument("--radius", type=float, default=0.15,
                    help="photon-cloud radius as a fraction of the cube")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    size, n = args.size, args.n
    rows = size ** 3
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(rows, 8)).astype(np.float32),
        jnp.bfloat16)

    # clustered "photon cloud" voxel coordinates (ball around the center)
    rng = np.random.default_rng(1)
    while True:
        pts = rng.uniform(-1, 1, (2 * n, 3))
        pts = pts[(pts ** 2).sum(1) <= 1.0][:n]
        if len(pts) == n:
            break
    vox = np.clip((0.5 + args.radius * pts) * size, 0,
                  size - 1).astype(np.int32)
    x, y, z = (jnp.asarray(vox[:, i]) for i in range(3))
    uniform = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))

    linear = (z * size + y) * size + x
    variants = {
        "uniform-random": (uniform, None),
        "cloud-linear": (linear, None),
        "cloud-brick32": (brick_index(x, y, z, size, 5), None),
        "cloud-brick16": (brick_index(x, y, z, size, 4), None),
        "cloud-morton": (morton3(x, y, z), None),
        # index math fused in-loop (what the sampler would actually pay)
        "cloud-brick32+math": (linear, "brick"),
        "cloud-morton+math": (linear, "morton"),
    }

    def make_bench(idx, math_mode):
        @jax.jit
        def run(idx, table):
            def body(i, acc):
                j = (idx + i) % rows  # defeat hoisting; keeps locality
                if math_mode == "brick":
                    xx, yy, zz = j % size, (j // size) % size, \
                        j // (size * size)
                    j = brick_index(xx, yy, zz, size, 5)
                elif math_mode == "morton":
                    xx, yy, zz = j % size, (j // size) % size, \
                        j // (size * size)
                    j = morton3(xx, yy, zz)
                r = jnp.take(table, j, axis=0)
                return acc + jnp.sum(r.astype(jnp.float32))
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0))
        return run

    print(f"# rows={rows / 1e6:.1f}M, n={n / 1e6:.2f}M indices/gather, "
          f"8 gathers/iter, bf16 8-lane rows")
    for name, (idx, math_mode) in variants.items():
        run = make_bench(idx, math_mode)
        v = float(np.asarray(run(idx, table)))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = float(np.asarray(run(idx, table)))
        dt = time.perf_counter() - t0
        ns_per_row = dt / (args.iters * 8 * n) * 1e9
        print(f"{name:22s} {ns_per_row:6.2f} ns/row   (sum={v:.1f})")


if __name__ == "__main__":
    main()
