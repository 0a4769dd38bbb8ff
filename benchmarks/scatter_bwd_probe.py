"""Backward-scatter layout shootout at the 256³ scale (VERDICT r2 #2).

Measures, in-loop (fori_loop carry accumulation — the shape the
reverse-of-scan executes), every candidate layout for the event loop's
cotangent scatter-add of 8-lane corner-row updates into a 2^24-cell
volume table:

- ``fold16 onehot-expand+scatter`` — the production path: one-hot-expand
  the 8-lane cotangent into its 16-cell slot of a 128-lane row, scatter
  at 2^20 rows.  Measured 26.0 ns/update (19.4 for the scatter alone
  when updates are already wide).
- ``fold16 2D 8-lane scatter`` — per-update column starts instead of the
  expansion.  Measured 84.1 ns/update: XLA lowers the per-update column
  indices to a full (row, col)-indexed scatter with narrow-row cost.
- ``fold64 expand to 2^18x512`` — the VERDICT r2 #2 proposal.  Measured
  45.2 ns/update: the 4x expansion traffic exceeds any row-count saving
  (the r2 "scatter cliff" numbers were for 8-LANE rows; 128-lane rows at
  2^20 do not cliff).
- ``unfolded 2^24x8`` — 83.6 ns/update (the r2 cliff, reproduced).

Conclusion: the fold-16 layout is scatter-optimal at 256³; the backward's
remaining distance to the forward is the ~20 ns in-grad forward plus
~16 ns of residual/transpose overhead, not the scatter.

Run: python benchmarks/scatter_bwd_probe.py [--platform cpu] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=262144)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import probe_backend

    probe_backend()
    rng = np.random.default_rng(0)
    n = args.n
    cells = 1 << 24
    idx = jnp.asarray(rng.integers(0, cells, n, dtype=np.int32))
    ct8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    eye16 = jnp.eye(16, dtype=jnp.float32)
    eye64 = jnp.eye(64, dtype=jnp.float32)

    def timeit(fn, *xs):
        v = np.asarray(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(*xs)
        np.asarray(v)
        return (time.perf_counter() - t0) / args.iters

    @jax.jit
    def expand16(idx, ct8):
        def body(i, acc):
            j = (idx + i) & (cells - 1)
            hi, sub = j >> 4, j & 15
            mask = jnp.take(eye16, sub, axis=0)
            upd = (mask[:, :, None] * ct8[:, None, :]).reshape(-1, 128)
            return acc.at[hi].add(upd)
        return jax.lax.fori_loop(
            0, 8, body, jnp.zeros((cells >> 4, 128), jnp.float32))[0, 0]

    @jax.jit
    def scatter2d(idx, ct8):
        cols = jnp.arange(8, dtype=jnp.int32)
        def body(i, acc):
            j = (idx + i) & (cells - 1)
            hi, sub = j >> 4, j & 15
            cidx = sub[:, None] * 8 + cols[None, :]
            return acc.at[hi[:, None], cidx].add(ct8)
        return jax.lax.fori_loop(
            0, 8, body, jnp.zeros((cells >> 4, 128), jnp.float32))[0, 0]

    @jax.jit
    def expand64(idx, ct8):
        def body(i, acc):
            j = (idx + i) & (cells - 1)
            hi, sub = j >> 6, j & 63
            mask = jnp.take(eye64, sub, axis=0)
            upd = (mask[:, :, None] * ct8[:, None, :]).reshape(-1, 512)
            return acc.at[hi].add(upd)
        return jax.lax.fori_loop(
            0, 8, body, jnp.zeros((cells >> 6, 512), jnp.float32))[0, 0]

    @jax.jit
    def unfolded(idx, ct8):
        def body(i, acc):
            return acc.at[(idx + i) & (cells - 1)].add(ct8)
        return jax.lax.fori_loop(
            0, 8, body, jnp.zeros((cells, 8), jnp.float32))[0, 0]

    for name, fn in (("fold16 onehot-expand+scatter (2^20x128)", expand16),
                     ("fold16 2D 8-lane scatter", scatter2d),
                     ("fold64 expand to 2^18x512", expand64),
                     ("unfolded 2^24x8", unfolded)):
        print(f"  {name}: {timeit(fn, idx, ct8) / (8 * n) * 1e9:.1f} "
              "ns/update", flush=True)


if __name__ == "__main__":
    main()
