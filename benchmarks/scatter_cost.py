"""Measure the scatter-add floor — the backward-pass analog of the gather
floor (BENCH_NOTES "The 256^3 gather floor").

The differentiable MC estimators pay one corner-table gather per event
forward and one scatter-add per event backward (the VJP of jnp.take);
benchmarks/backward.py measured bwd:fwd ~ 6 with in-graph packing.  This
benchmark isolates the scatter itself to answer:

1. ns/row of `table.at[idx].add(rows)` vs table size (is there a row-count
   cliff like the gather's 2^18 one?),
2. whether batching updates (one large scatter per frame instead of one
   small scatter per event) changes the per-row cost,
3. whether `mode='promise_in_bounds'`/`unique_indices` or a sort +
   segment_sum formulation beats the plain scatter,
4. the scatter:gather per-row ratio that explains the measured bwd:fwd.

Run: python benchmarks/scatter_cost.py [--platform cpu] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def timeit(fn, *xs):
        v = np.asarray(fn(*xs))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(*xs)
        np.asarray(v)  # sync (block_until_ready unreliable on the tunnel)
        return (time.perf_counter() - t0) / args.iters

    # -- 1+2: plain scatter-add, rows x batch sweep ------------------------
    print("# scatter-add ns/row: table.at[idx].add(g), f32 8-lane rows")
    print(f"# {'table rows':>12s} {'updates':>10s} {'ns/row':>8s} "
          f"{'gather ns/row':>14s}")
    for rows_log2 in (16, 18, 21, 24):
        rows = 1 << rows_log2
        for n in (262144, 2097152, 8388608):
            idx = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
            g = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
            table = jnp.zeros((rows, 8), jnp.float32)

            @jax.jit
            def scat(table, idx, g):
                return table.at[idx].add(g)

            @jax.jit
            def gath(table, idx):
                return jnp.sum(jnp.take(table, idx, axis=0))

            ts = timeit(lambda t, i, gg: scat(t, i, gg)[0, 0], table, idx, g)
            tg = timeit(gath, table, idx)
            print(f"  {rows:>12d} {n:>10d} {ts / n * 1e9:8.2f} "
                  f"{tg / n * 1e9:14.2f}")

    # -- 3: formulation variants at the MC shape ---------------------------
    rows, n = 1 << 21, 262144  # 128^3 corner table, one event's updates
    idx = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
    g = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    table = jnp.zeros((rows, 8), jnp.float32)

    @jax.jit
    def plain(table, idx, g):
        return table.at[idx].add(g)

    @jax.jit
    def in_bounds(table, idx, g):
        return table.at[idx].add(g, mode="promise_in_bounds")

    @jax.jit
    def sorted_seg(table, idx, g):
        order = jnp.argsort(idx)
        si = idx[order]
        sg_rows = g[order]
        return table + jax.ops.segment_sum(
            sg_rows, si, num_segments=rows, indices_are_sorted=True)

    @jax.jit
    def seg_unsorted(table, idx, g):
        return table + jax.ops.segment_sum(g, idx, num_segments=rows)

    print(f"# variants @ rows={rows}, n={n} (128^3 corner table, "
          f"one event's updates)")
    for name, fn in (("plain .at[].add", plain),
                     ("promise_in_bounds", in_bounds),
                     ("argsort+segment_sum(sorted)", sorted_seg),
                     ("segment_sum(unsorted)", seg_unsorted)):
        t = timeit(lambda *xs, f=fn: f(*xs)[0, 0], table, idx, g)
        print(f"  {name:30s} {t / n * 1e9:8.2f} ns/row")

    # -- 4: in-loop scatter (the shape the scan backward actually runs) ----
    # reverse-of-fori_loop accumulates the loop-invariant table cotangent:
    # per iteration, scatter into zeros then add into the carry.
    @jax.jit
    def loop_scatter(idx, g):
        def body(i, acc):
            j = (idx + i) % rows  # defeat hoisting
            return acc.at[j].add(g)
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((rows, 8),
                                                       jnp.float32))

    @jax.jit
    def loop_scatter_zeroinit(idx, g):
        def body(i, acc):
            j = (idx + i) % rows
            upd = jnp.zeros((rows, 8), jnp.float32).at[j].add(g)
            return acc + upd
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((rows, 8),
                                                       jnp.float32))

    for name, fn in (("in-loop .at[].add into carry", loop_scatter),
                     ("in-loop zeros.at[].add + dense +", loop_scatter_zeroinit)):
        t = timeit(lambda *xs, f=fn: f(*xs)[0, 0], idx, g)
        print(f"  {name:34s} {t / (8 * n) * 1e9:8.2f} ns/row")


if __name__ == "__main__":
    main()
