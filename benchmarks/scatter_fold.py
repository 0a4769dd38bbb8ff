"""Can the scatter-add cliff be dodged by folding the corner table to
fewer, wider rows?

Scatter-add of a zero-padded wide row is exact: fold the (R, 8) corner
table to (R/F, 8*F), expand each 8-lane update into a one-hot-masked
8*F-lane row, and scatter R/F-row wide rows instead of R-row narrow ones.
If scatter cost tracks total row count (like the gather floor) and wide
rows stay cheap below the cliff, this trades VPU expansion work for
scatter rows.

All variants run *in-loop* (fori_loop carry accumulation) — the shape the
reverse-of-scan actually executes — since standalone scatters pay an extra
table copy (benchmarks/scatter_cost.py: 85-97 vs 43 ns/row in-loop).

Run: python benchmarks/scatter_fold.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


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

    rng = np.random.default_rng(0)
    n = args.n

    def timeit(fn, *xs):
        v = np.asarray(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(*xs)
        np.asarray(v)
        return (time.perf_counter() - t0) / args.iters

    print(f"# in-loop scatter-add, n={n} updates/iter x 8 iters, f32")
    print(f"# {'layout':>24s} {'ns/row(update)':>15s}")

    for rows_log2 in (18, 21, 24):
        rows = 1 << rows_log2
        idx = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
        g = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

        @jax.jit
        def narrow(idx, g, rows=rows):
            def body(i, acc):
                return acc.at[(idx + i) % rows].add(g)
            return jax.lax.fori_loop(
                0, 8, body, jnp.zeros((rows, 8), jnp.float32))[0, 0]

        t = timeit(narrow, idx, g)
        print(f"  {f'2^{rows_log2} x 8 (narrow)':>24s} "
              f"{t / (8 * n) * 1e9:15.2f}")

        for fold_log2 in (3, 6):
            frows = rows >> fold_log2
            lanes = 8 << fold_log2
            if frows < (1 << 12):
                continue
            eye = jnp.eye(1 << fold_log2, dtype=jnp.float32)

            @jax.jit
            def wide(idx, g, rows=rows, frows=frows, lanes=lanes,
                     fold_log2=fold_log2, eye=eye):
                def body(i, acc):
                    j = (idx + i) % rows
                    hi = j >> fold_log2
                    sub = j & ((1 << fold_log2) - 1)
                    mask = jnp.take(eye, sub, axis=0)      # (n, F)
                    upd = (mask[:, :, None] * g[:, None, :]).reshape(
                        -1, lanes)                          # (n, 8F)
                    return acc.at[hi].add(upd)
                return jax.lax.fori_loop(
                    0, 8, body, jnp.zeros((frows, lanes), jnp.float32))[0, 0]

            t = timeit(wide, idx, g)
            print(f"  {f'2^{rows_log2 - fold_log2} x {lanes} (fold {1 << fold_log2})':>24s} "
                  f"{t / (8 * n) * 1e9:15.2f}")


if __name__ == "__main__":
    main()
