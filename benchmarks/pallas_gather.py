"""Async-DMA row-gather Pallas kernel prototype (VERDICT r1 "Next round"
#5): the one untried route past the XLA gather engine's per-row cost.

The kernel scalar-prefetches the row indices, and per grid step issues B
independent HBM->VMEM ``pltpu.make_async_copy`` DMAs (one per requested
row, B outstanding), waits, and lets the pipeline write the block back.
Measures ns/row against ``jnp.take`` on the same table.

Arithmetic expectation (why this is probably a dead end): each DMA issue
costs fixed scalar-core work; the XLA gather engine already runs at
~4-12 ns/row, so the DMA route wins only if issue+sync amortizes below
that — plausible only for very wide rows.

Run: python benchmarks/pallas_gather.py [--platform cpu] (cpu = interpret)
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def make_dma_gather(rows, lanes, block, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        def body(scratch):
            dmas = []
            for j in range(block):
                row = idx_ref[i * block + j]
                dmas.append(pltpu.make_async_copy(
                    table_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(j, 1), :],
                    sems.at[j]))
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
            out_ref[:] = scratch[:]

        pl.run_scoped(body, pltpu.VMEM((block, lanes), jnp.float32))

    @jax.jit
    def gather(idx, table):
        n = idx.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, lanes), lambda i, idx: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((block,))],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
            interpret=interpret,
        )(idx, table)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rows-log2", type=int, default=21)
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    interpret = (args.platform == "cpu")
    rows = 1 << args.rows_log2
    if interpret:
        rows, args.n, args.iters = 1 << 10, 1 << 8, 1
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(rows, args.lanes)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, args.n, dtype=np.int32))

    gather = make_dma_gather(rows, args.lanes, args.block,
                             interpret=interpret)

    def bench(fn, label):
        out = fn(idx, table)
        ref = np.asarray(out[:4, :2])  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(idx, table)
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:16s} {dt / args.n * 1e9:8.2f} ns/row")
        return np.asarray(out)

    got = bench(gather, "pallas-dma")
    want = bench(jax.jit(lambda i, t: jnp.take(t, i, axis=0)), "xla-take")
    print("match:", np.allclose(got, want, atol=1e-6))


if __name__ == "__main__":
    main()
