"""Hand-fused cotangent-expand → wide-row scatter-add probe at the
fold-16 backward layout (VERDICT r4 #3).

The 256³ backward's unattributed mass is XLA materialization boundaries
around the one-hot expand + scatter-add (BENCH_NOTES "Backward-pass
accounting": +14.6 ns/event — the (262144, 128) expanded cotangent rows
round-trip HBM before the scatter consumes them).  The r3 Mosaic dead
end that blocked a Pallas fusion was an 8-LANE DMA alignment rejection;
the fold-16 update rows are 128-lane — exactly the tiling Mosaic
accepts — so this probe builds the fused kernel at its own layout and
measures it:

- per update j: row = idx>>4, sub = idx&15; DMA-read the 128-lane table
  row into VMEM, add the 8-lane cotangent at lanes [8·sub, 8·sub+8)
  (VPU iota-select — no dynamic lane slicing, which Mosaic lacks), and
  DMA-write it back.  The TPU grid is sequential and each update's RMW
  completes before the next starts, so duplicate rows accumulate
  correctly (unlike a batched-DMA variant, which would race).
- baseline: the production XLA path — one-hot expansion to (N, 128)
  followed by a wide-row scatter-add (26.0 ns/update measured on-chip,
  benchmarks/scatter_bwd_probe.py).

Arithmetic expectation: the r2 DMA gather measured ~335 ns per issued
row on this toolchain (benchmarks/pallas_gather.py); a read-modify-write
needs TWO DMAs per update, so the serial-correct kernel is expected at
~700 ns/update — a refutation by measurement unless the toolchain's DMA
issue cost has collapsed.  Run it anyway: that is the ask.

Run: python benchmarks/pallas_scatter_bwd.py [--platform cpu]
(cpu = interpret mode, correctness only)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_fused_scatter(rows, block, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = 128

    def kernel(idx_ref, ct_ref, table_ref, dummy_ref, out_table_ref,
               sem):
        del table_ref             # aliased with out_table_ref; use that
        i = pl.program_id(0)

        def body(scratch):
            lane = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
            for j in range(block):
                packed = idx_ref[i * block + j]
                row = packed >> 4
                sub = packed & 15
                rd = pltpu.make_async_copy(
                    out_table_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(0, 1), :], sem)
                rd.start()
                rd.wait()
                acc = scratch[pl.ds(0, 1), :]
                for k in range(8):
                    acc = acc + jnp.where(lane == sub * 8 + k,
                                          ct_ref[j, k], 0.0)
                scratch[pl.ds(0, 1), :] = acc
                wr = pltpu.make_async_copy(
                    scratch.at[pl.ds(0, 1), :],
                    out_table_ref.at[pl.ds(row, 1), :], sem)
                wr.start()
                wr.wait()

        pl.run_scoped(body, pltpu.VMEM((1, lanes), jnp.float32))
        # the aliased table IS the real output; the dummy gives the
        # block pipeline something block-mapped to emit
        dummy_ref[0] = jnp.int32(0)

    @jax.jit
    def scatter(idx, ct, table):
        n = idx.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((block, 8), lambda i, idx: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        _, table = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((1,), jnp.int32),
                       jax.ShapeDtypeStruct((rows, 128), jnp.float32)),
            input_output_aliases={2: 1},
            interpret=interpret,
        )(idx, ct, table)
        return table

    return scatter


def xla_baseline():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scatter(idx, ct, table):
        sub = idx & 15
        onehot = (sub[:, None] == jnp.arange(16, dtype=jnp.int32))
        wide = (onehot[..., None].astype(jnp.float32)
                * ct[:, None, :]).reshape(idx.shape[0], 128)
        return table.at[idx >> 4].add(wide)

    return scatter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rows-log2", type=int, default=20)
    ap.add_argument("--n", type=int, default=1 << 15)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    interpret = (args.platform == "cpu")
    rows = 1 << args.rows_log2
    n = args.n
    if interpret:
        rows, n, args.iters = 1 << 8, 1 << 7, 1
    rng = np.random.default_rng(0)
    table0 = jnp.zeros((rows, 128), jnp.float32)
    idx = jnp.asarray(rng.integers(0, rows * 16, n, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    fused = make_fused_scatter(rows, args.block, interpret=interpret)
    base = xla_baseline()

    def bench(fn, label):
        out = fn(idx, ct, table0)
        np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(idx, ct, table0)
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:16s} {dt / n * 1e9:8.2f} ns/update", flush=True)
        return np.asarray(out)

    want = bench(base, "xla-scatter")
    got = bench(fused, "pallas-fused")
    print("match:", np.allclose(got, want, atol=1e-4))


if __name__ == "__main__":
    main()
