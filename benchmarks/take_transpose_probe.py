"""Why does the real 256³ backward's table-cotangent path cost ~41 ns/event
when the synthetic expand+scatter floor is 26?  (VERDICT r3 #3, closing the
accounting: grad_cost.py shows bwd − fwd = 41.4 ns/event and that ALL of it
is the table-cotangent path — gradenv ≈ 0.2 ns.)

This probe rebuilds the take→select→lerp→reduce chain exactly as the event
loop consumes it — a lax.scan whose transpose carries the (2^20, 128) f32
cotangent — and toggles one structural factor at a time:

- ``mode``: jnp.take's default "clip" vs "promise_in_bounds" (the gather's
  transpose inherits the mode; a guarded scatter may lose the fast path —
  production indices are in-bounds by construction, sampling.py clamps)
- ``index coherence``: uniform-random (the scatter_bwd_probe distribution)
  vs ray-coherent duplicates (real MCM events revisit cells; TPU
  scatter-add serializes colliding rows)
- ``combine``: plain select+lerp transposes vs the fused _select_trilerp

Run: python benchmarks/take_transpose_probe.py [--platform cpu] [--iters 5]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n", type=int, default=262144)   # 512^2 rays
    ap.add_argument("--steps", type=int, default=32)   # 8 events x 4 frames
    ap.add_argument("--only", default="all",
                    choices=("all", "matrix", "emulate"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import lax

    from bench import probe_backend
    from vpt_tpu import sampling

    probe_backend()
    rng = np.random.default_rng(0)
    n, steps = args.n, args.steps
    cells = 1 << 24                                    # 256^3
    table = jnp.asarray(rng.normal(size=(cells >> 4, 128))
                        .astype(np.float32))

    idx_uniform = rng.integers(0, cells, (steps, n), dtype=np.int32)
    # ray-coherent: contiguous pixel blocks sample nearby cells, with the
    # heavy duplication a converged camera distance produces (~16 rays/cell)
    base = rng.integers(0, cells // 16, (steps, n // 256), dtype=np.int32)
    jitter = rng.integers(0, 64, (steps, n), dtype=np.int32)
    idx_coherent = ((np.repeat(base, 256, axis=1) * 16 + jitter)
                    % cells).astype(np.int32)
    f = jnp.asarray(rng.uniform(0.01, 0.99, (steps, n, 3))
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=(steps, n)).astype(np.float32))

    def make_loss(mode, fused):
        def loss(tab, idx_all):
            def body(acc, x):
                idx, fi, wi = x
                rows = tab.at[idx >> 4].get(mode=mode)
                if fused:
                    out = sampling._select_trilerp(rows, idx & 15, fi,
                                                   16, 1)[..., 0]
                else:
                    wide = rows.reshape(-1, 16, 8)
                    onehot = (idx[:, None] & 15
                              == jnp.arange(16, dtype=jnp.int32))
                    r8 = jnp.sum(wide * onehot[..., None]
                                 .astype(wide.dtype), axis=-2)
                    out = sampling._trilerp_chain(
                        r8[..., None], fi)[..., 0]
                return acc + jnp.sum(out * wi), None

            acc, _ = lax.scan(body, jnp.float32(0.0), (idx_all, f, w))
            return acc
        return loss

    def timeit(fn, *xs):
        def sync(v):
            # slice ON DEVICE first — np.asarray of the full (2^20, 128)
            # gradient would drag 512 MB through the tunnel per call
            leaf = jax.tree_util.tree_leaves(v)[0]
            np.asarray(leaf.reshape(-1)[:1])
        sync(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(*xs)
        sync(v)
        return (time.perf_counter() - t0) / args.iters

    for mode in (() if args.only == "emulate"
                 else ("clip", "promise_in_bounds")):
        for coh_name, idx_np in (("uniform", idx_uniform),
                                 ("coherent", idx_coherent)):
            idx_all = jnp.asarray(idx_np)
            for fused in (False, True):
                loss = make_loss(mode, fused)
                fwd = jax.jit(loss)
                bwd = jax.jit(jax.grad(loss, argnums=0))
                t_f = timeit(fwd, table, idx_all)
                t_b = timeit(bwd, table, idx_all)
                per = (t_b - t_f) / (steps * n) * 1e9
                print(f"  mode={mode:18s} idx={coh_name:8s} "
                      f"fused={str(fused):5s}  fwd "
                      f"{t_f / (steps * n) * 1e9:5.1f} ns/ev  "
                      f"bwd-fwd {per:6.1f} ns/ev", flush=True)

    # ---- event-machine emulation: add the REAL loop's transposed
    # structures one at a time over the same take chain, so the components
    # of the real 41.4 ns/event backward sum up (grad_cost.py shows the
    # fused/score/TF deltas are ~1.5 ns total and gradenv ~0 — the mass is
    # in the table-cotangent path as it exists INSIDE the event machine,
    # not in the isolated chain above) ------------------------------------
    u = jnp.asarray(rng.uniform(0.0, 1.0, (steps, n)).astype(np.float32))
    idx_all = jnp.asarray(idx_coherent)

    sg = jax.lax.stop_gradient

    @jax.custom_vjp
    def _ladder_consolidated(alpha, ui):
        p_null = 1.0 - alpha
        p_scatter = jnp.where(ui > 0.9, 0.0, alpha * 0.8)
        p_absorb = 1.0 - p_null - p_scatter
        absorb = ui < p_absorb
        scatter = (~absorb) & (ui < p_absorb + p_scatter)
        return jnp.where(absorb, p_absorb,
                         jnp.where(scatter, p_scatter, p_null))

    def _ladder_fwd(alpha, ui):
        return _ladder_consolidated(alpha, ui), (alpha, ui)

    def _ladder_bwd(res, ct):
        alpha, ui = res
        live = ui <= 0.9
        ps = jnp.where(live, 0.8, 0.0)         # d p_scatter / d alpha
        pa = 1.0 - ps                          # d p_absorb / d alpha (1-ps)
        p_absorb = jnp.where(live, alpha * 0.2, alpha)
        p_scatter = jnp.where(live, alpha * 0.8, 0.0)
        absorb = ui < p_absorb
        scatter = (~absorb) & (ui < p_absorb + p_scatter)
        d = jnp.where(absorb, pa, jnp.where(scatter, ps, -1.0))
        return (d * ct, jnp.zeros_like(ui))

    _ladder_consolidated.defvjp(_ladder_fwd, _ladder_bwd)

    def make_emulated(level):
        def loss(tab, idx_all):
            def body(carry, x):
                acc, trans = carry
                idx, fi, wi, ui = x
                rows = tab.at[idx >> 4].get(mode="clip")
                wide = rows.reshape(-1, 16, 8)
                onehot = (idx[:, None] & 15
                          == jnp.arange(16, dtype=jnp.int32))
                r8 = jnp.sum(wide * onehot[..., None]
                             .astype(wide.dtype), axis=-2)
                alpha = sampling._trilerp_chain(r8[..., None], fi)[..., 0]
                if level == 0:          # E0: chain only
                    return (acc + jnp.sum(alpha * wi), trans), None
                if level == 3:          # E1b: custom-vjp consolidation
                    contrib = _ladder_consolidated(alpha, ui)
                    return (acc + jnp.sum(contrib * wi), trans), None
                # E1: + the classify ladder (p's, masks, selects)
                p_null = 1.0 - alpha
                p_scatter = jnp.where(ui > 0.9, 0.0, alpha * 0.8)
                p_absorb = 1.0 - p_null - p_scatter
                absorb = ui < p_absorb
                scatter = (~absorb) & (ui < p_absorb + p_scatter)
                if level == 4:          # E1c: select-free mask arithmetic
                    ab = sg(absorb.astype(jnp.float32))
                    sc = sg(scatter.astype(jnp.float32))
                    contrib = p_null + ab * (p_absorb - p_null) \
                        + sc * (p_scatter - p_null)
                    return (acc + jnp.sum(contrib * wi), trans), None
                if level == 1:
                    contrib = jnp.where(absorb, p_absorb,
                                        jnp.where(scatter, p_scatter,
                                                  p_null))
                    return (acc + jnp.sum(contrib * wi), trans), None
                if level == 2:
                    # E2: + the multiplicative transmittance recurrence and
                    # the deposit running mean (the carried chains)
                    trans = jnp.where(scatter, trans * alpha, trans)
                    deposit = absorb
                    r_new = jnp.where(deposit, trans * wi, 0.0)
                    acc = acc + (r_new - acc) \
                        * jnp.where(deposit, 0.25, 0.0)
                    trans = jnp.where(deposit, 1.0, trans)
                    return (acc, trans), None
                raise ValueError(level)

            (acc, trans), _ = lax.scan(
                body, (jnp.zeros((n,), jnp.float32),
                       jnp.ones((n,), jnp.float32)),
                (idx_all, f, w, u))
            return jnp.sum(acc) + 0.0 * jnp.sum(trans)
        return loss

    def make_full_machine():
        """E3: the full diff_mc per-event θ-chain at real channel count —
        4-channel sampled color, 3-channel tint recurrence, logw score
        chain (log/exp of ratio weights), deposit running mean with sample
        counter, reset plumbing.  Everything diff_mc transposes, minus the
        RNG/geometry (θ-independent)."""
        def loss(tab, idx_all):
            def body(carry, x):
                rad, trans, lw, cnt = carry
                idx, fi, wi, ui = x
                rows = tab.at[idx >> 4].get(mode="clip")
                wide = rows.reshape(-1, 16, 8)
                onehot = (idx[:, None] & 15
                          == jnp.arange(16, dtype=jnp.int32))
                r8 = jnp.sum(wide * onehot[..., None]
                             .astype(wide.dtype), axis=-2)
                alpha = sampling._trilerp_chain(r8[..., None], fi)[..., 0]
                col = jnp.stack([alpha * 0.9, alpha * 0.8, alpha * 0.7],
                                axis=-1)
                p_null = 1.0 - alpha
                p_scatter = jnp.where(ui > 0.9, 0.0,
                                      alpha * jnp.max(col, axis=-1))
                p_absorb = 1.0 - p_null - p_scatter
                absorb = ui < sg(p_absorb)
                scatter = (~absorb) & (ui < sg(p_absorb + p_scatter))
                deposit = absorb
                p_taken = jnp.where(absorb, p_absorb,
                                    jnp.where(scatter, p_scatter, p_null))
                p_taken = jnp.maximum(p_taken, 1e-8)
                lw = lw + jnp.log(p_taken / sg(p_taken))
                w8w = jnp.exp(lw)
                r_new = jnp.where(deposit[..., None],
                                  trans * w8w[..., None], 0.0)
                cnt = jnp.where(deposit, cnt + 1.0, cnt)
                rad = jnp.where(
                    deposit[..., None],
                    rad + (r_new - rad)
                    / jnp.maximum(cnt, 1.0)[..., None], rad)
                trans = jnp.where(
                    deposit[..., None], 1.0,
                    jnp.where(scatter[..., None], trans * col, trans))
                lw = jnp.where(deposit, 0.0, lw)
                return (rad, trans, lw, cnt), None

            z = jnp.zeros((n,), jnp.float32)
            (rad, trans, lw, cnt), _ = lax.scan(
                body, (jnp.zeros((n, 3), jnp.float32),
                       jnp.ones((n, 3), jnp.float32), z, z),
                (idx_all, f, w, u))
            return jnp.sum(rad ** 2) + 0.0 * (jnp.sum(trans)
                                              + jnp.sum(lw))
        return loss

    if args.only == "matrix":
        return
    for level, name in ((0, "E0 chain-only (scalar acc)"),
                        (1, "E1 + classify ladder"),
                        (3, "E1b ladder via custom-vjp"),
                        (4, "E1c ladder select-free"),
                        (2, "E2 + trans recurrence + deposits"),
                        (5, "E3 full machine (rgb+logw+reset)")):
        loss = make_full_machine() if level == 5 else make_emulated(level)
        fwd = jax.jit(loss)
        bwd = jax.jit(jax.grad(loss, argnums=0))
        t_f = timeit(fwd, table, idx_all)
        t_b = timeit(bwd, table, idx_all)
        per = (t_b - t_f) / (steps * n) * 1e9
        print(f"  {name:34s} fwd {t_f / (steps * n) * 1e9:5.1f} ns/ev  "
              f"bwd-fwd {per:6.1f} ns/ev", flush=True)


if __name__ == "__main__":
    main()
