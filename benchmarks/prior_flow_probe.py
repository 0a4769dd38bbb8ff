"""Frozen-shell prior-flow probe for config-3's occluded-core null space.

VERDICT r3 #1 asks whether a smoothness prior / regularized
parametrization can extend config 3's recovered shell into the 1.1% of
voxels (blob cores) that radiance measurements provably do not constrain
(BENCH_NOTES.md "config-3 null space").  The r4 first sweep measured that
curv/tv priors applied at the native 256^3 stage denoise the shell but
leave the core bucket unmoved — this probe isolates WHY, without paying
transport: it freezes every data-constrained voxel to truth (the
limiting case of a perfectly recovered shell) and runs the exact Adam
schedule of examples/config3_mcm256.py on the prior alone, so the only
question left is *can this prior family, under this parametrization and
step budget, move a ~0.4-deficit core at all?*

Mechanistic prediction being tested: Adam's update magnitude is bounded
by the learning rate, so the final stage (160 steps, cosine from 5e-4)
bounds total per-voxel motion to ~0.05 « the 0.4 core deficit — no
final-stage-only prior can fill the cores REGARDLESS of family or
weight.  The coarse stages (300 steps at 3e-3) have ~0.9 of motion
budget; a prior applied from 32^3 (--prior-from 32 in the example) can.

Because the shell is frozen, Adam makes the flow invariant to the prior
weight — the probe calibrates family/schedule/parametrization
reachability; the weight (prior-vs-data balance) is calibrated by the
hot run.

Run: python benchmarks/prior_flow_probe.py            (TPU)
     python benchmarks/prior_flow_probe.py --platform cpu --quick
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# the example's coarse-to-fine schedule: (grid, steps, adam lr0)
STAGES = [(32, 300, 3e-3), (64, 200, 1.5e-3), (128, 150, 8e-4),
          (256, 160, 5e-4)]

_STEP_CACHE = {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="64^3 native grid (CPU-feasible sanity run)")
    ap.add_argument("--configs", default=(
        "final-raw-curv,final-pyr-curv,ms-raw-curv,ms-raw-logcurv"),
        help="comma list of scope-param-family; scope 'final' = native "
             "stage only, 'ms' = every stage (the --prior-from 32 "
             "multiscale variant); family also accepts 'lap'/'loglap' "
             "(biharmonic: mean(lap^2), whose minimizer is exactly the "
             "quadratic cap — in log space, exactly the Gaussian "
             "continuation of the shell's value+slope)")
    ap.add_argument("--lr-mult", type=float, default=1.0,
                    help="scale every stage lr (convergence probe)")
    ap.add_argument("--steps-mult", type=float, default=1.0,
                    help="scale every stage step count (convergence probe)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from examples.config3_mcm256 import box_blur, resize_volume
    from vpt_tpu import volume

    n = 64 if args.quick else 256
    stages = ([(16, 40, 3e-3), (n, 30, 5e-4)] if args.quick
              else STAGES)
    truth = volume.blobs_volume(n, seed=3, count=6).data
    init = jnp.clip(0.55 * box_blur(truth, 13), 0.0, 1.0)
    truth_np = np.asarray(truth[..., 0])
    core_np = truth_np >= 0.7

    def buckets(vol):
        fv = np.asarray(vol[..., 0])
        out = {}
        for lo, hi, tag in ((0.3, 0.7, "mid"), (0.7, 1.01, "core")):
            m = (truth_np >= lo) & (truth_np < hi)
            out[tag] = float(np.mean((fv - truth_np)[m] ** 2))
        return out

    def penalty(v, family):
        # curv/logcurv identical to examples/config3_mcm256.loss_fn;
        # lap/loglap is the biharmonic penalty mean(lap^2) (EL equation
        # lap^2 v = 0: satisfied by any quadratic, so the inpainted core
        # is the quadratic — in log space, Gaussian — continuation of the
        # frozen shell's value AND slope; unlike harmonic fill it is not
        # bounded by the boundary max)
        v = v[..., 0]
        if family in ("logcurv", "loglap"):
            v = jnp.log(jnp.maximum(v, 0.01))
        lap = sum(jnp.roll(v, -1, a) + jnp.roll(v, 1, a) - 2.0 * v
                  for a in range(3))
        if family in ("lap", "loglap"):
            return jnp.mean(lap ** 2)
        return sum(jnp.mean((jnp.roll(lap, -1, a) - lap) ** 2)
                   for a in range(3))

    def get_step(grid, family, param):
        """One compiled Adam step per (grid, family, param) — lr traced,
        so every stage/config with the same shape shares the compile
        (per-call jit wrappers are poison on the remote-compile tunnel)."""
        key = (grid, family, param)
        if key in _STEP_CACHE:
            return _STEP_CACHE[key]
        opt = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))

        def loss(theta, tr, core):
            if param == "pyr":
                v = jnp.clip(sum(resize_volume(c, grid)
                                 for c in theta.values()), 0.0, 1.0)
            else:
                v = theta
            v_eff = jnp.where(core, v, tr)  # data pins the shell exactly
            return penalty(v_eff, family)

        @jax.jit
        def step(theta, opt_state, tr, core, lr):
            g = jax.grad(loss)(theta, tr, core)
            up, opt_state = opt.update(g, opt_state)
            theta = jax.tree.map(lambda t, u: t + lr * u, theta, up)
            if param != "pyr":
                theta = jnp.clip(theta, 0.0, 1.0)
            return theta, opt_state
        _STEP_CACHE[key] = (step, opt)
        return _STEP_CACHE[key]

    results = []
    for cfg in args.configs.split(","):
        scope, param, family = cfg.split("-")
        v = init
        t0 = time.perf_counter()
        rows = {"config": cfg, "init": buckets(init)}
        for grid, steps0, lr00 in stages:
            steps = max(1, int(steps0 * args.steps_mult))
            lr0 = lr00 * args.lr_mult
            tr = resize_volume(truth, grid)
            core = resize_volume(truth, grid)[..., 0:1] >= 0.7
            v = jnp.clip(resize_volume(v, grid), 0.0, 1.0)
            active = scope == "ms" or grid == stages[-1][0]
            if not active:
                # inactive stage: data alone — shell snaps to truth,
                # cores keep the (resized) init, matching the measured
                # pipeline behavior (cores are a data null space)
                v = jnp.where(core, v, tr)
                continue
            use_pyr = param == "pyr" and grid == stages[-1][0]
            if use_pyr:
                levels, lv = [], 32 if grid >= 32 else grid
                while lv <= grid:
                    levels.append(lv)
                    lv *= 2
                downs = {l: resize_volume(v, l) for l in levels}
                theta = {f"l{l:04d}": (downs[l] if i == 0 else
                                       downs[l] - resize_volume(
                                           downs[levels[i - 1]], l))
                         for i, l in enumerate(levels)}
            else:
                theta = v
            step, opt = get_step(grid, family, "pyr" if use_pyr else "raw")
            opt_state = opt.init(theta)
            sched = optax.cosine_decay_schedule(lr0, steps, alpha=0.05)
            for s in range(steps):
                theta, opt_state = step(theta, opt_state, tr, core,
                                        jnp.float32(sched(s)))
            if use_pyr:
                v = jnp.clip(sum(resize_volume(c, grid)
                                 for c in theta.values()), 0.0, 1.0)
            else:
                v = theta
            v = jnp.where(core, v, tr)
            up = resize_volume(v, n)
            b = buckets(jnp.where(jnp.asarray(core_np)[..., None],
                                  up, truth))
            rows[f"{grid}^3"] = b
            print(f"  {cfg} [{grid}^3/{steps}st/lr{lr0:g}] "
                  f"core={b['core']:.4f} mid={b['mid']:.5f}", flush=True)
        rows["seconds"] = round(time.perf_counter() - t0, 1)
        results.append(rows)
        print(f"{cfg}: init core {rows['init']['core']:.4f} -> "
              f"final {b['core']:.4f}  ({rows['seconds']}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
