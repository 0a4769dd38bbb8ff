"""Tau/space sweep of occlusion completion on a saved config-3 fit.

Loads a fitted 256^3 volume (examples/config3_mcm256.py --save-fit),
sweeps the visibility threshold tau and the fill domain (log vs linear)
of vpt_tpu.inpaint.complete_occluded, and reports the truth-bucket MSE
table for each setting — the committed forensics behind the chosen
--inpaint default.  The completion itself touches no transport, so the
sweep costs seconds per setting.

Run: python benchmarks/inpaint_sweep.py --fit /tmp/fit_A.npz
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fit", required=True)
    ap.add_argument("--extinction", type=float, default=25.0)
    ap.add_argument("--taus", default="0.05,0.1,0.15,0.2,0.3,0.5,1",
                    help="thresholds to sweep; the r4 sweep measured a "
                         "broad optimum basin at [0.1, 0.2] (see "
                         "BENCH_NOTES.md) — masks from a fitted volume "
                         "need tau far below the tau≈1 'optically thick' "
                         "intuition because underfilled cores "
                         "under-report their own occlusion")
    ap.add_argument("--log-only", action="store_true",
                    help="skip the linear-domain fills (the first sweep "
                         "measured log-space strictly better at every tau)")
    ap.add_argument("--iters", type=int, default=1,
                    help="self-consistent iterations: recompute the "
                         "visibility mask from the COMPLETED volume and "
                         "refill (a fitted core is dim, so its own optical "
                         "depth under-reports occlusion; filling raises "
                         "the depth, which widens the unseen set toward "
                         "the mask the true volume would produce)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vpt_tpu import inpaint, volume

    fit = jnp.asarray(np.load(args.fit)["fit"])[..., 0]
    n = fit.shape[0]
    truth = np.asarray(volume.blobs_volume(n, seed=3, count=6)
                       .data[..., 0])
    edges = (0.0, 0.05, 0.3, 0.7, 1.0000001)

    def buckets(v):
        fv = np.asarray(v)
        return {f"[{lo:g},{min(hi, 1.0):g})":
                float(np.mean((fv - truth)[(truth >= lo)
                                           & (truth < hi)] ** 2))
                for lo, hi in zip(edges[:-1], edges[1:])}

    rows = [{"setting": "fitted", "total": float(np.mean(
        (np.asarray(fit) - truth) ** 2)), **buckets(fit)}]
    print(json.dumps(rows[0]))
    for tau in (float(t) for t in args.taus.split(",")):
        for log_space in ((True,) if args.log_only else (True, False)):
            t0 = time.perf_counter()
            filled = fit
            union = None
            for it in range(max(args.iters, 1)):
                filled, mask = inpaint.complete_occluded(
                    filled, extinction=args.extinction, tau=tau,
                    log_space=log_space)
                union = mask if union is None else (union | mask)
            row = {"setting": f"tau{tau:g}" + ("" if log_space
                                               else "+linear")
                   + (f"x{args.iters}" if args.iters > 1 else ""),
                   "filled_frac": round(float(union.mean()), 5),
                   "total": float(np.mean((np.asarray(filled)
                                           - truth) ** 2)),
                   "seconds": round(time.perf_counter() - t0, 1),
                   **buckets(filled)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    best = min(rows, key=lambda r: r["total"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
