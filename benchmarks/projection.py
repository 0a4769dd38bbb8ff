"""v5p pod projection: predicted aggregate throughput and 1→N efficiency
from measured per-chip rates + compiled collective counts + published chip
constants (VERDICT r3 #2; the quantified form of BASELINE.md's "≥10⁹
rays/s aggregate on v5p-16" and "≥85% scaling efficiency" targets, which
this single-chip environment cannot measure directly).

Every function here is closed-form arithmetic over three input classes —
the model itself is unit-tested (tests/test_roofline.py):

- **measured inputs** (this repo, v5e-lite tunnel chip): per-chip event /
  path rates (benchmarks/bench_baseline.json), the gather-engine cost
  curve (BENCH_NOTES.md "The 256³ gather floor"), the non-gather event
  overhead (benchmarks/event_cost.py ablation);
- **structural inputs** (benchmarks/collectives.py HLO accounting): the
  data-parallel MCM frame compiles to ZERO collectives; the halo-sharded
  frame compiles to exactly ONE all-reduce of the masked sample per event;
  the bucketed train step to one permute chain per bucket;
- **published chip constants** (Google Cloud v5p specs): HBM3 2765 GB/s /
  95 GiB per chip, ICI 4800 Gbit/s per chip across a 3D torus (3 axes × 2
  directions → ~200 GB/s per torus axis bidirectional), 459 bf16 TFLOP/s.

Two per-chip-rate scenarios bracket the v5p unknowns (the gather engine's
per-row cost on v5p is not public and cannot be measured here):

- ``"v5e-floor"``: a v5p chip gathers no faster than the measured v5e-lite
  curve — a deliberate lower bound (v5p has 3.4× the HBM bandwidth and a
  far larger MXU, and the gather engine scales with the memory system);
- ``"hbm-scaled"``: per-row cost shrinks by the HBM bandwidth ratio
  2765/819 ≈ 3.4× — the customary first-order estimate for a
  memory-system-bound primitive.

The recipe to replace this model with measurements the day a pod exists:
``python benchmarks/scaling.py --mesh data=N`` (data-parallel, expect
≈100%) and ``--mesh data=K,space=S`` (halo-sharded) on the real mesh, then
``python bench.py`` per chip count for the 1→N table.
"""

from __future__ import annotations

import bisect
import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Published per-chip constants (see module docstring for sources)."""
    name: str
    hbm_gbps: float           # HBM read+write stream bandwidth
    ici_axis_gbps: float      # per-torus-axis bidirectional ICI bandwidth
    bf16_tflops: float


#: Google Cloud published v5p numbers: 2765 GB/s HBM3, 4800 Gbit/s ICI per
#: chip over a 3D torus (= 600 GB/s aggregate, ~200 GB/s per axis), 459
#: bf16 TFLOP/s.
V5P = ChipSpec("v5p", hbm_gbps=2765.0, ici_axis_gbps=200.0,
               bf16_tflops=459.0)

#: The tunnel chip's measured ceilings (BENCH_NOTES.md; HBM measured by
#: benchmarks/roofline.py triad, matmul by its bf16 probe).
V5E_LITE = ChipSpec("v5e-lite (measured)", hbm_gbps=819.0,
                    ici_axis_gbps=0.0, bf16_tflops=9.0)


@dataclasses.dataclass(frozen=True)
class GatherCurve:
    """Measured per-row gather cost as a function of table row count —
    piecewise-linear in log2(rows) between the measured points, flat
    extrapolation beyond them (BENCH_NOTES.md "The 256³ gather floor":
    cost is a function of TOTAL ROW COUNT ONLY; layout, index
    distribution, dtype and ≤64-lane width all measured no-ops)."""
    #: (log2(rows), ns/row) — the measured v5e-lite points
    points: tuple = ((16, 4.1), (18, 4.8), (20, 5.7), (21, 5.7),
                     (22, 12.0), (24, 13.1))
    #: non-gather event cost: MXU one-hot TF 1.1 + VPU event logic 0.9
    #: (benchmarks/event_cost.py ablation)
    overhead_ns: float = 2.0
    #: speedup applied to the per-row cost (1.0 = the measured chip;
    #: 2765/819 for the hbm-scaled v5p scenario)
    speedup: float = 1.0

    def row_ns(self, rows: int) -> float:
        import math

        lg = math.log2(max(rows, 2))
        pts = self.points
        if lg <= pts[0][0]:
            ns = pts[0][1]
        elif lg >= pts[-1][0]:
            ns = pts[-1][1]
        else:
            i = bisect.bisect_left([p[0] for p in pts], lg)
            (x0, y0), (x1, y1) = pts[i - 1], pts[i]
            ns = y0 + (y1 - y0) * (lg - x0) / (x1 - x0)
        return ns / self.speedup

    def event_ns(self, rows: int) -> float:
        return self.row_ns(rows) + self.overhead_ns / self.speedup


MEASURED_V5E_CURVE = GatherCurve()
HBM_SCALED_V5P_CURVE = GatherCurve(speedup=V5P.hbm_gbps
                                   / V5E_LITE.hbm_gbps)


def dp_replicated(n_chips: int, per_chip_events_per_s: float,
                  mean_path_events: float) -> dict:
    """Data-parallel MCM with the volume replicated: the compiled frame
    loop contains ZERO collectives (benchmarks/collectives.py — pixels
    shard over `data`, every chip owns its photon rows outright), so the
    only cross-chip dependency is the once-per-display image gather.
    Efficiency is 1.0 by construction of the compiled program; the honest
    caveat is per-frame host dispatch, which the donated on-device state
    already amortizes on one chip."""
    agg = n_chips * per_chip_events_per_s
    return {
        "strategy": "data-parallel, volume replicated",
        "n_chips": n_chips,
        "aggregate_events_per_s": agg,
        "aggregate_paths_per_s": agg / mean_path_events,
        "efficiency": 1.0,
        "collectives_per_event": 0,
    }


def spatial_sharded(n_chips: int, space: int, pixels: int,
                    dims: tuple, curve: GatherCurve, chip: ChipSpec,
                    mean_path_events: float,
                    psum_bytes_per_pixel: float = 16.0) -> dict:
    """Halo-sharded MCM (parallel/halo.py): the volume's corner table
    splits into ``space`` z-slabs; every event ends in ONE all-reduce of
    the ownership-masked sample over the space axis (collectives.py: 1
    all-reduce, in-loop).  Pixels shard over the remaining
    ``data = n_chips / space`` axis.

    Cost model per pixel-event on one chip:
    - compute: the event cost at the PER-SLAB table size (this is the
      entire point — a 2²⁴-row table at 13 ns/row becomes eight 2²¹-row
      tables at ~6 ns/row);
    - communication: a ring all-reduce of ``psum_bytes_per_pixel`` (the
      RGBA f32 sample) moves 2·(S−1)/S · bytes per chip over one torus
      axis, NOT overlappable (the classified sample gates the branch).

    The duplication factor is explicit: all ``space`` chips evaluate the
    event logic for every pixel in their data shard (ownership masking),
    so aggregate events/s = data · 1/t_event — spatial sharding buys
    per-event latency and table capacity, not event-logic parallelism.
    Efficiency is reported against n_chips × the single-chip rate at the
    FULL table size (the honest 1→N metric for this strategy)."""
    if n_chips % space:
        raise ValueError("space must divide n_chips")
    d, h, w = dims
    table_rows = d * h * w
    data = n_chips // space
    # per-slab corner table: D/S z planes + one halo plane (halo.py)
    slab_rows = (d // space + 1) * h * w
    comp_ns = curve.event_ns(slab_rows)
    comm_ns = (2.0 * (space - 1) / space * psum_bytes_per_pixel
               / chip.ici_axis_gbps) if space > 1 else 0.0
    event_ns = comp_ns + comm_ns
    agg = data * 1e9 / event_ns
    single_chip = 1e9 / curve.event_ns(table_rows)
    return {
        "strategy": f"halo-sharded, space={space}, data={data}",
        "n_chips": n_chips,
        "slab_rows": slab_rows,
        "comp_ns_per_event": comp_ns,
        "psum_ns_per_event": comm_ns,
        "aggregate_events_per_s": agg,
        "aggregate_paths_per_s": agg / mean_path_events,
        "efficiency": agg / (n_chips * single_chip),
        "collectives_per_event": 1,
    }


def resident_sharded(n_chips: int, space: int, pixels: int,
                     dims: tuple, curve: GatherCurve, chip: ChipSpec,
                     mean_path_events: float,
                     imbalance: float = 1.25,
                     crossing_fraction: float = 0.14,
                     pool_tax_k1_ns: float = 43.0,
                     migrate_every: int = 8,
                     row_bytes: float = 92.0,
                     round_latency_us: float = 5.0) -> dict:
    """Resident-photon MCM (parallel/resident.py): photons live on their
    slab's owner and boundary crossers migrate as rows, so the space axis
    divides the event WORK (unlike halo's ownership-mask replication) and
    every chip gathers from its slab-local table.

    All structural inputs are r5 single-chip/virtual-mesh MEASUREMENTS
    (benchmarks/resident_probe.py):
    - ``pool_tax_k1_ns``: the machinery tax of one exchange round at the
      production fanout (--mode machinery: 43 ns/event at k=1,
      measured 15.1 at k=4 and 8.5 at k=8 — i.e. ≈ tax/k + ~3);
    - ``migrate_every`` (k): events per exchange; crossers park up to
      k−1 events, so delivered-event efficiency is
      η = (1 − (1−f)^k)/(f·k) with f the crossing fraction;
    - ``crossing_fraction`` / ``imbalance``: the machine's own counters
      on the virtual mesh with real volumes (--mode crossing; cyclic
      interleave m=4 + OOB spreading: f 0.14–0.23 / B 1.1–1.3, or
      m=1: f 0.06–0.11 / B 1.6–2.2).

    Cost per chip per inner step: B/S of the group's photons ×
    (slab-table event + tax/k), discounted by η; wire adds
    f·row_bytes·2/ICI per event plus the per-round collective latency
    (1 all_to_all + 2 grant all_gathers)."""
    if n_chips % space:
        raise ValueError("space must divide n_chips")
    d, h, w = dims
    data = n_chips // space
    group = pixels // data
    k = migrate_every
    f = crossing_fraction
    eta = (1.0 - (1.0 - f) ** k) / (f * k) if f > 0 else 1.0
    k_eff = imbalance * group / space
    slab_rows = (d // space + 1) * h * w
    tax = pool_tax_k1_ns / k + (3.0 if k > 1 else 0.0)
    wire_ns = (2.0 * row_bytes / chip.ici_axis_gbps * f
               if space > 1 else 0.0)
    slot_ns = curve.event_ns(slab_rows) + tax + wire_ns
    round_ns = k_eff * k * slot_ns + round_latency_us * 1e3
    delivered = group * eta * k                  # events per round
    agg = data * delivered * 1e9 / round_ns
    single_chip = 1e9 / curve.event_ns(d * h * w)
    return {
        "strategy": (f"resident-photon, space={space}, data={data}, "
                     f"k={k}"),
        "n_chips": n_chips,
        "slab_rows": slab_rows,
        "k_eff_slots": k_eff,
        "delivered_fraction": eta,
        "slot_ns": slot_ns,
        "aggregate_events_per_s": agg,
        "aggregate_paths_per_s": agg / mean_path_events,
        "efficiency": agg / (n_chips * single_chip),
        "collectives_per_exchange": 3,  # all_to_all + 2 grant all_gathers
    }


def grad_allreduce_efficiency(grad_bytes: float, n_chips: int,
                              step_time_s: float, chip: ChipSpec,
                              overlap_fraction: float = 0.8) -> dict:
    """Bucketed gradient all-reduce (parallel/overlap.py): ring all-reduce
    moves 2·(N−1)/N · grad_bytes per chip per step; bucketing overlaps
    ``overlap_fraction`` of it with the backward compute (the measured
    HLO shows one per-bucket permute chain — collectives.py).  Efficiency
    = step_time / (step_time + exposed communication)."""
    comm_s = 2.0 * (n_chips - 1) / n_chips * grad_bytes \
        / (chip.ici_axis_gbps * 1e9)
    exposed = comm_s * (1.0 - overlap_fraction)
    return {
        "comm_s_per_step": comm_s,
        "exposed_s_per_step": exposed,
        "efficiency": step_time_s / (step_time_s + exposed),
    }


def v5p16_projection(headline_events_per_s: float = 180.7e6,
                     headline_mean_path: float = 1.391,
                     dense256_events_per_s: float = 79.9e6,
                     dense256_mean_path: float = 1.390,
                     dense512_events_per_s: float = 77.0e6,
                     dense512_mean_path: float = 1.505) -> dict:
    """The committed projection table for docs/SCALING.md: BASELINE.md's
    v5p-16 (8 chips) targets from this repo's measured per-chip rates.
    Defaults are the committed bench_baseline.json rates."""
    out = {}
    for scen, curve, scale in (
            ("v5e-floor", MEASURED_V5E_CURVE, 1.0),
            ("hbm-scaled", HBM_SCALED_V5P_CURVE,
             V5P.hbm_gbps / V5E_LITE.hbm_gbps)):
        # 128³ headline, replicated DP (the north-star configuration)
        dp128 = dp_replicated(8, headline_events_per_s * scale,
                              headline_mean_path)
        # 256³ milestone, replicated DP
        dp256 = dp_replicated(8, dense256_events_per_s * scale,
                              dense256_mean_path)
        # 256³ milestone, halo-sharded space=8 (per-slab tables fall to
        # ~2²¹ rows — the capacity/latency mode)
        sp256 = spatial_sharded(8, 8, 1024 * 1024, (256, 256, 256), curve,
                                V5P, dense256_mean_path)
        # 256³, resident-photon space=8 (work-dividing spatial sharding);
        # the pool tax is sort/scatter — memory-system-bound like the
        # gather — so it scales with the scenario's speedup factor
        rs256 = resident_sharded(8, 8, 1024 * 1024, (256, 256, 256),
                                 curve, V5P, dense256_mean_path,
                                 pool_tax_k1_ns=43.0 / scale)
        # 512³ (BASELINE config 4), all three strategies.  dp512 uses
        # the r5 MEASURED single-chip rate (benchmarks/configs.py:
        # 77.0M events/s at 512²/512³ — the real event loop runs the
        # 2²⁷-row table at the 2²⁴ cost, validating the curve's flat
        # extrapolation), not the curve
        dp512 = dp_replicated(8, dense512_events_per_s * scale,
                              dense512_mean_path)
        sp512 = spatial_sharded(8, 8, 1024 * 1024, (512, 512, 512), curve,
                                V5P, dense512_mean_path)
        rs512 = resident_sharded(8, 8, 1024 * 1024, (512, 512, 512),
                                 curve, V5P, dense512_mean_path,
                                 pool_tax_k1_ns=43.0 / scale)
        out[scen] = {"dp128": dp128, "dp256": dp256, "spatial256": sp256,
                     "resident256": rs256, "dp512": dp512,
                     "spatial512": sp512, "resident512": rs512}
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(v5p16_projection(), indent=1))
