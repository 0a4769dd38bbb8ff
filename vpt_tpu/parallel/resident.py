"""Resident-photon spatial sharding: ray handoff between slab owners.

The second of SURVEY §2h item 2's two designs for volumes past per-chip
HBM — and §7 hard part 4's "genuinely novel distributed-systems piece".
The first design (parallel/halo.py) keeps every photon on its pixel's
chip and assembles remote samples by ownership-masked psum: correct and
bit-identical, but every chip in a space group evaluates the full event
logic for its whole pixel shard — spatial sharding as *capacity*, at
0.12–0.23 projected efficiency (docs/SCALING.md).  This module builds the
other design: photons RESIDE on the chip that owns the slab their next
sample falls in, so a space-sharded mesh divides the event work too, and
boundary-crossing photons migrate between owners as pytree rows.

Why this is possible at all: the MCM event (MCMRenderer.glsl:129-166)
touches the volume exactly once, at the post-flight position, and the
flight itself is pure VPU (an exponential draw — renderers/mcm.py
``flight_phase``).  So the event splits around the gather:

    round k:   flight (anywhere) → MIGRATE crossers → sample+classify
               (on the owner, against the slab-local corner table)

Per-photon math is the byte-identical ``flight_phase``/``interact_phase``
pair the replicated machine runs — only the rows' device changes — so a
stall-free frame reproduces the replicated render exactly (scoped like
test_halo: discrete fields bitwise, floats to the shard_map partitioner's
1-ulp FMA codegen; tests/test_resident.py).

Mechanics (all static shapes; everything inside one shard_map over
``(data, space)``):

- Each device holds a pool of ``capacity`` photon slots: the MCM state
  fields plus the pixel's ndc (so resets and reseeds need no lookup), the
  per-pixel RNG state, a pixel id, and ``occupied``/``pending`` flags
  (pending = flight applied, sample not yet taken — the in-flight half of
  an event).
- Migration: destinations are grouped by a stable argsort, ranked against
  per-destination offsets, scattered into an (S, fanout) send buffer, and
  exchanged with ONE ``lax.all_to_all`` over ``space``; arrivals compact
  into free slots by a second sort.  Photons that do not fit (send fanout
  or pool capacity) are *stalled*, never dropped: they keep their pending
  position and retry next round — an event-schedule delay, not an
  estimator bias.  Senders respect receivers' free capacity through a
  per-round quota (an S-word all_gather of free-slot counts), so
  ``dropped`` is 0 by construction; it stays as a counter backstop.  One
  documented statistical deviation: a photon still pending (mid-event)
  at a frame boundary keeps its RNG stream instead of taking the frame
  reseed — its later draws come from a different (equally valid,
  hash-independent) stream than the replicated machine's, so stalled
  runs match statistically rather than bitwise.
- Deposits ride with the photon (radiance/samples are per-pixel running
  means, one photon per pixel), so the only per-round collective is the
  row exchange itself; :func:`assemble` scatters rows back to the (H, W)
  grid for display/inspection.

Capacity is the work knob: per-round event work is ∝ capacity, so the
space axis divides work by S/slack where slack = capacity·S/N_pixels.
``capacity = pixels-per-data-group`` (slack = S) guarantees stall-freedom
for the exactness tests; production slack is a measured trade
(benchmarks/resident_probe.py: crossing fraction, occupancy imbalance,
migration ns/row; projection.py prices the v5p-16 column).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import rng, sampling
from ..renderers import mcm
from ..renderers.base import Scene
from .halo import HaloScene, shard_volume_with_halo


def slab_owner(position, depth: int, num_slabs: int, interleave: int = 1):
    """Space-axis owner of a sample position: the slab holding the
    trilinear cell's z0 plane — the same addressing as
    HaloScene._cell_coords, so ownership and the slab-local gather agree
    bitwise (OOB positions clamp; their sample is discarded by the oob
    branch, so any owner is valid — the clamped one is deterministic).

    ``interleave`` m > 1 assigns thin slab t = z0 // (d/(m·S)) to chip
    t mod S (cyclic): the load-balance mode for camera-entry photon
    pileup (see HaloScene.interleave)."""
    z = jnp.clip(position[..., 2] * depth - 0.5, 0.0, depth - 1.0)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, depth - 1)
    if interleave == 1:
        return jnp.clip(z0 // (depth // num_slabs), 0, num_slabs - 1)
    return (z0 // (depth // (interleave * num_slabs))) % num_slabs


def shard_volume_cyclic(volume, num_slabs: int, interleave: int):
    """(D, H, W, C) → (S, m·(thin_ds+1), H, W, C): chip c's block is the
    z-concatenation of thin slabs {c, c+S, …, c+(m−1)S}, each with its
    own +z halo plane (shard_volume_with_halo over m·S thin slabs,
    regrouped cyclically)."""
    thin = shard_volume_with_halo(volume, interleave * num_slabs)
    t, rest = thin.shape[0], thin.shape[1:]
    grouped = thin.reshape((interleave, num_slabs) + rest)
    grouped = jnp.moveaxis(grouped, 0, 1)       # (S, m, thin_ds+1, …)
    return grouped.reshape((num_slabs, interleave * rest[0]) + rest[1:])


#: photon-state fields that ride in the pool (the MCM state dict minus the
#: grid layout), stored as (K, c) rows; scalars widen to (K, 1)
_PH_FIELDS = ("position", "direction", "bounces", "transmittance",
              "radiance", "samples")
_COUNTERS = ("migrated", "stalled", "dropped")


def _ph_of(pool):
    """Pool rows → the MCM photon dict interact/flight_phase consume."""
    ph = {}
    for f in _PH_FIELDS + (("cheb",) if "cheb" in pool else ()):
        v = pool[f]
        ph[f] = v[..., 0] if f in ("bounces", "samples", "cheb") else v
    return ph


def _store_ph(pool, ph, mask):
    """Commit ``ph`` into the pool rows where ``mask`` holds."""
    out = dict(pool)
    for f in _PH_FIELDS + (("cheb",) if "cheb" in pool else ()):
        new = ph[f][..., None] if ph[f].ndim == 1 else ph[f]
        out[f] = jnp.where(mask[..., None], new, pool[f])
    return out


# ---------------------------------------------------------------------------
# Row migration: group → all_to_all → merge
# ---------------------------------------------------------------------------

def _exchange(pool, dest, departs, num_slabs: int, fanout: int, axis: str):
    """Move rows flagged ``departs`` to device ``dest`` over ``axis``.

    Returns ``(pool, stalled, dropped, moved)``.  Rows that fit the
    (num_slabs, fanout) send buffer travel in one all_to_all; arrivals
    fill free slots in slot order.  ``stalled`` rows exceeded the fanout
    and stay put (still occupied+pending, retried next round);
    ``dropped`` counts arrivals past ALL free capacity (0 unless the pool
    is undersized — surfaced, never silent)."""
    k = dest.shape[0]
    occupied = pool["occupied"]
    departs = departs & occupied

    # group departures by destination: ONE stable sort on (dest | last)
    # + its inverse; every other buffer op below is sized by the fanout,
    # not the pool — the r5 machinery-tax measurement (resident_probe
    # --mode machinery) showed full-pool row scatters per leaf cost
    # ~300 ns/slot, so the exchange touches only O(S·fanout) rows
    key = jnp.where(departs, dest, num_slabs)
    order = jnp.argsort(key)                      # departing first, by dest
    inv = jnp.argsort(order)                      # slot → sorted position
    counts = jnp.sum((dest[None, :] == jnp.arange(num_slabs)[:, None])
                     & departs[None, :], axis=1, dtype=jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    dest_c = jnp.clip(dest, 0, num_slabs - 1)
    ranks = inv - offsets[dest_c]

    # backpressure grant protocol: every sender learns all demands and
    # all free-slot counts (two small all_gathers), then computes the
    # SAME deterministic allocation — destination s's free slots go to
    # senders in axis order: grant[i, s] = clip(F_s − Σ_{j<i} D[j, s],
    # 0, D[i, s]).  Arrivals therefore never exceed capacity (dropped ≡
    # 0); the excess stalls and retries.  With capacity = photons-per-
    # group this never stalls either: free_s = cap − occ_s ≥ total
    # photons elsewhere ≥ arrivals.
    free_here = jnp.sum(~occupied, dtype=jnp.int32)
    demand = lax.all_gather(counts, axis)                 # (S, S)
    free_all = lax.all_gather(free_here, axis)            # (S,)
    prefix = jnp.cumsum(demand, axis=0) - demand
    grants = jnp.clip(free_all[None, :] - prefix, 0, demand)
    grant = grants[lax.axis_index(axis)]                  # (S,) mine
    cap = jnp.minimum(grant, fanout)
    fits = departs & (ranks < cap[dest_c])
    stalled = jnp.sum(departs & ~fits, dtype=jnp.int32)

    # send buffers: gather the granted rows straight out of the sorted
    # order — (S, fanout) rows per leaf, no full-pool scatter
    j = jnp.arange(num_slabs * fanout)
    js, jm = j // fanout, j % fanout
    send_valid = jm < cap[js]
    src = order[jnp.clip(offsets[js] + jm, 0, k - 1)]

    send = {name: jnp.take(leaf, src, axis=0).reshape(
        (num_slabs, fanout) + leaf.shape[1:])
        for name, leaf in pool.items() if name != "occupied"}
    send["valid"] = send_valid.reshape(num_slabs, fanout)

    recv = {name: lax.all_to_all(leaf, axis, 0, 0)
            for name, leaf in send.items()}
    arr_valid = recv.pop("valid").reshape(-1)     # (S·fanout,)
    n_arr = jnp.sum(arr_valid, dtype=jnp.int32)

    # vacate senders, then fill free slots with arrivals.  Arrivals are
    # compacted by a small sort over the buffer; free slots come from
    # one pool-sized sort (unavoidable: fullness is a pool property).
    occupied = occupied & ~fits
    arr_order = jnp.argsort(~arr_valid)           # valid arrivals first
    free_slots = jnp.argsort(occupied)            # free slots first
    n_free = jnp.sum(~occupied, dtype=jnp.int32)
    accept = (j < n_arr) & (j < n_free)
    tgt = jnp.where(accept, free_slots[jnp.minimum(j, k - 1)], k)
    dropped = n_arr - jnp.sum(accept, dtype=jnp.int32)

    new_pool = {}
    for name, leaf in pool.items():
        if name == "occupied":
            continue
        arr = recv[name].reshape((num_slabs * fanout,) + leaf.shape[1:])
        arr = jnp.take(arr, arr_order, axis=0)
        new_pool[name] = leaf.at[tgt].set(arr, mode="drop")
    new_pool["occupied"] = occupied.at[tgt].set(True, mode="drop")
    return new_pool, stalled, dropped, jnp.sum(fits, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Pool construction
# ---------------------------------------------------------------------------

def resident_reset(scene: Scene, params: mcm.Params, height: int,
                   width: int, mesh: Mesh, num_slabs: int,
                   capacity: int | None = None, seed: float = 0.0,
                   data_axis: str = "data", space_axis: str = "space",
                   interleave: int = 1):
    """Initial sharded pool state: the replicated MCM reset (mcm.reset —
    identical photon seeding), distributed into per-device pools by slab
    ownership of each photon's entry position, spilling to free capacity
    elsewhere when a slab's photons exceed its pool (a *committed* photon
    may sit anywhere — it migrates once it goes pending).

    Returns a dict of (n_data, S, capacity, …) global arrays placed on
    the mesh (every leaf P(data, space))."""
    n_data = mesh.shape[data_axis]
    n_pix = height * width
    if n_pix % n_data:
        raise ValueError(f"{n_pix} pixels not divisible by data={n_data}")
    group = n_pix // n_data
    if capacity is None:
        capacity = group                      # slack = S: stall-free
    if capacity * num_slabs < group:
        raise ValueError(
            f"capacity {capacity} × {num_slabs} slabs cannot hold "
            f"{group} photons per data group")
    state = mcm.reset(params, height, width, scene, seed=seed)
    ndc = sampling.pixel_ndc(height, width)

    use_skip = "cheb" in state
    fields = _PH_FIELDS + (("cheb",) if use_skip else ())
    rows = {f: np.asarray(state[f]).reshape(n_pix, -1) for f in fields}
    rows["ndc"] = np.asarray(ndc).reshape(n_pix, 2)
    owner = np.asarray(slab_owner(jnp.asarray(rows["position"]),
                                  scene.volume.shape[0], num_slabs,
                                  interleave))

    pool = {f: np.zeros((n_data, num_slabs, capacity, v.shape[-1]),
                        v.dtype) for f, v in rows.items()}
    pool["pixel_id"] = np.full((n_data, num_slabs, capacity), n_pix,
                               np.int32)
    pool["rstate"] = np.zeros((n_data, num_slabs, capacity), np.uint32)
    pool["occupied"] = np.zeros((n_data, num_slabs, capacity), bool)
    pool["pending"] = np.zeros((n_data, num_slabs, capacity), bool)

    for gi in range(n_data):
        pix = np.arange(gi * group, (gi + 1) * group)
        own = owner[pix].astype(np.int64)
        order = np.argsort(own, kind="stable")
        sp, so = pix[order], own[order]
        counts = np.bincount(so, minlength=num_slabs)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ranks = np.arange(group) - starts[so]
        direct = ranks < capacity
        slabs_idx = so[direct]
        slots_idx = ranks[direct]
        # spill the overflow into free slots, lowest slot index first
        # (≈ emptiest-first round-robin); a committed photon may sit
        # anywhere — it migrates once it goes pending
        spill_pix = sp[~direct]
        if spill_pix.size:
            fill0 = np.minimum(counts, capacity)
            free = (np.arange(capacity)[:, None]
                    >= fill0[None, :])            # (capacity, S)
            free_pos = np.argwhere(free)          # ordered by slot, slab
            take = free_pos[:spill_pix.size]
            slabs_idx = np.concatenate([slabs_idx, take[:, 1]])
            slots_idx = np.concatenate([slots_idx, take[:, 0]])
            sp = np.concatenate([sp[direct], spill_pix])
        else:
            sp = sp[direct]
        for f, v in rows.items():
            pool[f][gi, slabs_idx, slots_idx] = v[sp]
        pool["pixel_id"][gi, slabs_idx, slots_idx] = sp
        pool["occupied"][gi, slabs_idx, slots_idx] = True

    def place(v):
        spec = P(data_axis, space_axis, *([None] * (v.ndim - 2)))
        return jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))

    placed = {f: place(v) for f, v in pool.items()}
    for c in _COUNTERS:
        placed[c] = place(np.zeros((n_data, num_slabs), np.int32))
    return placed


# ---------------------------------------------------------------------------
# The resident frame
# ---------------------------------------------------------------------------

def resident_render_frame(mesh: Mesh, scene: Scene, num_slabs: int,
                          height: int, width: int,
                          data_axis: str = "data",
                          space_axis: str = "space",
                          fanout: int | None = None,
                          interleave: int = 1,
                          migrate_every: int = 1):
    """Build the jitted resident-photon MCM frame function.

    Returns ``(frame_fn, tables)``: call
    ``frame_fn(pool, tables, params, seed, frame_number)`` with the pool
    from :func:`resident_reset`; output keeps the pool structure (plus
    updated migration counters).  ``tables`` holds the space-sharded slab
    arrays (volume slabs + optional corner/tracking tables), placed like
    halo.sharded_render_frame's.  ``fanout`` bounds rows exchanged per
    (round, destination); None = capacity (stall-free)."""
    if scene.majorant is not None:
        raise ValueError(
            "resident_render_frame does not implement the majorant-grid "
            "tracking machine (its flight needs the coarse grid); build "
            "the scene with tracking='none'/'cheb' or use the "
            "replicated/halo paths")
    volume_shape = scene.volume.shape
    slabs = shard_volume_cyclic(scene.volume, num_slabs, interleave)
    packed = scene.volume_packed is not None
    slabs_packed = None
    if packed:
        slabs_packed = jax.vmap(sampling.pack_corner_volume)(slabs)
        slabs_packed = slabs_packed.astype(scene.volume_packed.dtype)
    tracked = scene.tracking_packed is not None
    slabs_tracking = None
    if tracked:
        d, h, w = volume_shape[:3]
        lanes = scene.tracking_packed.shape[-1]
        t3d = scene.tracking_packed.reshape(d, h, w, lanes)
        slabs_tracking = shard_volume_cyclic(
            t3d, num_slabs, interleave).reshape(num_slabs, -1, lanes)
    use_skip = tracked
    cell = mcm.skip_cell_size(scene) if use_skip else None
    inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)

    def body(pool, slab, slab_packed, slab_tracking, transfer, tf_packed,
             tf_mxu, environment, mvp_inverse, model_view, projection,
             params, seed, frame_number):
        sidx = lax.axis_index(space_axis)
        pool = {name: leaf[0, 0] for name, leaf in pool.items()}
        counters = {c: pool.pop(c) for c in _COUNTERS}
        hscene = HaloScene(
            slab[0], sidx, num_slabs, volume_shape, transfer,
            environment, mvp_inverse, model_view, projection,
            axis=space_axis,
            slab_packed=None if slab_packed is None else slab_packed[0],
            transfer_packed=tf_packed,
            slab_tracking=(None if slab_tracking is None
                           else slab_tracking[0]),
            transfer_mxu=tf_mxu,
            collective=False, interleave=interleave)
        k = pool["occupied"].shape[0]
        fo = min(fanout, k) if fanout is not None else k

        def _dest_of(pool):
            pos = pool["position"]
            dest = slab_owner(pos, volume_shape[0], num_slabs, interleave)
            oob = jnp.any((pos > 1.0) | (pos < 0.0), axis=-1)
            spread = pool["pixel_id"] % num_slabs
            return jnp.where(oob, spread, dest)

        # per-frame reseed, exactly as the replicated render_frame
        # (MCMRenderer.glsl:128): hash of (mapped.xy, seed).  Stalled
        # (pending) photons keep their mid-event stream — reseeding them
        # would detach the interact from its flight draw.
        mapped = pool["ndc"] * 0.5 + 0.5
        fresh = rng.seed_pixels(mapped, jnp.asarray(seed, jnp.float32))
        pool = dict(pool)
        pool["rstate"] = jnp.where(pool["pending"], pool["rstate"], fresh)

        def do_flight(pool):
            # flight: committed photons draw their free path and go
            # pending (pure VPU — runs wherever the row currently lives)
            occ = pool["occupied"]
            ph = _ph_of(pool)
            fly = occ & ~pool["pending"]
            rs_f, pos_f = mcm.flight_phase(ph, pool["rstate"], params,
                                           use_skip, cell)
            pool = dict(pool)
            pool["rstate"] = jnp.where(fly, rs_f, pool["rstate"])
            pool["position"] = jnp.where(fly[..., None], pos_f,
                                         pool["position"])
            pool["pending"] = occ
            return pool

        def do_migrate(pool, counters):
            # migrate pending photons to their sample's slab owner.
            # OOB pending positions deposit without using their sample
            # (interact_phase discards vs wherever oob holds), so those
            # photons take a uniform pixel-hash owner instead of piling
            # on the boundary slabs — miss-ray photons are a large,
            # permanently-OOB population (the measured edge-slab pileup
            # in resident_probe --mode crossing).
            dest = _dest_of(pool)
            departs = pool["pending"] & (dest != sidx)
            pool, n_stall, n_drop, n_moved = _exchange(
                pool, dest, departs, num_slabs, fo, space_axis)
            return pool, {
                "migrated": counters["migrated"] + n_moved,
                "stalled": counters["stalled"] + n_stall,
                "dropped": counters["dropped"] + n_drop,
            }

        def do_interact(pool):
            # interact: local pending photons sample the slab and commit
            occ = pool["occupied"]
            dest = _dest_of(pool)
            ready = occ & pool["pending"] & (dest == sidx)
            ph = _ph_of(pool)
            if use_skip:
                vs, cheb_new = hscene.sample_color_tracking(
                    pool["position"])
            else:
                vs, cheb_new = hscene.sample_color(pool["position"]), None
            new_ph, new_rs = mcm.interact_phase(
                ph, pool["rstate"], pool["position"], vs, cheb_new,
                hscene, params, pool["ndc"], inv_res, use_skip)
            pool = _store_ph(pool, new_ph, ready)
            pool = dict(pool)
            pool["rstate"] = jnp.where(ready, new_rs, pool["rstate"])
            pool["pending"] = pool["pending"] & ~ready
            return pool

        if migrate_every == 1:
            # exact mode: one exchange per event, no photon ever waits —
            # reproduces the replicated machine (tests/test_resident.py)
            def one_round(_, carry):
                pool, counters = carry
                pool = do_flight(pool)
                pool, counters = do_migrate(pool, counters)
                return do_interact(pool), counters

            pool, counters = lax.fori_loop(0, params.steps, one_round,
                                           (pool, counters))
        else:
            # amortized mode (the measured pool/migration tax divides by
            # migrate_every): each round runs one exchange, then
            # migrate_every (fly, interact-local) event steps — photons
            # that cross a slab boundary park (pending, remote) until
            # the next round's exchange, trading a bounded event delay
            # (≤ migrate_every−1 steps per crossing, surfaced by the
            # samples counters) for k× less machinery.  With space=1
            # nothing ever parks and the schedule is event-exact.
            if params.steps % migrate_every:
                raise ValueError(
                    f"steps={params.steps} not divisible by "
                    f"migrate_every={migrate_every}")

            def one_round(_, carry):
                pool, counters = carry
                pool, counters = do_migrate(pool, counters)

                def inner(_, pool):
                    return do_interact(do_flight(pool))

                pool = lax.fori_loop(0, migrate_every, inner, pool)
                return pool, counters

            pool, counters = lax.fori_loop(
                0, params.steps // migrate_every, one_round,
                (pool, counters))
        out = {name: leaf[None, None] for name, leaf in pool.items()}
        out.update({c: counters[c][None, None] for c in _COUNTERS})
        return out

    def specs_of(pool_example):
        return {name: P(data_axis, space_axis,
                        *([None] * (leaf.ndim - 2)))
                for name, leaf in pool_example.items()}

    table_sh = NamedSharding(mesh, P(space_axis, None, None))
    tables = (
        jax.device_put(slabs, NamedSharding(
            mesh, P(space_axis, None, None, None, None))),
        jax.device_put(slabs_packed, table_sh) if packed else None,
        jax.device_put(slabs_tracking, table_sh) if tracked else None,
    )

    frame_cache = {}

    def frame_fn(pool, tables, params, seed, frame_number):
        key = tuple(sorted(pool))
        if key not in frame_cache:
            specs = specs_of(pool)
            mapped = shard_map(
                body, mesh=mesh, axis_names={data_axis, space_axis},
                in_specs=(specs, P(space_axis, None, None, None, None),
                          (P(space_axis, None, None) if packed else P()),
                          (P(space_axis, None, None) if tracked else P()),
                          P(), P(), P(), P(), P(), P(), P(), P(), P(),
                          P()),
                out_specs=specs,
                check_vma=False,
            )

            @jax.jit
            def jitted(pool, tables, params, seed, frame_number):
                vol_slabs, pk, tk = tables
                return mapped(pool, vol_slabs, pk, tk, scene.transfer,
                              scene.transfer_packed, scene.transfer_mxu,
                              scene.environment, scene.mvp_inverse,
                              scene.model_view, scene.projection,
                              params, seed, frame_number)

            frame_cache[key] = jitted
        return frame_cache[key](pool, tables, params, seed, frame_number)

    return frame_fn, tables


def assemble(pool, height: int, width: int):
    """Scatter the pool rows back to the replicated (H, W) MCM state dict
    (one photon per pixel, keyed by pixel_id) — the display/inspection
    path and the equivalence oracle's comparison form."""
    n_pix = height * width

    def rows(leaf):
        return jnp.reshape(leaf, (-1,) + leaf.shape[3:])

    occ = rows(pool["occupied"])
    pid = jnp.where(occ, rows(pool["pixel_id"]), n_pix)
    out = {}
    for f in _PH_FIELDS + (("cheb",) if "cheb" in pool else ()):
        r = rows(pool[f])
        flat = jnp.zeros((n_pix,) + r.shape[1:], r.dtype) \
            .at[pid].set(r, mode="drop")
        if f in ("bounces", "samples", "cheb"):
            out[f] = flat[..., 0].reshape(height, width)
        else:
            out[f] = flat.reshape(height, width, r.shape[-1])
    return out
