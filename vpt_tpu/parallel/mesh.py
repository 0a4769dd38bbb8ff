"""Device meshes and sharding specs for multi-chip rendering.

The reference has exactly one parallelism mode — implicit per-pixel SIMT on a
single GPU (SURVEY.md §2h).  Here the scaling axes are explicit:

- ``data``  — the pixel/sample grid, embarrassingly parallel; rows of the
  image and all per-pixel state shard across it.  Per-pixel RNG streams are
  hashes of pixel coordinates, so sharding is bit-invariant.
- ``space`` — the volume's z extent, for grids too large to replicate
  per-chip; trilinear reads across the partition face ride XLA's
  automatically inserted collectives (halo-exchange kernels come in through
  the pallas layer).

Meshes are built over whatever devices exist (real TPUs or
``--xla_force_host_platform_device_count`` virtual CPUs), so the same code
path runs tests, dry-runs, and pods.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data", "space"),
              space: int = 1) -> Mesh:
    """Mesh over the first ``n_devices`` devices, shaped
    (n_devices // space, space)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % space != 0:
        raise ValueError(f"{n_devices} devices not divisible by space={space}")
    if len(axes) == 1:
        grid = np.array(devices)
    else:
        grid = np.array(devices).reshape(n_devices // space, space)
    return Mesh(grid, axis_names=tuple(axes))


def pixel_sharding(mesh: Mesh, ndim: int = 3,
                   axis: str = "data") -> NamedSharding:
    """Shard an (H, W, ...) image/state array by rows across ``axis``."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
