"""Device-mesh construction helpers.

The reference is strictly single-GPU (SURVEY.md §2.3); every parallel axis
here is new capability. Axes:

- ``data``: camera data-parallelism — each chip trains on different views,
  Gaussians replicated, gradients psum'd over ICI (parallel/dp.py).
- ``tile``: image-tile sharding — the tile grid of one (large) render is
  split across chips (parallel/tile_shard.py).

Multi-host initialization goes through jax.distributed.initialize before
mesh creation (call init_distributed() from the CLI when JAX_COORDINATOR is
set).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Multi-host bring-up (no-op single-host)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(axes: Sequence[tuple] = (("data", -1),),
              devices: Optional[list] = None) -> Mesh:
    """Build a mesh from (name, size) pairs; -1 = all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    n_fixed = int(np.prod([s for s in sizes if s > 0])) or 1
    sizes = [s if s > 0 else n // n_fixed for s in sizes]
    assert int(np.prod(sizes)) == n, (sizes, n)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
