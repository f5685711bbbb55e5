"""Device-mesh construction helpers + multi-host bring-up.

The reference is strictly single-GPU (SURVEY.md §2.3); every parallel axis
here is new capability. Axes:

- ``data``: camera data-parallelism — each chip trains on different views,
  Gaussians replicated, gradients psum'd over ICI (parallel/dp.py).
- ``tile``: image-tile sharding — the tile grid of one (large) render is
  split across chips (parallel/tile_shard.py).
- ``prim``: gaussian-sharded storage / depth-slab sharding
  (parallel/sharded.py, parallel/prim_shard.py).

## Multi-host

One process per host, same program everywhere, standard JAX bring-up:

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \\
    JAX_PROCESS_ID=<0|1> python train.py -s <scene> --shard_gaussians ...

``init_distributed()`` (called by every CLI via ``safe_state``-time setup
or explicitly) runs ``jax.distributed.initialize`` from those variables;
afterwards ``jax.devices()`` spans all hosts and every mesh built here does
too, so shard_map collectives ride ICI within a host and DCN across hosts
with no further code changes. Host-side loops must agree on control flow:
the training loop's camera picks derive from a seeded RNG and its
grow/shrink decisions from psum'd scalars, so all processes take identical
branches. Array I/O (checkpoints, PLY saves) goes through orbax, which
handles multi-host sharded arrays natively (train/checkpoint.py).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def init_distributed() -> bool:
    """Multi-host bring-up; no-op single-host. Returns True when running
    distributed. Driven by the standard JAX env contract:
    JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES, JAX_PROCESS_ID), or any
    environment jax.distributed can auto-detect."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # jax.distributed.initialize() only auto-detects managed clusters
        # (SLURM/GKE/...); for the plain env contract documented above the
        # three values must be passed explicitly (verified by
        # tests/test_multihost.py's real 2-process run).
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kw)
        _DIST_INITIALIZED = True
        print(f"[dist] process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local of "
              f"{jax.device_count()} global devices")
        return True
    return False


def make_mesh(axes: Sequence[tuple] = (("data", -1),),
              devices: Optional[list] = None) -> Mesh:
    """Build a mesh from (name, size) pairs; -1 = all remaining devices.

    Uses the GLOBAL device list (all hosts after init_distributed), ordered
    so that the innermost mesh axis maps to devices within a host first —
    collectives over it ride ICI, the outer axis crosses DCN."""
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
