#!/usr/bin/env python
"""A/B the backward's presort reorder: the (m,16) row gather at inv_src is
the largest single cost of the gather-VJP (bisect_reduction: ~26 ms at
m=2M). Variants measured here on-chip decide the round-5 form.

Chained-loop timing (see bisect_reduction.py docstring: unchained identical
calls are memoized by the axon backend; per-iter host fetches flush the
pipeline — chain + one device-scalar fetch only).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, x0, *rest, iters=12):
    """Chained: each iteration perturbs the input with a scalar digest of
    the previous output (outputs vary in shape across variants), so no
    call is elidable; one host fetch at the end. The digest reduction
    adds the same ~full-read cost to every variant."""
    def step(x):
        return x + jnp.sum(fn(x, *rest)) * 1e-30
    step_j = jax.jit(step)
    x = step_j(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step_j(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    m = 1_625_600
    n = 200_000
    print(f"backend={jax.default_backend()} m={m} n={n}", flush=True)
    rng = np.random.default_rng(0)
    # realistic inv_src: presort (gaussian-major) -> aligned (tile-major)
    # permutation from an actual binning of the bench scene would be ideal;
    # a uniform permutation is the pessimistic stand-in (same as measured)
    perm = rng.permutation(m).astype(np.int32)
    idx = jnp.asarray(perm)
    idx_sorted = jnp.asarray(np.sort(perm[: m // 1]).astype(np.int32))
    gidx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    d = jnp.asarray(rng.standard_normal((m, 16)).astype(np.float32))
    d8 = d[:, :8]
    dT = jnp.asarray(np.ascontiguousarray(
        rng.standard_normal((16, m)).astype(np.float32)))
    jax.block_until_ready((d, d8, dT))
    print("arrays on device", flush=True)
    timeit("row gather (m,16)[idx]", lambda x: x[idx], d)
    timeit("row gather (m,8)[idx]", lambda x: x[idx], d8)
    timeit("row gather sorted idx", lambda x: x[idx_sorted], d)
    timeit("col gather (16,m)[:,idx]", lambda x: x[:, idx], dT)
    timeit("take_along_axis rows",
           lambda x: jnp.take_along_axis(x, idx[:, None], axis=0), d)
    timeit("scatter-add (n,16) at gidx",
           lambda x: jnp.zeros((n + 1, 16), jnp.float32).at[gidx].add(x), d)
    timeit("unique scatter rows d[perm]=x",
           lambda x: jnp.zeros_like(x).at[idx].set(x, mode="drop",
                                                   unique_indices=True), d)


if __name__ == "__main__":
    main()
