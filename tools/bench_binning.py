#!/usr/bin/env python
"""Sub-stage timings of bin_gaussians to find the non-sort hot spot."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 200_000 if on_tpu else 4_000
    m_cap = 4_800_000 if on_tpu else 100_000
    n_tiles = 2040
    print(f"backend={jax.default_backend()} N={N} m_cap={m_cap}")

    rng = np.random.default_rng(0)
    counts = jnp.asarray(rng.integers(0, 40, N).astype(np.int32))
    depth = jnp.asarray(rng.uniform(0.2, 50.0, N).astype(np.float32))
    tile_sorted = jnp.asarray(np.sort(
        rng.integers(0, n_tiles, m_cap)).astype(np.int32))
    tile_count = jnp.asarray(rng.integers(0, 4000, n_tiles).astype(np.int32))

    @jax.jit
    def f_repeat(counts):
        return jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                          total_repeat_length=m_cap)
    gidx = f_repeat(counts)
    timeit("jnp.repeat", f_repeat, counts)

    @jax.jit
    def f_gathers(gidx, counts, depth):
        offsets = jnp.cumsum(counts) - counts
        k = jnp.arange(m_cap, dtype=jnp.int32) - offsets[gidx]
        return k, depth[gidx]
    timeit("offset gathers", f_gathers, gidx, counts, depth)

    @jax.jit
    def f_searchsorted_tiles(tile_sorted):
        ids = jnp.arange(n_tiles, dtype=jnp.int32)
        return jnp.searchsorted(tile_sorted, ids, side="left")
    timeit("searchsorted T queries", f_searchsorted_tiles, tile_sorted)

    m_out = m_cap + 128 * n_tiles

    @jax.jit
    def f_align(tile_count):
        padded = -(-tile_count // 128) * 128
        ends = jnp.cumsum(padded).astype(jnp.int32)
        nn = jnp.arange(m_out, dtype=jnp.int32)
        t_of = jnp.searchsorted(ends, nn, side="right").astype(jnp.int32)
        return t_of
    timeit("searchsorted M queries", f_align, tile_count)

    @jax.jit
    def f_align_gather(tile_count, gidx):
        padded = -(-tile_count // 128) * 128
        ends = jnp.cumsum(padded).astype(jnp.int32)
        starts = ends - padded
        nn = jnp.arange(m_out, dtype=jnp.int32)
        t_of = jnp.searchsorted(ends, nn, side="right").astype(jnp.int32)
        t_c = jnp.minimum(t_of, n_tiles - 1)
        rank = nn - starts[t_c]
        src = jnp.clip(rank, 0, m_cap - 1)
        return jnp.where(t_of < n_tiles, gidx[src], N)
    timeit("align full", f_align_gather, tile_count, gidx)


if __name__ == "__main__":
    main()
