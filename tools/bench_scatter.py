#!/usr/bin/env python
"""Micro-benchmarks for the binning sort and the entry-gradient reduction
(the backward of packed[gidx]) — the two suspected non-kernel hot spots.

Variants for the (M,16) → (N,16) segment reduction:
  a) xla-scatter-add:      d_packed = zeros.at[gidx].add(d_entries)
  b) sorted-scatter-add:   same but gidx presorted + indices_are_sorted
  c) sort+cumsum+diff:     permute to generation (gidx-major) order, cumsum,
                           difference at offsets
  d) segment_sum:          jax.ops.segment_sum

Sort variants:
  s2) lax.sort 2 keys (tile i32, depth f32) + payload
  s1) lax.sort 1 packed key (tile<<20 | depth-bits) + payload

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_scatter.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    M = 4_800_000 if on_tpu else 100_000
    N = 200_000 if on_tpu else 4_000
    T = 2048
    print(f"backend={jax.default_backend()} M={M} N={N}")

    rng = np.random.default_rng(0)
    gidx = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    d_entries = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))
    tile = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
    depth = jnp.asarray(rng.uniform(0.2, 50.0, M).astype(np.float32))
    payload = jnp.arange(M, dtype=jnp.int32)

    # --- segment reduction variants ---
    @jax.jit
    def v_scatter(d, g):
        return jnp.zeros((N + 1, 16), jnp.float32).at[g].add(d)
    timeit("a) scatter-add", v_scatter, d_entries, gidx)

    @jax.jit
    def v_scatter_sorted(d, g):
        return jnp.zeros((N + 1, 16), jnp.float32).at[g].add(
            d, indices_are_sorted=True)
    timeit("b) scatter-add sorted", v_scatter_sorted, d_entries, gidx)

    offsets = jnp.searchsorted(gidx, jnp.arange(N + 1, dtype=jnp.int32)
                               ).astype(jnp.int32)

    @jax.jit
    def v_cumsum(d, offs):
        cs = jnp.cumsum(d, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cs], axis=0)
        return cs[offs[1:]] - cs[offs[:-1]]
    timeit("c) cumsum+diff", v_cumsum, d_entries,
           jnp.concatenate([offsets, offsets[-1:]]))

    @jax.jit
    def v_segsum(d, g):
        return jax.ops.segment_sum(d, g, num_segments=N + 1)
    timeit("d) segment_sum", v_segsum, d_entries, gidx)

    # --- gather (forward) for scale ---
    packed = jnp.asarray(rng.standard_normal((N + 1, 16)).astype(np.float32))

    @jax.jit
    def v_gather(p, g):
        return p[g]
    timeit("gather (M,16)", v_gather, packed, gidx)

    # --- argsort cost (for the inv-perm approach) ---
    @jax.jit
    def v_argsort(x):
        return jax.lax.sort((x, payload), num_keys=1)[1]
    timeit("i32 sort+payload", v_argsort, tile)

    # --- sort variants ---
    @jax.jit
    def s2(tile, depth, payload):
        return jax.lax.sort((tile, depth, payload), num_keys=2)
    timeit("s2) 2-key sort", s2, tile, depth, payload)

    @jax.jit
    def s1(tile, depth, payload):
        dq = (jnp.float32(depth).view(jnp.int32) >> 12) & 0xFFFFF
        key = (tile << 20) | dq
        return jax.lax.sort((key, payload), num_keys=1)
    timeit("s1) packed-key sort", s1, tile, depth, payload)

    # --- cumsum alone ---
    @jax.jit
    def v_cs(d):
        return jnp.cumsum(d, axis=0)
    timeit("cumsum (M,16)", v_cs, d_entries)


if __name__ == "__main__":
    main()
