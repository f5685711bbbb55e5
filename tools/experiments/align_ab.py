#!/usr/bin/env python
"""On-chip A/B for the binning ALIGN stage (bisect_binning round-4: the
two permutation scatters are 17 ms of the 26 ms plain bin_gaussians).

Variants, timed on bench-scale inputs (m_cap ~1.6M, T=8160 tiles):
  scatter   — current production code: two .at[].set permutation scatters
  sort-inv  — inv_src via permutation-inversion sort (M-sort of (e_s,dest))
  gather    — gidx_aligned via monotone gather (2 layout expands + take)

Chained-loop timing (block_until_ready lies on this backend).
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

from gsplat_tpu.ops.binning import _expand


def timeit(name, fn, x0, *rest, iters=12):
    @jax.jit
    def chained(x, *r):
        out = fn(x, *r)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.reshape(-1)[0].astype(jnp.float32)
        return x + (s * 1e-30).astype(x.dtype), s

    x, s = chained(x0, *rest)
    float(s)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x, s = chained(x, *rest)
    float(s)
    print(f"{name:46s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    scale = float(os.environ.get("AB_SCALE", "1.0"))   # tiny CPU runs
    m_cap = int(1_625_600 * scale)
    n_tiles = max(int(8160 * scale), 8)
    n = max(int(200_000 * scale), 100)
    align = 256

    # realistic per-tile counts: lumpy, sum ≈ 0.77 m_cap
    w = rng.gamma(0.8, 1.0, n_tiles)
    counts = np.floor(w / w.sum() * int(m_cap * 0.77)).astype(np.int32)
    tile_start = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
        np.int32)
    total = int(counts.sum())
    padded = -(-counts // align) * align
    padded_start = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(
        np.int32)
    # pad_cap sized exactly like production right-sizing (shift ≤ pad_cap
    # everywhere, or the layout is garbage by contract)
    pad_cap = int((padded - counts).sum())
    m_out = m_cap + pad_cap
    shift = (padded_start - tile_start).astype(np.int32)
    assert shift.max() <= pad_cap

    gidx_s = rng.integers(0, n, m_cap, dtype=np.int32)
    e_s = rng.permutation(m_cap).astype(np.int32)

    tile_start_j = jnp.asarray(tile_start)
    tile_count_j = jnp.asarray(counts)
    shift_j = jnp.asarray(shift)
    padded_start_j = jnp.asarray(padded_start)
    gidx_j = jnp.asarray(gidx_s)
    e_s_j = jnp.asarray(e_s)
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)

    def dest_of(gx):
        shift_e = _expand(shift_j, tile_start_j, m_cap)
        return e_idx + shift_e

    def aligned_scatter(gx):
        dest = dest_of(gx)
        return jnp.full((m_out,), n, jnp.int32).at[dest].set(
            gx, mode="drop", unique_indices=True, indices_are_sorted=True)

    def aligned_gather(gx):
        q = jnp.arange(m_out, dtype=jnp.int32)
        shift_q = _expand(shift_j, padded_start_j, m_out)
        end_q = _expand(tile_start_j + tile_count_j, padded_start_j, m_out)
        src = q - shift_q
        return jnp.where(src < end_q,
                         gx[jnp.clip(src, 0, m_cap - 1)], n)

    def inv_scatter(gx):
        dest = dest_of(gx)
        return jnp.zeros((m_cap,), jnp.int32).at[e_s_j].set(
            dest, mode="drop", unique_indices=True)

    def inv_sort(gx):
        dest = dest_of(gx)
        _, inv = jax.lax.sort((e_s_j, dest), num_keys=1)
        return inv

    # correctness cross-checks first
    a_sc = np.asarray(jax.jit(aligned_scatter)(gidx_j))
    a_ga = np.asarray(jax.jit(aligned_gather)(gidx_j))
    real = np.zeros(m_out, bool)
    for t in range(n_tiles):
        real[padded_start[t]:padded_start[t] + counts[t]] = True
    np.testing.assert_array_equal(a_sc[real], a_ga[real])
    np.testing.assert_array_equal(a_ga[~real], n)
    i_sc = np.asarray(jax.jit(inv_scatter)(gidx_j))
    i_so = np.asarray(jax.jit(inv_sort)(gidx_j))
    np.testing.assert_array_equal(i_sc, i_so)
    print(f"correctness OK (total={total}, m_cap={m_cap}, m_out={m_out})")

    timeit("aligned fill: permutation scatter", aligned_scatter, gidx_j)
    timeit("aligned fill: monotone gather", aligned_gather, gidx_j)
    timeit("inv_src: permutation scatter", inv_scatter, gidx_j)
    timeit("inv_src: inversion sort", inv_sort, gidx_j)
    timeit("(dest expand alone)", dest_of, gidx_j)


if __name__ == "__main__":
    main()
