#!/usr/bin/env python
"""Decompose the backward-pass overhead outside the Pallas kernels:
the _gather_entries VJP (gather → cumsum → boundary diff), the entries
transpose pair, and the per-chunk fixed cost of an empty kernel.

Every timing is a composed jit program with a scalar checksum (micro
benchmarks constant-fold on this backend — see memory/axon notes).
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=12):
    """fn(x0, *rest) -> array. Iterations are CHAINED (prev output perturbs
    the next call's first arg) and the only host fetch is one device-side
    scalar after the loop. On this backend (axon), block_until_ready over
    independent identical calls measures ~0.03 ms regardless of the op
    (call memoization), and a per-iteration host fetch costs ~3 s (pipeline
    flush over the tunnel) — chaining + single fetch is the only pattern
    that reports real times."""
    x0, rest = args[0], args[1:]

    @jax.jit
    def chained(x, *rest):
        out = fn(x, *rest)
        s = out.reshape(-1)[0].astype(jnp.float32)
        return x + (s * 1e-30).astype(x.dtype), s

    x, s = chained(x0, *rest)
    float(s)                      # warm up + force compile
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x, s = chained(x, *rest)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    M_CAP = 2_000_128          # matches profile_stages m_cap
    M_OUT = 3_044_608          # m_cap + align*n_tiles
    N = 200_000

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    d_aligned = jax.random.normal(key, (M_OUT, 16), jnp.float32)
    d_aligned_t = jnp.asarray(d_aligned.T)
    inv_src = jnp.asarray(rng.permutation(M_OUT)[:M_CAP].astype(np.int32))
    # per-gaussian contiguous runs over the presort order
    cnt = rng.integers(0, 16, N).astype(np.int32)
    off = (np.cumsum(cnt) - cnt).astype(np.int32)
    g_offsets = jnp.asarray(off)
    g_counts = jnp.asarray(cnt)

    def full_bwd(d_aligned, inv_src, g_offsets, g_counts):
        d_presort = d_aligned[inv_src]
        cs = jnp.concatenate(
            [jnp.zeros((1, 16), jnp.float32), jnp.cumsum(d_presort, axis=0)],
            axis=0)
        lo = jnp.clip(g_offsets, 0, M_CAP)
        hi = jnp.clip(g_offsets + g_counts, 0, M_CAP)
        return cs[hi] - cs[lo]

    def gather_only(d_aligned, inv_src):
        return d_aligned[inv_src]

    def cumsum_only(d):
        return jnp.cumsum(d[:M_CAP], axis=0)

    def cumsum_concat(d):
        return jnp.concatenate(
            [jnp.zeros((1, 16), jnp.float32), jnp.cumsum(d[:M_CAP], axis=0)],
            axis=0)

    def boundary_gathers(cs, g_offsets, g_counts):
        lo = jnp.clip(g_offsets, 0, M_CAP)
        hi = jnp.clip(g_offsets + g_counts, 0, M_CAP)
        return cs[hi] - cs[lo]

    def transpose_only(d_t):
        return d_t.T + 1.0

    def cumsum_w8(d):
        return jnp.cumsum(d[:M_CAP, :8], axis=0)

    def cumsum_w128(d):
        d2 = d.reshape(-1, 128)[:M_CAP]
        return jnp.cumsum(d2, axis=0)

    def scatter_add_ref(d_aligned, idx):
        out = jnp.zeros((N + 1, 16), jnp.float32)
        return out.at[idx].add(d_aligned[:M_CAP])

    gidx = jnp.asarray(rng.integers(0, N, M_CAP).astype(np.int32))

    timeit("gather_entries VJP (full chain)", full_bwd, d_aligned, inv_src,
           g_offsets, g_counts)
    timeit("  gather d_aligned[inv_src] (2M rows x16)", gather_only,
           d_aligned, inv_src)
    timeit("  cumsum (2M,16)", cumsum_only, d_aligned)
    timeit("  cumsum+concat (2M,16)", cumsum_concat, d_aligned)
    cs = jnp.cumsum(d_aligned[:M_CAP + 1], axis=0)
    timeit("  boundary gathers (N from 2M,16)", boundary_gathers, cs,
           g_offsets, g_counts)
    timeit("transpose (16,3M) -> (3M,16)", transpose_only, d_aligned_t)
    timeit("cumsum width 8", cumsum_w8, d_aligned)
    timeit("cumsum width 128 (reshaped)", cumsum_w128, d_aligned)
    timeit("scatter-add reference (dup idx)", scatter_add_ref, d_aligned,
           gidx)

    # ---- per-chunk fixed cost of an empty chunk-grid kernel ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 256
    n_chunks = M_OUT // G

    def empty_kernel(ct_ref, x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[0] = jnp.full((1, G), ct_ref[i], jnp.float32)

    ct = jnp.zeros((n_chunks,), jnp.int32)

    def empty_grid(entries_t, ct):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((16, G), lambda i, ct: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, G), lambda i, ct: (ct[i], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            empty_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, 1, G), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ct, entries_t)

    dt = timeit(f"empty kernel, {n_chunks} chunks (DMA in, 1 out)",
                empty_grid, d_aligned_t, ct)
    print(f"  -> {dt / n_chunks * 1e9:.0f} ns/chunk")


if __name__ == "__main__":
    main()
