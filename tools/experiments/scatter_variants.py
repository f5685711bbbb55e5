#!/usr/bin/env python
"""On-chip A/B of gather-VJP reduction forms at the 1080p bench workload.

The backward of ``entries = packed[gidx]`` must reduce ~M=1.9M entry
gradient rows (16 f32 columns) into N=200k per-gaussian rows (avg
multiplicity ~6). r5 profile: the current duplicate-index scatter-add
costs 31.6 ms standalone — the single largest line item in the train
step. Every candidate here computes the SAME reduction; assert equality,
then time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
       tools/experiments/scatter_variants.py
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

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
    print(f"{name:44s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    from gsplat_tpu.config import RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.ops import binning as binning_lib
    from gsplat_tpu.ops import preprocess as preprocess_lib
    from gsplat_tpu.ops.rasterize import masked_presort_prefix, _prefix_at

    on_tpu = jax.default_backend() == "tpu"
    W, H = (1920, 1080) if on_tpu else (256, 128)
    n = 200_000 if on_tpu else 2_000
    print(f"backend={jax.default_backend()} {W}x{H} n={n}")

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=3, capacity=n)
    g = dataclasses.replace(
        g, active_sh_degree=jnp.asarray(3, jnp.int32),
        scaling=g.scaling - 1.0, opacity=g.opacity.at[:].set(0.0))
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.9)
    rcfg = RasterizerConfig()
    th, tw = rcfg.tile_h, rcfg.tile_w

    pre = jax.jit(lambda g: preprocess_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active))(g)
    m_guess = -(-int(n * 10.0) // rcfg.chunk) * rcfg.chunk
    b = jax.jit(lambda pre: binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=m_guess, align=rcfg.chunk, sort_gaussians=True))(pre)
    m_cap = -(-int(int(b.num_pairs) * 1.3) // rcfg.chunk) * rcfg.chunk
    b = jax.jit(lambda pre: binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=m_cap, align=rcfg.chunk, sort_gaussians=True))(pre)
    gidx = b.gidx_sorted
    M = int(gidx.shape[0])
    total = b.num_pairs
    print(f"M={M} pairs={int(total)} N={n}")

    # entry-grad stand-in: dense rows, sentinel rows carry garbage to make
    # sure every variant's sentinel/tail handling is exercised
    d = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))

    NROWS = n + 2  # sentinel row id is n+1 in sorted-gaussian mode? use max
    sent = int(jnp.max(gidx))
    NROWS = max(n, sent) + 1

    # --- 1. baseline: one duplicate-index scatter-add
    @jax.jit
    def v_scatter(d):
        return jnp.zeros((NROWS, 16), jnp.float32).at[gidx].add(
            d, mode="drop")
    ref, _ = timeit("scatter-add (M,16) baseline", v_scatter, d)

    # --- 2. K-way split scatter + tree add (shorter serial chains)
    # (measured: K=2 32.6 ms vs baseline 31.75 — XLA runs the scatters
    # sequentially regardless; keep one K as the record)
    for K in (2,):
        @jax.jit
        def v_split(d, K=K):
            Mk = M // K
            parts = [
                jnp.zeros((NROWS, 16), jnp.float32)
                .at[gidx[i * Mk:(i + 1) * Mk]]
                .add(d[i * Mk:(i + 1) * Mk], mode="drop")
                for i in range(K)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            return out
        out, _ = timeit(f"scatter-add split K={K}", v_split, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    # --- 3. transposed scatter: (16, NROWS) at [:, gidx]
    @jax.jit
    def v_transposed(d):
        dt_ = d.T  # (16, M)
        return jnp.zeros((16, NROWS), jnp.float32).at[:, gidx].add(
            dt_, mode="drop").T
    out, _ = timeit("scatter-add transposed (16,N)", v_transposed, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)

    # --- 4. presort gather + MXU blocked scan + boundary diff (r2-r4 form)
    @jax.jit
    def v_scan(d):
        intra, block_pre, L = masked_presort_prefix(
            d, b.inv_src, total, m_cap)
        ends = b.g_offsets + b.g_counts
        hi = _prefix_at(intra, block_pre, L, ends)
        lo = _prefix_at(intra, block_pre, L, b.g_offsets)
        return hi - lo
    out, _ = timeit("presort gather + MXU scan + diff", v_scan, d)
    # rows 0..n-1 only (scan path has no sentinel row); compare non-sentinel
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref)[:n],
                               rtol=2e-2, atol=3e-4)

    # --- 4b. the gather alone (cost isolation)
    timeit("  (presort permutation gather alone)",
           jax.jit(lambda d: d[b.inv_src]), d)

    # --- 5. segment_sum on unsorted ids
    @jax.jit
    def v_segsum(d):
        return jax.ops.segment_sum(d, gidx, num_segments=NROWS)
    out, _ = timeit("segment_sum (unsorted ids)", v_segsum, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)

    # --- 6. bf16 payload scatter (bandwidth halved; accuracy loss)
    @jax.jit
    def v_bf16(d):
        return jnp.zeros((NROWS, 16), jnp.bfloat16).at[gidx].add(
            d.astype(jnp.bfloat16), mode="drop").astype(jnp.float32)
    timeit("scatter-add bf16 payload (approx)", v_bf16, d)

    print("ALL_DONE_SCATTER")


if __name__ == "__main__":
    main()
