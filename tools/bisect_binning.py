#!/usr/bin/env python
"""Decompose bin_gaussians' ~38 ms at the render-path config (depth-
presorted, tight extents, right-sized m_cap): gaussian depth-sort, the
three diff-scatter+cumsum expansions, pointwise key build, histogram, the
packed-key entry sort, and the align/permutation stage. Chained-loop
timing (memory: block_until_ready lies on this backend)."""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    from gsplat_tpu.config import RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.ops import binning as binning_lib
    from gsplat_tpu.ops import preprocess as preprocess_lib
    from gsplat_tpu.ops.binning import _expand, tile_rect

    W, H = 1920, 1080
    n = 200_000
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, 3, capacity=n)
    g = dataclasses.replace(
        g, active_sh_degree=jnp.asarray(3, jnp.int32),
        scaling=g.scaling - 1.0, opacity=g.opacity.at[:].set(0.0))
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.9)
    rcfg = RasterizerConfig()
    th, tw, G = rcfg.tile_h, rcfg.tile_w, rcfg.chunk
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    n_tiles = n_tiles_x * n_tiles_y

    pre = preprocess_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H, active_mask=g.active)
    probe = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=2_000_128, align=G, sort_gaussians=True)
    m_cap = -(-int(int(probe.num_pairs) * 1.3) // G) * G
    print(f"pairs={int(probe.num_pairs)} m_cap={m_cap}", flush=True)

    mean2d = jax.block_until_ready(pre.mean2d)
    depth, radius, rx, ry = pre.depth, pre.radius, pre.rx, pre.ry

    def full(mean2d):
        return binning_lib.bin_gaussians(
            mean2d, depth, radius, rx=rx, ry=ry, image_width=W,
            image_height=H, tile_h=th, tile_w=tw, m_cap=m_cap, align=G,
            sort_gaussians=True).gidx_sorted
    timeit("full bin_gaussians", full, mean2d)

    # row-culled variant at ITS OWN right-sized m_cap — the honest A/B:
    # slot math costs dense (N,R) work, every M-sized pass shrinks
    probe_c = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        conic=pre.conic, t_cut=pre.t_cut, image_width=W, image_height=H,
        tile_h=th, tile_w=tw, m_cap=2_000_128, align=G, sort_gaussians=True)
    m_cap_c = -(-int(int(probe_c.num_pairs) * 1.3) // G) * G
    print(f"culled pairs={int(probe_c.num_pairs)} "
          f"({int(probe_c.num_pairs) / max(int(probe.num_pairs), 1):.2f}x) "
          f"m_cap={m_cap_c}", flush=True)

    def full_cull(mean2d):
        return binning_lib.bin_gaussians(
            mean2d, depth, radius, rx=rx, ry=ry, conic=pre.conic,
            t_cut=pre.t_cut, image_width=W, image_height=H, tile_h=th,
            tile_w=tw, m_cap=m_cap_c, align=G,
            sort_gaussians=True).gidx_sorted
    timeit("full bin_gaussians (row-culled)", full_cull, mean2d)

    def gsort(depth):
        return jax.lax.sort((depth, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1)[1]
    timeit("  gaussian depth-sort (N)", gsort, depth)

    # precompute the presorted per-gaussian arrays once
    _, perm = jax.lax.sort((depth, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1)
    m2 = mean2d[perm]
    rxp, ryp, radp = rx[perm], ry[perm], radius[perm]
    x0, y0, x1, y1 = tile_rect(m2, rxp, ryp, n_tiles_x, n_tiles_y, th, tw)
    rect_w = jnp.maximum(x1 - x0, 0)
    counts = jnp.where((radp > 0) & (rxp > 0) & (ryp > 0),
                       rect_w * jnp.maximum(y1 - y0, 0), 0).astype(jnp.int32)
    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    offsets = jax.block_until_ready(offsets)

    def expands(offsets):
        a = _expand(jnp.arange(n, dtype=jnp.int32), offsets, m_cap)
        b = _expand(offsets, offsets, m_cap)
        wmult = 1 << int(n_tiles_x).bit_length()
        bw = (y0 * n_tiles_x + x0) * wmult + jnp.maximum(rect_w, 1)
        c = _expand(bw, offsets, m_cap)
        return a + b + c
    timeit("  3 expansions (scatter+cumsum, M)", expands, offsets)

    gidx = _expand(jnp.arange(n, dtype=jnp.int32), offsets, m_cap)
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)
    gbits = int(n).bit_length()
    key = jax.block_until_ready(
        (jnp.minimum(gidx, n_tiles) << gbits) | jnp.minimum(gidx, n))

    def esort(key):
        return jax.lax.sort((key, e_idx), num_keys=1)[1]
    timeit("  entry sort (packed key, M x 2 ops)", esort, key)

    key_s, e_s = jax.lax.sort((key, e_idx), num_keys=1)
    tile_s = key_s >> gbits
    dest = jax.block_until_ready(e_idx)  # stand-in monotone dest

    def align_stage(e_s):
        m_out = m_cap + G * n_tiles
        ga = jnp.full((m_out,), n, jnp.int32).at[dest].set(
            jnp.minimum(e_s, n), mode="drop", unique_indices=True)
        inv = jnp.zeros((m_cap,), jnp.int32).at[e_s % m_cap].set(
            dest, mode="drop", unique_indices=True)
        return ga[0] + inv[0]
    timeit("  align stage (2 permutation scatters)", align_stage, e_s)

    def hist(x0):
        one = (counts > 0).astype(jnp.int32)
        grid = jnp.zeros((n_tiles_y + 1, n_tiles_x + 1), jnp.int32)
        grid = grid.at[y0, x0].add(one, mode="drop")
        grid = grid.at[y0, x1].add(-one, mode="drop")
        grid = grid.at[y1, x0].add(-one, mode="drop")
        grid = grid.at[y1, x1].add(one, mode="drop")
        return jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    timeit("  4-corner histogram (N scatters)", hist, x0)


if __name__ == "__main__":
    main()
