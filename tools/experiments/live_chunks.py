#!/usr/bin/env python
"""Quantify dead chunk-iterations in the stream compositor at the bench
workload: the strip kernels run a fori_loop body for EVERY chunk slot
(m_out/G ≈ 29.5k), but a body iteration only does real work when
rank0 < count (fwd) or rank0 < count_clamped_to_max_nc (bwd), and fwd
work past whole-tile early termination is masked dead too. If the live
fraction is small, per-iteration fixed cost dominates the kernel and a
live-list (precomputed skip) form is the next lever.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
       tools/experiments/live_chunks.py
"""
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from gsplat_tpu.config import RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.ops import rasterize
    from gsplat_tpu.ops.rasterize import composite_dispatch, pack_entries
    from gsplat_tpu.ops import binning as binning_lib
    from gsplat_tpu.ops import preprocess as preprocess_lib

    on_tpu = jax.default_backend() == "tpu"
    W, H = (1920, 1080) if on_tpu else (256, 128)
    n = 200_000 if on_tpu else 2_000
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=3, capacity=n)
    g = dataclasses.replace(
        g, active_sh_degree=jnp.asarray(3, jnp.int32),
        scaling=g.scaling - 1.0, opacity=g.opacity.at[:].set(0.0))
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.9)
    rcfg = RasterizerConfig(use_pallas=on_tpu)
    th, tw = rcfg.tile_h, rcfg.tile_w
    G = rcfg.chunk

    pre = jax.jit(lambda g: preprocess_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active))(g)
    m_guess = -(-int(n * 10.0) // G) * G
    binf = jax.jit(lambda pre, mc: binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=mc, align=G, sort_gaussians=True), static_argnums=1)
    b = binf(pre, m_guess)
    m_cap = -(-int(int(b.num_pairs) * 1.3) // G) * G
    b = binf(pre, m_cap)

    n_tiles_x, n_tiles_y = -(-W // tw), -(-H // th)
    perm_ext = jnp.concatenate(
        [b.perm, jnp.full((1,), n, jnp.int32)])
    entries = pack_entries(pre)[perm_ext][b.gidx_sorted]
    # pad to whole strips for the stream kernel
    from gsplat_tpu.ops.pallas.composite_stream import pad_chunks_to_strips
    m_out = entries.shape[0]
    m_pad = pad_chunks_to_strips(m_out, G, rcfg.strip_chunks)
    entries = jnp.pad(entries, ((0, m_pad - m_out), (0, 0)))

    out = jax.jit(lambda e, ts, tc: composite_dispatch(
        e, ts, tc, rcfg, n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y))(
            entries, b.tile_start, b.tile_count)

    tile_count = np.asarray(b.tile_count)
    nc = np.asarray(out.n_contrib)                       # (T,P)
    max_nc = nc.max(axis=1)                              # (T,)
    T = tile_count.shape[0]
    n_chunks = m_pad // G

    total_ch = n_chunks
    live_count = int(np.ceil(tile_count / G).sum())      # fwd by-count
    live_bwd = int(np.ceil(np.minimum(tile_count, max_nc) / G).sum())
    # fwd with termination-jump: a tile's visited chunks = chunks until
    # every pixel crossed (max_nc) + 1 snapshot visit at its last chunk
    live_fwd_term = int((np.minimum(np.ceil(tile_count / G),
                                    np.ceil(max_nc / G) + 1)
                         + 1).clip(max=np.ceil(tile_count / G) + 0)
                        [tile_count > 0].sum())
    print(f"tiles={T} nonempty={(tile_count > 0).sum()} "
          f"pairs={int(b.num_pairs)} m_out={m_out} chunks={total_ch}")
    print(f"tile_count: mean={tile_count.mean():.1f} "
          f"p50={np.percentile(tile_count, 50):.0f} "
          f"p95={np.percentile(tile_count, 95):.0f} "
          f"max={tile_count.max()}")
    print(f"max_nc:     mean={max_nc.mean():.1f} "
          f"p50={np.percentile(max_nc, 50):.0f} "
          f"p95={np.percentile(max_nc, 95):.0f} max={max_nc.max()}")
    print(f"chunk iterations: total={total_ch}")
    print(f"  live fwd (rank0<count):          {live_count} "
          f"({100 * live_count / total_ch:.1f}%)")
    print(f"  live fwd (count + term-jump):    {live_fwd_term} "
          f"({100 * live_fwd_term / total_ch:.1f}%)")
    print(f"  live bwd (count clamped to nc):  {live_bwd} "
          f"({100 * live_bwd / total_ch:.1f}%)")
    print("ALL_DONE_LIVE")


if __name__ == "__main__":
    main()
