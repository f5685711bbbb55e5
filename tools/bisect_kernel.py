#!/usr/bin/env python
"""Decompose the compositor FORWARD kernel's per-chunk cost on the real
chip: time semantically-broken variants with individual stages disabled to
attribute the ~2.8 us/chunk between the transmittance matmul+exp, the
early-out bookkeeping, the accumulation matmul and the alpha evaluation.

Chained-loop timing (see memory: block_until_ready lies on this backend).
Inputs are the bench scene's real binned entry list at right-sized m_cap.
"""
import dataclasses
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.pallas.composite import (_tri_lower, _pixel_coords,
                                             _alpha_terms, chunk_tables)


def make_fwd(G, P, n_tiles_x, tile_h, tile_w, *, do_alpha=True,
             do_scan=True, do_early=True, do_accum=True,
             alpha_min=1 / 255, alpha_max=0.99, t_eps=1e-4):
    def kernel(ct_ref, rank0_ref, cnt_ref, base_ref, entries_ref, tinit_ref,
               accum_ref, tfinal_ref, nc_ref, st_t, st_done):
        i = pl.program_id(0)
        t = ct_ref[i] + base_ref[0]
        rank0 = rank0_ref[i]
        count = cnt_ref[i]

        @pl.when(rank0 == 0)
        def _init():
            accum_ref[0] = jnp.zeros((4, P), jnp.float32)
            tfinal_ref[0] = jnp.ones((1, P), jnp.float32)
            nc_ref[0] = jnp.zeros((1, P), jnp.int32)
            st_t[:] = jnp.ones((1, P), jnp.float32)
            st_done[:] = jnp.zeros((1, P), jnp.float32)

        live = jnp.logical_and(rank0 < count, st_done[0, 0] < 2.0)

        @pl.when(live)
        def _step():
            px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            data = entries_ref[:]
            tcur = st_t[:]
            done = st_done[:] > 0.0
            if do_alpha:
                _, _, power, alpha_raw = _alpha_terms(data, px, py)
                alpha = jnp.minimum(alpha_raw, alpha_max)
                valid = (rank0 + g_iota) < count
                a1 = jnp.where(valid & (alpha >= alpha_min) & (power <= 0.0),
                               alpha, 0.0)
            else:
                a1 = data[:, 5:6] * (0.1 + 0.0 * px)      # cheap stand-in
            if do_scan:
                lg = jnp.log1p(-a1)
                t_excl = tcur * jnp.exp(
                    jnp.dot(_tri_lower(G, strict=True), lg,
                            preferred_element_type=jnp.float32))
            else:
                lg = -a1
                t_excl = tcur * (1.0 - a1)
            if do_early:
                t_arr = tinit_ref[0]
                cross = (a1 > 0.0) & (t_arr * t_excl * (1.0 - a1) < t_eps)
                first_cross = jnp.min(jnp.where(cross, g_iota, G), axis=0,
                                      keepdims=True)
                contrib = (a1 > 0.0) & (g_iota < first_cross) \
                    & jnp.logical_not(done)
                new_done = done | jnp.any(cross, axis=0, keepdims=True)
                rank1 = rank0 + g_iota + 1
                nc_ref[0] = jnp.maximum(
                    nc_ref[0], jnp.max(jnp.where(contrib, rank1, 0), axis=0,
                                       keepdims=True))
                st_done[:] = new_done.astype(jnp.float32)
            else:
                contrib = a1 > 0.0
                new_done = done
            if do_accum:
                w = jnp.where(contrib, t_excl * a1, 0.0)
                col = data[:, 6:10]
                accum_ref[0] += jax.lax.dot_general(
                    col, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            lg2 = jnp.where(contrib, lg, 0.0)
            st_t[:] = tcur * jnp.exp(jnp.sum(lg2, axis=0, keepdims=True)) \
                if do_scan else tcur * (1.0 + jnp.sum(lg2, axis=0,
                                                      keepdims=True))
            tfinal_ref[0] = st_t[:]
            if do_early:
                @pl.when(jnp.all(new_done))
                def _():
                    st_done[:] = jnp.full((1, P), 2.0)

    return kernel


def main():
    from gsplat_tpu.config import RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.ops import binning as binning_lib
    from gsplat_tpu.ops import preprocess as preprocess_lib
    from gsplat_tpu.ops.rasterize import pack_entries

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
    P = th * tw
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    T = n_tiles_x * n_tiles_y

    pre = preprocess_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H, active_mask=g.active)
    probe = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=2_000_128, align=G, sort_gaussians=True)
    m_cap = -(-int(int(probe.num_pairs) * 1.3) // G) * G
    b = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=m_cap, align=G, sort_gaussians=True)
    perm_ext = jnp.concatenate([b.perm, jnp.full((1,), n, jnp.int32)])
    entries = pack_entries(pre)[perm_ext][b.gidx_sorted]
    entries = jax.block_until_ready(entries)
    M = entries.shape[0]
    n_chunks = M // G
    print(f"pairs={int(b.num_pairs)} m_cap={m_cap} M_out={M} "
          f"chunks={n_chunks}", flush=True)

    ct, rank0, cnt = chunk_tables(b.tile_start, b.tile_count, n_tiles=T,
                                  chunk=G, n_chunks=n_chunks)
    base = jnp.zeros((1,), jnp.int32)
    tinit = jnp.ones((T + 1, 1, P), jnp.float32)

    def call(kernel, entries):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((G, 16), lambda i, ct, r0, cn, tb: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct, r0, cn, tb:
                             (ct[i], 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 4, P), lambda i, ct, r0, cn, tb:
                             (ct[i], 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct, r0, cn, tb:
                             (ct[i], 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct, r0, cn, tb:
                             (ct[i], 0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),
                            pltpu.VMEM((1, P), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((T + 1, 4, P), jnp.float32),
                       jax.ShapeDtypeStruct((T + 1, 1, P), jnp.float32),
                       jax.ShapeDtypeStruct((T + 1, 1, P), jnp.int32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ct, rank0, cnt, base, entries, tinit)

    def timeit(name, kernel, iters=12):
        @jax.jit
        def chained(e):
            accum, tf, nc = call(kernel, e)
            s = accum[0, 0, 0] + tf[0, 0, 0]
            return e + (s * 1e-30), s
        e, s = chained(entries)
        float(s)
        t0 = time.perf_counter()
        e = entries
        for _ in range(iters):
            e, s = chained(e)
        float(s)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt * 1e3:8.2f} ms "
              f"({dt / n_chunks * 1e9:6.0f} ns/chunk)", flush=True)
        return dt

    mk = functools.partial(make_fwd, G, P, n_tiles_x, th, tw)
    timeit("full forward", mk())
    timeit("  -early-out bookkeeping", mk(do_early=False))
    timeit("  -scan matmul+exp (linear T)", mk(do_scan=False))
    timeit("  -accum matmul", mk(do_accum=False))
    timeit("  -alpha eval (const alpha)", mk(do_alpha=False))
    timeit("  bare (no alpha/scan/early/accum)",
           mk(do_alpha=False, do_scan=False, do_early=False,
              do_accum=False))


if __name__ == "__main__":
    main()
