#!/usr/bin/env python
"""Stage-wise timing of the train step on the real chip: preprocess, binning,
gather, composite fwd, full render fwd, render fwd+bwd, ssim, full step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py
"""
import dataclasses
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
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.ops import binning as binning_lib
    from gsplat_tpu.ops import preprocess as preprocess_lib
    from gsplat_tpu.ops import losses
    from gsplat_tpu.ops.rasterize import render, pack_entries
    from gsplat_tpu.train import trainer

    on_tpu = jax.default_backend() == "tpu"
    W, H = (1920, 1080) if on_tpu else (256, 128)
    n = 200_000 if on_tpu else 2_000
    print(f"backend={jax.default_backend()} {W}x{H} n={n}")

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0   # match bench.py's scene
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=3, capacity=n)
    g = dataclasses.replace(
        g, active_sh_degree=jnp.asarray(3, jnp.int32),
        scaling=g.scaling - 1.0,
        opacity=g.opacity.at[:].set(0.0))
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.9)
    opt = OptimizationConfig()
    rcfg = RasterizerConfig(use_pallas=on_tpu, pairs_per_gaussian=10.0)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))

    th, tw = rcfg.tile_h, rcfg.tile_w

    # --- stage 1: preprocess
    @jax.jit
    def f_pre(g):
        return preprocess_lib.preprocess(
            g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
            g.get_features(), g.active_sh_degree, cam, W, H,
            active_mask=g.active)
    pre = f_pre(g)
    timeit("preprocess", f_pre, g)

    # --- stage 2: binning — the SAME configuration render() uses
    # (depth-presorted gaussians, tight extents), at the right-sized m_cap
    # a warmed-up training run / bench.py reaches (pairs x 1.3)
    probe = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=th, tile_w=tw,
        m_cap=-(-int(n * rcfg.pairs_per_gaussian) // rcfg.chunk) * rcfg.chunk,
        align=rcfg.chunk, sort_gaussians=True)
    m_cap = -(-int(int(probe.num_pairs) * 1.3) // rcfg.chunk) * rcfg.chunk
    rcfg = dataclasses.replace(rcfg, pairs_per_gaussian=m_cap / n)

    @jax.jit
    def f_bin(pre):
        return binning_lib.bin_gaussians(
            pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
            image_width=W, image_height=H,
            tile_h=th, tile_w=tw, m_cap=m_cap, align=rcfg.chunk,
            sort_gaussians=True)
    b = f_bin(pre)
    print(f"  num_pairs={int(b.num_pairs)} overflow={int(b.overflow)} "
          f"m_cap={m_cap} M_out={b.gidx_sorted.shape[0]}")
    timeit("binning(sort)", f_bin, pre)

    # --- stage 3: gather
    @jax.jit
    def f_gather(pre, b):
        perm_ext = jnp.concatenate(
            [b.perm, jnp.full((1,), pre.mean2d.shape[0], jnp.int32)])
        return pack_entries(pre)[perm_ext][b.gidx_sorted]
    entries = f_gather(pre, b)
    timeit("pack+gather", f_gather, pre, b)

    # --- stage 3b: gather backward (the one duplicate scatter-add)
    @jax.jit
    def f_gather_vjp(pre, b, entries):
        perm_ext = jnp.concatenate(
            [b.perm, jnp.full((1,), pre.mean2d.shape[0], jnp.int32)])
        _, vjp = jax.vjp(lambda e: e[b.gidx_sorted],
                         pack_entries(pre)[perm_ext])
        return vjp(entries)[0]
    f_gather_vjp(pre, b, entries)
    timeit("gather VJP (scatter-add)", f_gather_vjp, pre, b, entries)

    # --- stage 4: composite fwd/bwd — whatever kernel form rcfg selects
    # (stream by default; composite_dispatch routes exactly as render())
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    if on_tpu:
        from gsplat_tpu.ops.rasterize import composite_dispatch

        # the stream grid needs whole strips: re-bin at the padded extent
        # render() would use (stream path rounds m_cap up, pad_cap capped)
        if rcfg.compositor == "stream":
            from gsplat_tpu.ops.pallas.composite_stream import \
                pad_chunks_to_strips
            pc = rcfg.chunk * n_tiles_x * n_tiles_y
            mc2 = pad_chunks_to_strips(m_cap + pc, rcfg.chunk,
                                       rcfg.strip_chunks) - pc

            @jax.jit
            def f_bin2(pre):
                return binning_lib.bin_gaussians(
                    pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
                    image_width=W, image_height=H,
                    tile_h=th, tile_w=tw, m_cap=mc2, align=rcfg.chunk,
                    sort_gaussians=True)
            b = f_bin2(pre)
            entries = f_gather(pre, b)

        @jax.jit
        def f_comp(entries, ts, tc):
            return composite_dispatch(entries, ts, tc, rcfg,
                                      n_tiles_x=n_tiles_x,
                                      n_tiles_y=n_tiles_y)
        out = f_comp(entries, b.tile_start, b.tile_count)
        timeit(f"composite fwd ({rcfg.compositor})", f_comp, entries,
               b.tile_start, b.tile_count)

        @jax.jit
        def f_comp_bwd(entries, ts, tc):
            def loss(e):
                o = composite_dispatch(e, ts, tc, rcfg,
                                       n_tiles_x=n_tiles_x,
                                       n_tiles_y=n_tiles_y)
                return jnp.sum(o.accum) + jnp.sum(o.t_final)
            return jax.grad(loss)(entries)
        f_comp_bwd(entries, b.tile_start, b.tile_count)
        timeit(f"composite fwd+bwd ({rcfg.compositor})", f_comp_bwd,
               entries, b.tile_start, b.tile_count)

    # --- full render fwd
    @jax.jit
    def f_render(g):
        return render(g, cam, W, H, bg, rcfg).image
    img = f_render(g)
    timeit("render fwd", f_render, g)

    # --- render fwd+bwd (L1 only)
    @jax.jit
    def f_render_grad(g):
        def loss(tr):
            params = gm.with_trainables(g, tr)
            out = render(params, cam, W, H, bg, rcfg)
            return losses.l1_loss(out.image, gt)
        return jax.grad(loss)(gm.trainables(g))
    f_render_grad(g)
    timeit("render fwd+bwd (L1)", f_render_grad, g)

    # --- ssim fwd+bwd
    @jax.jit
    def f_ssim(img):
        return jax.grad(lambda x: losses.ssim(x, gt))(img)
    f_ssim(img)
    timeit("ssim fwd+bwd", f_ssim, img)

    # --- full train step
    state = trainer.init_state(g, 1)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)

    def f_step(state):
        return trainer.train_step(
            state, cam, gt, ones, zeros, zeros, bg,
            image_width=W, image_height=H, opt=opt, rcfg=rcfg,
            spatial_lr_scale=1.0, antialiasing=False, use_sparse_adam=False,
            train_test_exp=False, use_depth=False)
    f_step(state)
    dt = timeit("full train step", f_step, state)
    print(f"pixels/s: {W * H / dt:.3e}")


if __name__ == "__main__":
    main()
