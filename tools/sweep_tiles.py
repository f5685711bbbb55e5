#!/usr/bin/env python
"""Full-train-step timing for one (tile_h, tile_w, chunk) config on the
real chip — the tile-shape lever: larger tiles cut the (tile,depth) pair
count (every M-sized binning/gather/reduction pass scales with it) at the
price of more pixels evaluated per pair inside the kernel.

Chained-loop timing (state feeds state; see memory: unchained identical
calls are elided by the axon backend).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python tools/sweep_tiles.py <tile_h> <tile_w> <chunk> \
           [compositor] [strip_chunks]
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


def main():
    from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
    from gsplat_tpu.core.camera import CameraView
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.train import trainer

    th, tw, chunk = (int(a) for a in sys.argv[1:4])
    compositor = sys.argv[4] if len(sys.argv) > 4 else "chunk"
    strip = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    on_tpu = jax.default_backend() == "tpu"
    W, H = (1920, 1080) if on_tpu else (256, 128)
    n = 200_000 if on_tpu else 2_000
    print(f"backend={jax.default_backend()} {W}x{H} n={n} "
          f"tile={th}x{tw} chunk={chunk} comp={compositor} strip={strip}",
          flush=True)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0   # bench.py's scene
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, max_sh_degree=3, capacity=n)
    g = dataclasses.replace(
        g, active_sh_degree=jnp.asarray(3, jnp.int32),
        scaling=g.scaling - 1.0,
        opacity=g.opacity.at[:].set(0.0))
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.9)
    opt = OptimizationConfig()
    ppg0 = float(os.environ.get("SWEEP_PPG", "10.0"))
    rcfg = RasterizerConfig(use_pallas=on_tpu, pairs_per_gaussian=ppg0,
                            tile_h=th, tile_w=tw, chunk=chunk,
                            compositor=compositor, strip_chunks=strip)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    state = trainer.init_state(g, 1)

    def make_step(rcfg):
        def step(state):
            return trainer.train_step(
                state, cam, gt, ones, zeros, zeros, bg,
                image_width=W, image_height=H, opt=opt, rcfg=rcfg,
                spatial_lr_scale=1.0, antialiasing=False,
                use_sparse_adam=False, train_test_exp=False, use_depth=False)
        return step

    state0 = state
    step = make_step(rcfg)
    state, aux = step(state)
    jax.block_until_ready(state.gaussians.xyz)
    pairs = int(aux.num_pairs)
    assert int(aux.overflow) == 0, f"overflow {int(aux.overflow)}"
    ppg = max(pairs * 1.3 / n, 2.0)
    pad_cap = max(chunk, int((int(aux.num_padded) - pairs) * 1.5))
    rcfg = dataclasses.replace(rcfg, pairs_per_gaussian=ppg,
                               pad_cap=pad_cap)
    step = make_step(rcfg)
    state, aux = step(state0)
    jax.block_until_ready(state.gaussians.xyz)
    assert int(aux.overflow) == 0
    m_cap = -(-int(n * ppg) // chunk) * chunk
    n_tiles = (-(-W // tw)) * (-(-H // th))
    print(f"pairs={pairs} m_cap={m_cap} "
          f"m_out={m_cap + (-(-pad_cap // chunk)) * chunk} tiles={n_tiles}",
          flush=True)

    iters = 7 if on_tpu else 2
    best = float("inf")
    ovf = jnp.zeros((), jnp.int32)
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state)
            ovf = jnp.maximum(ovf, aux.overflow)
        jax.block_until_ready(state.gaussians.xyz)
        best = min(best, time.perf_counter() - t0)
    assert int(ovf) == 0
    dt = best / iters
    print(f"RESULT tile={th}x{tw} chunk={chunk} comp={compositor} "
          f"strip={strip} step={dt * 1e3:.2f} ms "
          f"px/s={W * H / dt:.3e} vs_baseline={W * H / dt / 1.4e7:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
