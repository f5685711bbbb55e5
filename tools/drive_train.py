"""End-to-end training drive on a synthetic scene (no dataset needed).

Builds a ground-truth scene from a random Gaussian model, renders GT images
from a ring of cameras, then trains a fresh model (with densification) to
fit them. Every 4th camera is HELD OUT of training (llffhold-style): the
reported test PSNR is true novel-view generalization, not self-fit. Both
train and test PSNR must climb — exercises the full train loop: render
fwd/bwd, SSIM, Adam, densify/clone/split/prune, opacity reset, SH warmup.
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import dataclasses
from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import losses
from gsplat_tpu.ops.rasterize import render
from gsplat_tpu.train import trainer


def ring_camera(angle, radius=8.0, fovx=0.9, fovy=0.7):
    # camera on a ring in the xz plane looking at origin
    c, s = math.cos(angle), math.sin(angle)
    pos = np.array([radius * s, 0.0, -radius * c])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    upv = np.cross(fwd, right)
    Rcw = np.stack([right, upv, fwd], axis=1)  # cam→world (columns)
    t = -Rcw.T @ pos
    return CameraView.create(R=Rcw, T=t, fovx=fovx, fovy=fovy)


def main():
    on_tpu = jax.default_backend() == "tpu"
    W, H = (512, 256) if on_tpu else (128, 64)
    n_gt, n_init = (3000, 400) if on_tpu else (400, 80)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else (300 if on_tpu else 30)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n_gt, 3)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n_gt, 3)).astype(np.float32)
    g_gt = gm.create_from_pcd(pts, colors, 0, capacity=n_gt)
    g_gt = dataclasses.replace(g_gt, opacity=g_gt.opacity.at[:].set(1.5))

    rcfg = RasterizerConfig(use_pallas=on_tpu, pairs_per_gaussian=96.0)
    bg = jnp.zeros(3, jnp.float32)
    cams = [ring_camera(a) for a in np.linspace(0, 2 * math.pi, 12,
                                                endpoint=False)]
    t_wall = time.time()

    def mark(what):
        print(f"[{time.time() - t_wall:6.0f}s] {what}", flush=True)

    mark("rendering GT views (first = render compile)")
    gts = [jnp.clip(render(g_gt, c, W, H, bg, rcfg).image, 0, 1)
           for c in cams]
    jax.block_until_ready(gts[-1])
    mark("GT done")
    # llffhold-style split: every 4th view is test-only (never trained on)
    test_idx = set(range(0, len(cams), 4))
    train_ids = [i for i in range(len(cams)) if i not in test_idx]

    # init a smaller model from noisy GT points
    sel = rng.choice(n_gt, n_init, replace=False)
    init_pts = pts[sel] + 0.05 * rng.standard_normal((n_init, 3)).astype(np.float32)
    g0 = gm.create_from_pcd(init_pts, colors[sel], 1, capacity=4 * n_init)

    opt = OptimizationConfig(
        iterations=iters, densify_from_iter=20, densification_interval=50,
        opacity_reset_interval=10 * iters, position_lr_max_steps=iters)
    state = trainer.init_state(g0, len(cams))
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)

    def psnr_now(state, ids):
        vals = []
        for i in ids:
            img = render(state.gaussians, cams[i], W, H, bg, rcfg).image
            vals.append(float(losses.psnr(img[None], gts[i][None]).mean()))
        return float(np.mean(vals))

    mark("initial PSNR (psnr-render compile)")
    p0_train = psnr_now(state, train_ids)
    p0_test = psnr_now(state, sorted(test_idx))
    mark("entering train loop (first iter = train_step compile)")
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for it in range(1, iters + 1):
        i = train_ids[rng.integers(0, len(train_ids))]
        state, aux = trainer.train_step(
            state, cams[i], gts[i], ones, zeros, zeros, bg,
            image_width=W, image_height=H, opt=opt, rcfg=rcfg,
            spatial_lr_scale=2.0, antialiasing=False, use_sparse_adam=False,
            train_test_exp=False, use_depth=False)
        if it == 1:
            jax.block_until_ready(state.gaussians.xyz)
            mark("first train iter done")
        if it > opt.densify_from_iter and it % opt.densification_interval == 0:
            key, sub = jax.random.split(key)
            state, ovf = trainer.densify_step(
                state, sub, 2.0, opt=opt, use_screen_size_prune=False)
        if it % 50 == 0:
            print(f"iter {it}: loss={float(aux.loss):.4f} "
                  f"n={int(np.asarray(state.gaussians.num_active()))} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    p1_train = psnr_now(state, train_ids)
    p1_test = psnr_now(state, sorted(test_idx))
    dt = time.time() - t0
    print(f"train PSNR {p0_train:.2f} → {p1_train:.2f} dB, "
          f"HELD-OUT test PSNR {p0_test:.2f} → {p1_test:.2f} dB over "
          f"{iters} iters ({iters/dt:.2f} it/s, "
          f"n={int(np.asarray(state.gaussians.num_active()))})")
    assert p1_train > p0_train + 3.0, "train PSNR did not improve by >3dB"
    assert p1_test > p0_test + 3.0, "held-out PSNR did not improve by >3dB"
    print("OK")


if __name__ == "__main__":
    main()
