#!/usr/bin/env python
"""Hunt the first NaN in the TPU training drive.

Args: [pallas|xla] [iters]. Checks every param leaf + grads each iteration;
prints the first iteration where anything goes non-finite and which leaf.
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import dataclasses
from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops.rasterize import render
from gsplat_tpu.train import trainer
from tools.drive_train import ring_camera


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    W, H = 512, 256
    n_gt, n_init = 3000, 400

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n_gt, 3)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n_gt, 3)).astype(np.float32)
    g_gt = gm.create_from_pcd(pts, colors, 0, capacity=n_gt)
    g_gt = dataclasses.replace(g_gt, opacity=g_gt.opacity.at[:].set(1.5))

    rcfg = RasterizerConfig(use_pallas=(impl == "pallas"),
                            pairs_per_gaussian=32.0)
    bg = jnp.zeros(3, jnp.float32)
    cams = [ring_camera(a) for a in np.linspace(0, 2 * math.pi, 12,
                                                endpoint=False)]
    gts = [jnp.clip(render(g_gt, c, W, H, bg, rcfg).image, 0, 1)
           for c in cams]
    for ci, gt in enumerate(gts):
        nb = int((~np.isfinite(np.asarray(gt))).sum())
        if nb:
            print(f"gt[{ci}] has {nb} non-finite pixels!")

    sel = rng.choice(n_gt, n_init, replace=False)
    init_pts = pts[sel] + 0.05 * rng.standard_normal(
        (n_init, 3)).astype(np.float32)
    g0 = gm.create_from_pcd(init_pts, colors[sel], 1, capacity=4 * n_init)

    opt = OptimizationConfig(
        iterations=iters, densify_from_iter=20, densification_interval=50,
        opacity_reset_interval=10 * iters, position_lr_max_steps=iters)
    state = trainer.init_state(g0, len(cams))
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)

    def check(state, it, tag):
        g = state.gaussians
        act = np.asarray(g.active)
        bad = []
        for name in gm.TRAINABLE_FIELDS:
            arr = np.asarray(getattr(g, name))
            arr = arr[act] if arr.shape[0] == act.shape[0] else arr
            if not np.isfinite(arr).all():
                n_bad = int((~np.isfinite(arr).reshape(arr.shape[0], -1)
                             .all(axis=1)).sum())
                bad.append(f"{name}({n_bad} rows)")
        for name in gm.TRAINABLE_FIELDS:
            mu = np.asarray(state.adam.mu[name])[act if np.asarray(
                state.adam.mu[name]).shape[0] == act.shape[0] else slice(None)]
            if not np.isfinite(mu).all():
                bad.append(f"mu.{name}")
        if bad:
            print(f"[{tag} iter {it}] NON-FINITE: {', '.join(bad)}")
            return True
        return False

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    prev = state
    for it in range(1, iters + 1):
        i = rng.integers(0, len(cams))
        prev = state
        state, aux = trainer.train_step(
            state, cams[i], gts[i], ones, zeros, zeros, bg,
            image_width=W, image_height=H, opt=opt, rcfg=rcfg,
            spatial_lr_scale=2.0, antialiasing=False, use_sparse_adam=False,
            train_test_exp=False, use_depth=False)
        if not np.isfinite(float(aux.loss)):
            print(f"iter {it}: loss NaN (cam {i})")
            g = prev.gaussians
            np.savez("/tmp/nan_repro.npz", cam=i,
                     **{k: np.asarray(getattr(g, k)) for k in
                        ("xyz", "f_dc", "f_rest", "scaling", "rotation",
                         "opacity", "active", "active_sh_degree")})
            np.save("/tmp/nan_gt.npy", np.asarray(gts[i]))
            import pickle
            leaves, treedef = jax.tree_util.tree_flatten(prev)
            with open("/tmp/nan_state.pkl", "wb") as f:
                pickle.dump(([np.asarray(x) for x in leaves], treedef), f)
            print("saved /tmp/nan_repro.npz + /tmp/nan_gt.npy + "
                  "/tmp/nan_state.pkl")
            break
        if check(state, it, impl):
            # dump state stats on the first bad iter
            g = state.gaussians
            act = np.asarray(g.active)
            sc = np.asarray(g.scaling)[act]
            print("scaling range:", sc.min(), sc.max())
            op = np.asarray(g.opacity)[act]
            print("opacity range:", op.min(), op.max())
            rot = np.asarray(g.rotation)[act]
            print("rot norm min:", np.linalg.norm(rot, axis=1).min())
            break
        if it > opt.densify_from_iter and it % opt.densification_interval == 0:
            key, sub = jax.random.split(key)
            state, ovf = trainer.densify_step(
                state, sub, 2.0, opt=opt, use_screen_size_prune=False)
            if check(state, it, impl + "+densify"):
                break
        if it % 50 == 0:
            print(f"iter {it}: loss={float(aux.loss):.4f} "
                  f"n={int(np.asarray(state.gaussians.num_active()))} "
                  f"overflow={int(aux.overflow)} pairs={int(aux.num_pairs)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    else:
        print("no NaN found")


if __name__ == "__main__":
    main()
