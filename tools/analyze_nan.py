#!/usr/bin/env python
"""Bisect a captured NaN repro (/tmp/nan_repro.npz from debug_nan.py):
check preprocess intermediates, entries, and both compositors."""
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import preprocess as preprocess_lib
from gsplat_tpu.ops import composite_ref
from gsplat_tpu.ops.rasterize import render, pack_entries
from tools.drive_train import ring_camera


def chk(name, x):
    x = np.asarray(x)
    finite = np.isfinite(x)
    n_bad = int((~finite).sum())
    print(f"{name:14s} shape={x.shape} bad={n_bad}"
          + (f" badrows={np.unique(np.argwhere(~finite)[:, 0])[:10]}"
             if n_bad else ""))
    return n_bad


def main():
    d = np.load("/tmp/nan_repro.npz")
    g = gm.GaussianParams(
        xyz=jnp.asarray(d["xyz"]), f_dc=jnp.asarray(d["f_dc"]),
        f_rest=jnp.asarray(d["f_rest"]), scaling=jnp.asarray(d["scaling"]),
        rotation=jnp.asarray(d["rotation"]),
        opacity=jnp.asarray(d["opacity"]), active=jnp.asarray(d["active"]),
        active_sh_degree=jnp.asarray(d["active_sh_degree"]))
    cam_i = int(d["cam"])
    cams = [ring_camera(a) for a in np.linspace(0, 2 * math.pi, 12,
                                                endpoint=False)]
    cam = cams[cam_i]
    W, H = 512, 256
    rcfg = RasterizerConfig(use_pallas=True, pairs_per_gaussian=32.0)
    bg = jnp.zeros(3, jnp.float32)

    print("params finite?")
    for k in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        chk(k, d[k][d["active"]])
    print("scaling max:", d["scaling"][d["active"]].max(),
          "rot |q| min:", np.linalg.norm(d["rotation"][d["active"]],
                                         axis=1).min())

    pre = jax.jit(lambda g: preprocess_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active))(g)
    print("\npreprocess intermediates:")
    vis = np.asarray(pre.radius) > 0
    for f in pre._fields:
        chk(f + "[vis]", np.asarray(getattr(pre, f))[vis])

    th, tw = rcfg.tile_h, rcfg.tile_w
    m_cap = int(g.capacity * rcfg.pairs_per_gaussian)
    m_cap = -(-m_cap // rcfg.chunk) * rcfg.chunk
    b = jax.jit(lambda pre: binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, image_width=W, image_height=H,
        tile_h=th, tile_w=tw, m_cap=m_cap, align=rcfg.chunk))(pre)
    print("num_pairs", int(b.num_pairs), "overflow", int(b.overflow))
    entries = np.asarray(pack_entries(pre)[b.gidx_sorted])
    real = np.asarray(b.gidx_sorted) < g.capacity
    chk("entries[real]", entries[real])

    for impl in ("pallas", "xla"):
        rc = RasterizerConfig(use_pallas=(impl == "pallas"),
                              pairs_per_gaussian=32.0)
        out = jax.jit(lambda g: render(g, cam, W, H, bg, rc))(g)
        img = np.asarray(out.image)
        n_bad = int((~np.isfinite(img)).sum())
        print(f"{impl} image bad px: {n_bad}"
              + (f" at {np.argwhere(~np.isfinite(img))[:5]}" if n_bad else
                 f" range [{img.min():.4f},{img.max():.4f}]"))
        invd = np.asarray(out.invdepth)
        print(f"{impl} invdepth bad: {int((~np.isfinite(invd)).sum())} "
              f"range [{np.nanmin(invd):.4f},{np.nanmax(invd):.4f}]")

    # --- the exact train-step loss+grad path ---
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.train import trainer
    d2 = np.load("/tmp/nan_repro.npz")
    opt = OptimizationConfig(iterations=300, densify_from_iter=20,
                             densification_interval=50,
                             opacity_reset_interval=3000,
                             position_lr_max_steps=300)
    gt = jnp.asarray(np.load("/tmp/nan_gt.npy")) if \
        __import__("os").path.exists("/tmp/nan_gt.npy") else \
        jnp.zeros((3, H, W), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)

    @jax.jit
    def lg(g, exposure):
        return trainer.camera_loss_grads(
            g, exposure, cam, gt, ones, zeros, zeros, bg,
            jnp.asarray(240, jnp.int32), image_width=W, image_height=H,
            opt=opt, rcfg=rcfg, antialiasing=False, train_test_exp=False,
            use_depth=False)
    exposure = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32)[None], (12, 1, 1))
    loss, l1, dl1, out, grads, exp_grads, tap_grad = lg(g, exposure)
    print(f"\nloss={float(loss)} l1={float(l1)} dl1={float(dl1)}")
    for k, v in grads.items():
        chk("grad." + k, v)
    chk("tap_grad", tap_grad)


if __name__ == "__main__":
    main()
