"""Offline rendering CLI — parity with reference render.py."""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def _save_png(path: str, img_chw: np.ndarray):
    from PIL import Image
    arr = (np.clip(img_chw, 0, 1).transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def render_set(model_path, name, iteration, views, gaussians, rcfg, pipe,
               background, train_test_exp, exposures=None, exposure_map=None):
    """Parity: reference render.py:30-46 — writes renders/ and gt/ PNGs."""
    import jax.numpy as jnp
    from gsplat_tpu.ops.rasterize import render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    # The reference's convert_SHs_python / compute_cov3D_python flags select
    # its Python fallback paths as kernel cross-checks
    # (gaussian_renderer/__init__.py:64-80). Here the renderer's built-in
    # SH/covariance math already IS pure JAX — the flags feed the same
    # quantities through the explicit precomp arguments instead, exercising
    # the override plumbing end-to-end.
    cov3d = None
    if pipe.compute_cov3D_python:
        cov3d = gaussians.get_covariance()

    for idx, view in enumerate(views):
        exposure = None
        if train_test_exp and exposures is not None and exposure_map:
            ei = exposure_map.get(view.image_name, -1)
            if ei >= 0:
                exposure = jnp.asarray(exposures[ei])
        override_color = None
        if pipe.convert_SHs_python:
            from gsplat_tpu.core import sh as sh_lib
            cv = view.view()
            dirs = gaussians.xyz - cv.camera_center[None, :]
            nrm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            dirs = dirs / jnp.maximum(nrm, 1e-8)
            deg = int(gaussians.active_sh_degree)
            override_color = jnp.maximum(
                sh_lib.eval_sh(deg, gaussians.get_features().swapaxes(1, 2),
                               dirs) + 0.5, 0.0)
        out = render(gaussians, view.view(), view.width, view.height,
                     background, rcfg, antialiasing=pipe.antialiasing,
                     exposure=exposure, override_color=override_color,
                     cov3d_precomp=cov3d)
        img = np.asarray(out.image)
        gt = np.asarray(view.image)[:3]
        if train_test_exp:
            img = img[..., img.shape[-1] // 2:]
            gt = gt[..., gt.shape[-1] // 2:]
        _save_png(os.path.join(render_path, f"{idx:05d}.png"), img)
        _save_png(os.path.join(gts_path, f"{idx:05d}.png"), gt)


def main(argv=None):
    from gsplat_tpu import config as cfg_lib
    from gsplat_tpu.scene import Scene
    from gsplat_tpu.utils.general import safe_state
    import jax.numpy as jnp

    parser = ArgumentParser(description="Testing script parameters")
    cfg_lib.add_model_args(parser)
    cfg_lib.add_pipeline_args(parser)
    cfg_lib.add_rasterizer_args(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = cfg_lib.get_combined_args(parser, argv)
    print("Rendering " + args.model_path)

    dataset = cfg_lib.extract(cfg_lib.ModelConfig, args)
    pipe = cfg_lib.extract(cfg_lib.PipelineConfig, args)
    rcfg = cfg_lib.extract(cfg_lib.RasterizerConfig, args)
    safe_state(args.quiet)

    scene = Scene(dataset, dataset.sh_degree, load_iteration=args.iteration,
                  shuffle=False)
    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)

    exposures, exp_map = None, None
    exp_path = os.path.join(dataset.model_path, "exposure.json")
    if dataset.train_test_exp and os.path.exists(exp_path):
        import json
        with open(exp_path) as f:
            exp_json = json.load(f)
        exp_map = {k: i for i, k in enumerate(exp_json)}
        exposures = np.asarray([exp_json[k] for k in exp_json], np.float32)

    if not args.skip_train:
        render_set(dataset.model_path, "train", scene.loaded_iter,
                   scene.getTrainCameras(), scene.gaussians, rcfg, pipe, bg,
                   dataset.train_test_exp, exposures, exp_map)
    if not args.skip_test:
        render_set(dataset.model_path, "test", scene.loaded_iter,
                   scene.getTestCameras(), scene.gaussians, rcfg, pipe, bg,
                   dataset.train_test_exp, exposures, exp_map)


if __name__ == "__main__":
    main()
