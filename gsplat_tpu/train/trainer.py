"""The jitted train step + host-side training driver.

Functional parity with the reference training loop
(/root/reference/train.py:43-190): per-iteration random camera, render,
(1−λ)·L1 + λ·(1−SSIM) + scheduled depth-L1, backward, densification
bookkeeping, optimizer step with per-group scheduled LRs, exposure Adam,
SH-degree warm-up, opacity resets, checkpoints. TPU-first differences:

- The whole iteration is ONE jitted function of static shapes; the host loop
  only feeds camera arrays and occasionally triggers the (also jitted)
  densify event and host-side capacity doubling.
- The screen-space gradient tap reproduces the reference's zero-tensor trick
  (gaussian_renderer/__init__.py:25-30) through jax.grad on an explicit
  zeros argument.
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.core.schedules import expon_lr
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import losses
from gsplat_tpu.ops.rasterize import render
from gsplat_tpu.train import densify as densify_lib
from gsplat_tpu.train import optim


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    gaussians: gm.GaussianParams
    adam: optim.AdamState
    exposure: jnp.ndarray          # (n_images, 3, 4)
    exp_adam: optim.AdamState
    stats: densify_lib.DensifyStats
    step: jnp.ndarray              # () int32


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    depth_l1: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray
    radii: jnp.ndarray
    num_padded: jnp.ndarray = None   # padded entry-layout extent (pad_cap
    #   right-sizing; None on paths that don't surface it)


def init_state(gaussians: gm.GaussianParams, n_images: int) -> TrainState:
    exposure = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32)[None],
                        (max(n_images, 1), 1, 1))
    return TrainState(
        gaussians=gaussians,
        adam=optim.init(gm.trainables(gaussians)),
        exposure=exposure,
        exp_adam=optim.init({"exposure": exposure}),
        stats=densify_lib.init_stats(gaussians.capacity),
        step=jnp.zeros((), jnp.int32))


def _lr_dict(opt: OptimizationConfig, step, spatial_lr_scale: float):
    """Per-group LRs (reference gaussian_model.py:183-223). xyz follows the
    expon schedule; the rest are constant."""
    return {
        "xyz": expon_lr(step,
                        opt.position_lr_init * spatial_lr_scale,
                        opt.position_lr_final * spatial_lr_scale,
                        lr_delay_mult=opt.position_lr_delay_mult,
                        max_steps=opt.position_lr_max_steps),
        "f_dc": jnp.asarray(opt.feature_lr, jnp.float32),
        "f_rest": jnp.asarray(opt.feature_lr / 20.0, jnp.float32),
        "opacity": jnp.asarray(opt.opacity_lr, jnp.float32),
        "scaling": jnp.asarray(opt.scaling_lr, jnp.float32),
        "rotation": jnp.asarray(opt.rotation_lr, jnp.float32),
    }


def camera_loss_grads(g: gm.GaussianParams, exposure_all, cam: CameraView,
                      gt_image, alpha_mask, invdepth_gt, depth_mask, bg_color,
                      step, *, image_width: int, image_height: int,
                      opt: OptimizationConfig, rcfg: RasterizerConfig,
                      antialiasing: bool, train_test_exp: bool,
                      use_depth: bool):
    """Loss + gradients for one camera (reference train.py:111-142).

    Shared by the single-chip step and the camera-DP sharded step
    (parallel/dp.py). Returns (loss, l1, depth_l1, render_out, grads,
    exposure_grads, mean2d_tap_grad)."""
    depth_w = expon_lr(step, opt.depth_l1_weight_init,
                       opt.depth_l1_weight_final, max_steps=opt.iterations)

    def loss_fn(trainables, exposure_all, tap):
        params = gm.with_trainables(g, trainables)
        # Cameras without an exposure mapping (exposure_idx −1: test views,
        # scene/__init__.py) get the identity affine — i.e. no exposure —
        # matching the reference, which only ever looks up exposures for
        # mapped train images (gaussian_renderer/__init__.py:113-115).
        exposure = None
        if train_test_exp:
            exposure = jnp.where(
                cam.exposure_idx >= 0,
                exposure_all[jnp.maximum(cam.exposure_idx, 0)],
                jnp.eye(3, 4, dtype=exposure_all.dtype))
        out = render(params, cam, image_width, image_height, bg_color, rcfg,
                     antialiasing=antialiasing, mean2d_tap=tap,
                     exposure=exposure)
        image = out.image * alpha_mask
        l1 = losses.l1_loss(image, gt_image)
        ssim_v = losses.fast_ssim(image, gt_image)
        loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
        dl1 = jnp.abs((out.invdepth - invdepth_gt) * depth_mask).mean()
        loss = loss + jnp.where(depth_w > 0, depth_w * dl1, 0.0) * use_depth
        return loss, (l1, dl1, out)

    tap0 = jnp.zeros((g.capacity, 2), jnp.float32)
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
    (loss, (l1, dl1, out)), (grads, exp_grads, tap_grad) = grad_fn(
        gm.trainables(g), exposure_all, tap0)
    # (the active-mask on grads is applied once, in finish_train_step)
    return loss, l1, dl1, out, grads, exp_grads, tap_grad


def finish_train_step(state: TrainState, grads: dict, exp_grads, stats,
                      stepc, vis, *, opt: OptimizationConfig,
                      spatial_lr_scale: float) -> TrainState:
    """The shared post-render half of one optimization iteration: active-
    mask the gradients, per-group scheduled Adam (optionally visibility-
    masked), exposure Adam, SH-degree warm-up, state assembly. Used by the
    single-chip step and both sharded steps (parallel/sharded.py) so the
    reference-parity update semantics live in exactly one place."""
    g = state.gaussians
    # Dead padding slots receive no gradient (defensive: keeps any numeric
    # garbage in culled rows out of the Adam moments).
    act = g.active
    grads = {k: v * act.reshape((-1,) + (1,) * (v.ndim - 1))
             for k, v in grads.items()}

    lrs = _lr_dict(opt, stepc, spatial_lr_scale)
    new_trainables, adam = optim.apply_updates(
        gm.trainables(g), grads, state.adam, lrs, visibility_mask=vis)
    exp_lr = expon_lr(stepc, opt.exposure_lr_init, opt.exposure_lr_final,
                      lr_delay_steps=opt.exposure_lr_delay_steps,
                      lr_delay_mult=opt.exposure_lr_delay_mult,
                      max_steps=opt.iterations)
    new_exp, exp_adam = optim.apply_updates(
        {"exposure": state.exposure}, {"exposure": exp_grads},
        state.exp_adam, {"exposure": exp_lr})

    # SH degree warm-up every 1000 iters (train.py:94-95)
    g2 = gm.with_trainables(g, new_trainables)
    g2 = dataclasses.replace(
        g2, active_sh_degree=jnp.where(
            (stepc % 1000 == 0) & (g2.active_sh_degree < g.max_sh_degree),
            g2.active_sh_degree + 1, g2.active_sh_degree))

    return TrainState(gaussians=g2, adam=adam, exposure=new_exp["exposure"],
                      exp_adam=exp_adam, stats=stats, step=stepc)


@functools.partial(
    jax.jit,
    static_argnames=("image_width", "image_height", "opt", "rcfg",
                     "spatial_lr_scale", "antialiasing", "use_sparse_adam",
                     "train_test_exp", "use_depth"))
def train_step(state: TrainState,
               cam: CameraView,
               gt_image: jnp.ndarray,          # (3,H,W)
               alpha_mask: jnp.ndarray,        # (1,H,W)
               invdepth_gt: jnp.ndarray,       # (1,H,W) (zeros if unused)
               depth_mask: jnp.ndarray,        # (1,H,W)
               bg_color: jnp.ndarray,          # (3,)
               *,
               image_width: int, image_height: int,
               opt: OptimizationConfig, rcfg: RasterizerConfig,
               spatial_lr_scale: float, antialiasing: bool,
               use_sparse_adam: bool, train_test_exp: bool,
               use_depth: bool):
    """One optimization iteration (reference train.py:89-186)."""
    g = state.gaussians
    step = state.step + 1  # reference iterations are 1-based
    loss, l1, dl1, out, grads, exp_grads, tap_grad = camera_loss_grads(
        g, state.exposure, cam, gt_image, alpha_mask, invdepth_gt, depth_mask,
        bg_color, step, image_width=image_width, image_height=image_height,
        opt=opt, rcfg=rcfg, antialiasing=antialiasing,
        train_test_exp=train_test_exp, use_depth=use_depth)

    # densification bookkeeping (train.py:164-167)
    in_densify = step < opt.densify_until_iter
    stats = jax.lax.cond(
        in_densify,
        lambda s: densify_lib.add_densification_stats(s, out.radii, tap_grad),
        lambda s: s, state.stats)

    # optimizer step (train.py:177-186); exposure Adam with scheduled LR
    vis = (out.radii > 0) if use_sparse_adam else None
    new_state = finish_train_step(state, grads, exp_grads, stats, step, vis,
                                  opt=opt, spatial_lr_scale=spatial_lr_scale)
    aux = StepAux(loss=loss, l1=l1, depth_l1=dl1, num_pairs=out.num_pairs,
                  overflow=out.overflow, radii=out.radii,
                  num_padded=out.num_padded)
    return new_state, aux


@functools.partial(jax.jit, static_argnames=("opt", "use_screen_size_prune"))
def densify_step(state: TrainState, key, extent: float, *,
                 opt: OptimizationConfig, use_screen_size_prune: bool):
    """Jitted densify+prune event (train.py:169-171)."""
    g, adam, stats, overflow = densify_lib.densify_and_prune(
        state.gaussians, state.adam, state.stats, key,
        max_grad=opt.densify_grad_threshold, min_opacity=0.005,
        extent=extent, percent_dense=opt.percent_dense,
        use_screen_size_prune=use_screen_size_prune)
    return dataclasses.replace(state, gaussians=g, adam=adam,
                               stats=stats), overflow


@jax.jit
def opacity_reset_step(state: TrainState):
    """Jitted opacity reset (train.py:173-174)."""
    g, adam = densify_lib.reset_opacity(state.gaussians, state.adam)
    return dataclasses.replace(state, gaussians=g, adam=adam)
