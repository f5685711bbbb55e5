"""Camera data-parallel training step (new capability; SURVEY.md §2.3).

Each chip renders ONE camera of a per-step batch against the replicated
Gaussian set; parameter gradients are psum'd over the ``data`` axis (XLA
rides ICI and overlaps the collective with the backward), the Adam update
then runs identically (replicated) on every chip. Densification statistics
accumulate across the batch: grad-norm sums and visit counts psum, the
max-radius pmax — matching the reference semantics of "averaged over the
views where the Gaussian was visible" (gaussian_model.py:471-473) at
batch-size = mesh size instead of 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.train import densify as densify_lib
from gsplat_tpu.train import trainer


def make_dp_train_step(mesh: Mesh, *, image_width: int, image_height: int,
                       opt: OptimizationConfig, rcfg: RasterizerConfig,
                       spatial_lr_scale: float, antialiasing: bool = False,
                       use_sparse_adam: bool = False,
                       train_test_exp: bool = False, use_depth: bool = False,
                       axis: str = "data"):
    """Build a jitted DP step: (state, cam_batch, gt/mask/depth batches, bg)
    → (state, aux). Batch leading dim == mesh.shape[axis]; state replicated."""
    n_dev = mesh.shape[axis]

    def per_device(state: trainer.TrainState, cam: CameraView, gt, amask,
                   invd, dmask, bg):
        # shard_map gives each device its slice with leading dim 1
        cam = jax.tree_util.tree_map(lambda x: x[0], cam)
        gt, amask, invd, dmask = gt[0], amask[0], invd[0], dmask[0]
        g = state.gaussians
        step = state.step + 1
        loss, l1, dl1, out, grads, exp_grads, tap_grad = \
            trainer.camera_loss_grads(
                g, state.exposure, cam, gt, amask, invd, dmask, bg, step,
                image_width=image_width, image_height=image_height, opt=opt,
                rcfg=rcfg, antialiasing=antialiasing,
                train_test_exp=train_test_exp, use_depth=use_depth)

        # --- gradient all-reduce over ICI ---
        grads = jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, axis) / n_dev, grads)
        exp_grads = jax.lax.psum(exp_grads, axis) / n_dev
        loss = jax.lax.psum(loss, axis) / n_dev
        l1 = jax.lax.psum(l1, axis) / n_dev
        dl1 = jax.lax.psum(dl1, axis) / n_dev

        # --- densification stats across the view batch ---
        vis = out.radii > 0
        gnorm = jnp.linalg.norm(tap_grad[:, :2], axis=-1)
        accum_inc = jax.lax.psum(jnp.where(vis, gnorm, 0.0), axis)
        denom_inc = jax.lax.psum(vis.astype(jnp.float32), axis)
        radii_max = jax.lax.pmax(out.radii, axis)
        in_densify = step < opt.densify_until_iter
        stats = jax.lax.cond(
            in_densify,
            lambda s: densify_lib.DensifyStats(
                xyz_gradient_accum=s.xyz_gradient_accum + accum_inc,
                denom=s.denom + denom_inc,
                max_radii2d=jnp.maximum(s.max_radii2d, radii_max)),
            lambda s: s, state.stats)

        # --- replicated optimizer update (shared reference-parity helper) ---
        vis_any = (denom_inc > 0) if use_sparse_adam else None
        new_state = trainer.finish_train_step(
            state, grads, exp_grads, stats, step, vis_any, opt=opt,
            spatial_lr_scale=spatial_lr_scale)
        # fully replicated aux: reduce per-device diagnostics
        aux = trainer.StepAux(
            loss=loss, l1=l1, depth_l1=dl1,
            num_pairs=jax.lax.pmax(out.num_pairs, axis),
            overflow=jax.lax.pmax(out.overflow, axis),
            radii=radii_max)
        return new_state, aux

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def stack_camera_batch(cams) -> CameraView:
    """Stack host CameraViews into a leading batch axis pytree."""
    views = [c if isinstance(c, CameraView) else c.view() for c in cams]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *views)
