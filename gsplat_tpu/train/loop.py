"""Host-side training driver around the jitted step.

Parity: /root/reference/train.py:43-190 — random camera order without
replacement per epoch, test/save/checkpoint hooks, viewer polling, progress
reporting — plus the TPU-specific host duties: capacity doubling on
overflow (gaussian or pair-list) and per-resolution jit caching.
"""
from __future__ import annotations

import dataclasses
import math
import os
import random
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import (ModelConfig, OptimizationConfig,
                               PipelineConfig, RasterizerConfig)
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import losses
from gsplat_tpu.ops.rasterize import render
from gsplat_tpu.scene import Scene
from gsplat_tpu.train import checkpoint as ckpt_lib
from gsplat_tpu.train import trainer
from gsplat_tpu.utils.general import Timer
from gsplat_tpu.utils.telemetry import Telemetry


def _round_up(x, m):
    return -(-x // m) * m


def train(dataset: ModelConfig, opt: OptimizationConfig, pipe: PipelineConfig,
          rcfg: RasterizerConfig, testing_iterations, saving_iterations,
          checkpoint_iterations, start_checkpoint: Optional[str] = None,
          network_gui_server=None, quiet: bool = False,
          capacity_multiplier: float = 4.0, data_parallel: bool = False,
          checkpoint_interval: int = 0, shard_gaussians: bool = False,
          shard_transient: str = "replicated"):
    """Run the full optimization. Returns (scene, state)."""
    scene = Scene(dataset, dataset.sh_degree, capacity=0)
    n0 = int(np.asarray(scene.gaussians.num_active()))
    cap0 = _round_up(max(int(n0 * capacity_multiplier), 1024), 1024)
    scene.gaussians = gm.pad_to_capacity(scene.gaussians, cap0)

    train_cams = scene.getTrainCameras()
    state = trainer.init_state(scene.gaussians, len(train_cams))
    first_iter = 0
    if start_checkpoint:
        if os.path.isdir(start_checkpoint):
            # an async-manager directory (--checkpoint_interval output)
            mngr = ckpt_lib.AsyncCheckpointManager(start_checkpoint)
            state, first_iter = mngr.restore_latest()
            mngr.close()
        else:
            state, first_iter = ckpt_lib.load_checkpoint(start_checkpoint)
        print(f"Resumed from {start_checkpoint} at iteration {first_iter}")

    bg_color = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                           else [0.0, 0.0, 0.0], jnp.float32)
    use_sparse_adam = opt.optimizer_type == "sparse_adam"
    use_depth = any(c.invdepthmap is not None for c in train_cams)
    spatial_lr_scale = float(scene.cameras_extent)

    # ---- multi-chip camera data-parallelism (new capability) ----
    # With >1 device, each step trains mesh-size cameras at once: per-chip
    # render/backward, gradient psum over ICI, replicated update
    # (parallel/dp.py). Cameras batch within one resolution group (COLMAP
    # scenes can mix camera intrinsics). One step still counts as one
    # iteration — schedules follow optimizer steps.
    n_dev = len(jax.devices())
    dp_steps = {}
    dp_mesh = None
    mesh_2d = None
    data_batch = 0           # cameras per step on the data axis (0 = one)
    if data_parallel and not shard_gaussians and n_dev > 1:
        from gsplat_tpu.parallel import dp as dp_lib
        from gsplat_tpu.parallel.mesh import make_mesh
        dp_mesh = make_mesh((("data", n_dev),))
        data_batch = n_dev
        print(f"camera data-parallel training over {n_dev} devices")

    # ---- gaussian-sharded storage (new capability; parallel/sharded.py) --
    # Params/Adam/stats live row-sharded over a ``prim`` mesh; the step
    # shards binning + compositing by tile rows too. Densify/reset/grow run
    # through the same jitted fns — GSPMD repartitions their row-wise ops.
    # With --data_parallel TOO, the mesh is 2D (data x prim): one camera
    # per data shard against the prim-sharded parameters.
    prim_mesh = None
    shard_mesh = None            # whichever mesh row-shards the params
    n_prim = 1
    if shard_gaussians and n_dev > 1:
        from gsplat_tpu.parallel import sharded as sharded_lib
        from gsplat_tpu.parallel.mesh import make_mesh
        if data_parallel:
            assert n_dev >= 4 and n_dev % 2 == 0, \
                "data x prim mesh needs >= 4 devices"
            data_batch = 2
            n_prim = n_dev // data_batch
            mesh_2d = make_mesh((("data", data_batch), ("prim", n_prim)))
            shard_mesh = mesh_2d
        else:
            n_prim = n_dev
            prim_mesh = make_mesh((("prim", n_dev),))
            shard_mesh = prim_mesh
        cap_div = _round_up(state.gaussians.capacity, n_prim)
        state = ckpt_lib.grow_capacity(state, cap_div)
        state = sharded_lib.shard_state(state, shard_mesh)
        print(f"gaussian-sharded training over {n_prim} devices"
              + (f" x {data_batch} camera-DP" if mesh_2d is not None else "")
              + f" ({state.gaussians.capacity // n_prim} rows/chip)")

    def _sharded_step_for(W, H):
        if (W, H) not in dp_steps:
            from gsplat_tpu.parallel import sharded as sharded_lib
            kw = dict(image_width=W, image_height=H, opt=opt, rcfg=rcfg,
                      spatial_lr_scale=spatial_lr_scale,
                      antialiasing=pipe.antialiasing,
                      use_sparse_adam=use_sparse_adam,
                      train_test_exp=dataset.train_test_exp,
                      use_depth=use_depth, transient=shard_transient)
            if mesh_2d is not None:
                dp_steps[(W, H)] = sharded_lib.make_sharded_dp_train_step(
                    mesh_2d, **kw)
            else:
                dp_steps[(W, H)] = sharded_lib.make_sharded_train_step(
                    prim_mesh, **kw)
        return dp_steps[(W, H)]

    def _dp_step_for(W, H):
        if (W, H) not in dp_steps:
            from gsplat_tpu.parallel import dp as dp_lib
            dp_steps[(W, H)] = dp_lib.make_dp_train_step(
                dp_mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
                spatial_lr_scale=spatial_lr_scale,
                antialiasing=pipe.antialiasing,
                use_sparse_adam=use_sparse_adam,
                train_test_exp=dataset.train_test_exp, use_depth=use_depth)
        return dp_steps[(W, H)]

    def _cam_arrays(cam):
        H, W = cam.height, cam.width
        gt = np.asarray(cam.image)
        amask = np.asarray(cam.alpha_mask)
        if cam.invdepthmap is not None and cam.depth_reliable:
            inv_gt = np.asarray(cam.invdepthmap)
            dmask = np.asarray(cam.depth_mask)
        else:
            inv_gt = np.zeros((1, H, W), np.float32)
            dmask = np.zeros((1, H, W), np.float32)
        return gt, amask, inv_gt, dmask

    viewpoint_stack = []
    ema_loss = 0.0
    ema_depth = 0.0
    pair_ema = None
    ppg_floor = 4.0    # raised after overflow-grows (shrink hysteresis)
    key = jax.random.PRNGKey(0)
    timer = Timer()
    t_start = time.time()
    telemetry = Telemetry(scene.model_path)
    t_iter = time.time()
    # periodic ASYNC checkpointing (--checkpoint_interval): orbax serializes
    # on a background thread while training continues; distinct from the
    # reference-parity synchronous --checkpoint_iterations npz snapshots
    ckpt_mngr = None
    if checkpoint_interval > 0:
        ckpt_mngr = ckpt_lib.AsyncCheckpointManager(
            os.path.join(scene.model_path, "checkpoints"))

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if network_gui_server is not None:
            network_gui_server.poll(state, scene, pipe, rcfg, bg_color,
                                    iteration, opt.iterations,
                                    dataset.train_test_exp)

        if not viewpoint_stack:
            viewpoint_stack = list(scene.getTrainCameras())
        cam = viewpoint_stack.pop(random.randint(0, len(viewpoint_stack) - 1))

        H, W = cam.height, cam.width
        if opt.random_background:
            key, sub = jax.random.split(key)
            bg = jax.random.uniform(sub, (3,))
        else:
            bg = bg_color

        if data_batch > 1:
            # fill the batch with same-resolution cameras; remove by
            # identity — Camera holds numpy arrays, so == is not usable
            batch = [cam]
            rest_idx = [i for i, c in enumerate(viewpoint_stack)
                        if (c.width, c.height) == (W, H)]
            random.shuffle(rest_idx)
            taken = sorted(rest_idx[:data_batch - 1], reverse=True)
            for i in taken:
                batch.append(viewpoint_stack.pop(i))
            while len(batch) < data_batch:
                # stack ran dry mid-batch: start the next epoch (the
                # reference refills its stack when empty, train.py) and
                # keep drawing WITHOUT replacement from it
                viewpoint_stack.extend(scene.getTrainCameras())
                idxs = [i for i, c in enumerate(viewpoint_stack)
                        if (c.width, c.height) == (W, H)]
                random.shuffle(idxs)
                for i in sorted(idxs[:data_batch - len(batch)],
                                reverse=True):
                    batch.append(viewpoint_stack.pop(i))
            arrays = [_cam_arrays(c) for c in batch]
            from gsplat_tpu.parallel import dp as dp_lib
            cam_b = dp_lib.stack_camera_batch(batch)
            gt_b, am_b, iv_b, dm_b = (
                jnp.asarray(np.stack([a[i] for a in arrays]))
                for i in range(4))
            step_for = _dp_step_for if dp_mesh is not None \
                else _sharded_step_for     # 2D data x prim mesh
            dump_payload = (cam_b, (gt_b, am_b, iv_b, dm_b))

            def run_step(s):
                return step_for(W, H)(s, cam_b, gt_b, am_b, iv_b,
                                      dm_b, bg)
        elif prim_mesh is not None:
            gt, amask, inv_gt, dmask = (jnp.asarray(a)
                                        for a in _cam_arrays(cam))
            dump_payload = (cam.view(), (gt, amask, inv_gt, dmask))

            def run_step(s):
                return _sharded_step_for(W, H)(s, cam.view(), gt, amask,
                                               inv_gt, dmask, bg)
        else:
            gt, amask, inv_gt, dmask = (jnp.asarray(a)
                                        for a in _cam_arrays(cam))
            dump_payload = (cam.view(), (gt, amask, inv_gt, dmask))

            def run_step(s):
                return trainer.train_step(
                    s, cam.view(), gt, amask, inv_gt, dmask, bg,
                    image_width=W, image_height=H, opt=opt, rcfg=rcfg,
                    spatial_lr_scale=spatial_lr_scale,
                    antialiasing=pipe.antialiasing,
                    use_sparse_adam=use_sparse_adam,
                    train_test_exp=dataset.train_test_exp,
                    use_depth=use_depth)

        prev_state = state        # for the overflow retry (no donation)
        state, aux = run_step(state)

        # ---- adaptive pair-list capacity: overflow retry ----
        # A truncated frame trained on garbage gradients. Grow capacity and
        # redo the step FROM THE PRE-STEP STATE — params, Adam moments and
        # the frame's densification stats are all rolled back, then the
        # retry applies the one true update. Runs before densification so a
        # densify event never acts on the corrupted stats.
        retry = 0
        while int(aux.overflow) > 0:
            retry += 1
            if retry > 4:   # growth is exponential; 4 doublings = 16x
                raise RuntimeError(
                    f"[iter {iteration}] pair list still overflows after "
                    f"{retry - 1} grow-retries (pairs_per_gaussian="
                    f"{rcfg.pairs_per_gaussian:.1f}) — a retry that still "
                    "truncates must never be committed (garbage gradients)")
            n_act = max(int(np.asarray(state.gaussians.num_active())), 1)
            pairs_pg = int(aux.num_pairs) / n_act
            rcfg = dataclasses.replace(
                rcfg, pairs_per_gaussian=max(rcfg.pairs_per_gaussian * 2,
                                             pairs_pg * 1.5))
            # hysteresis: the merged overflow scalar also covers the
            # chunk-padding budget, whose need doesn't track the pair
            # count — never shrink back into the same overflow
            ppg_floor = max(ppg_floor, rcfg.pairs_per_gaussian * 0.55)
            print(f"[iter {iteration}] pair overflow {int(aux.overflow)} — "
                  f"pairs_per_gaussian → {rcfg.pairs_per_gaussian:.1f}; "
                  f"retrying frame from pre-step state")
            dp_steps.clear()   # step fns bake rcfg into their closures
            state, aux = run_step(prev_state)

        # ---- --debug failure snapshot (reference README:156-159) ----
        loss_now = float(aux.loss)
        if pipe.debug and not math.isfinite(loss_now):
            from gsplat_tpu.utils.debug import dump_snapshot
            path = os.path.join(scene.model_path or ".",
                                f"snapshot_iter{iteration}.npz")
            # dump exactly what the failing step consumed (the full camera
            # BATCH in DP / 2D-mesh mode, not just the first view)
            dump_cam, dump_arrays = dump_payload
            dump_snapshot(path, prev_state, dump_cam, dump_arrays,
                          iteration, reason=f"non-finite loss {loss_now}")
            raise FloatingPointError(
                f"[iter {iteration}] non-finite loss {loss_now}; step inputs "
                f"dumped to {path} (replay with tools/debug_nan.py)")

        # ---- host-side densification orchestration (train.py:163-174) ----
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                key, sub = jax.random.split(key)
                use_ss = iteration > opt.opacity_reset_interval
                state, ovf = trainer.densify_step(
                    state, sub, float(scene.cameras_extent), opt=opt,
                    use_screen_size_prune=use_ss)
                ovf = int(ovf)
                if ovf > 0:
                    new_cap = _round_up(state.gaussians.capacity + max(
                        ovf, state.gaussians.capacity), 1024)
                    if shard_mesh is not None:
                        # keep divisibility by the prim-axis size AND
                        # re-place the grown (padded) arrays row-sharded —
                        # covers both the pure prim mesh and the 2D
                        # data x prim mesh
                        new_cap = _round_up(new_cap, n_prim)
                    print(f"[iter {iteration}] capacity {state.gaussians.capacity}"
                          f" → {new_cap} (overflow {ovf})")
                    state = ckpt_lib.grow_capacity(state, new_cap)
                    if shard_mesh is not None:
                        from gsplat_tpu.parallel import sharded as sharded_lib
                        state = sharded_lib.shard_state(state, shard_mesh)
            if (iteration % opt.opacity_reset_interval == 0
                    or (dataset.white_background
                        and iteration == opt.densify_from_iter)):
                state = trainer.opacity_reset_step(state)

        loss_f = float(aux.loss)
        depth_f = float(aux.depth_l1)
        ema_loss = 0.4 * loss_f + 0.6 * ema_loss
        ema_depth = 0.4 * depth_f + 0.6 * ema_depth

        # scalar telemetry (reference training_report, train.py:206-212)
        now = time.time()
        telemetry.scalars(
            iteration,
            **{"train_loss_patches/l1_loss": float(aux.l1),
               "train_loss_patches/total_loss": loss_f,
               "train_loss_patches/depth_l1": depth_f,
               "iter_time": now - t_iter,
               "total_points": int(np.asarray(state.gaussians.num_active())),
               "num_pairs": int(aux.num_pairs)})
        t_iter = now

        # ---- adaptive pair-list capacity: shrink when over-provisioned ----
        # Every binning pass (sort/cumsum/scatter) costs proportionally to
        # the STATIC m_cap, so track the real pair count and keep capacity
        # ~1.5x above it. Each change is one re-jit — rare after warm-up.
        n_act = max(int(np.asarray(state.gaussians.num_active())), 1)
        pairs_pg = int(aux.num_pairs) / n_act
        pair_ema = pairs_pg if pair_ema is None else \
            0.1 * pairs_pg + 0.9 * pair_ema
        # iteration 1 also fires: the configured default can be ~10x the
        # scene's real pair count, and every binning/sort/gather pass pays
        # for the STATIC capacity — one extra re-jit at iter 2 beats 500
        # oversized iterations (an under-shrink from the single-frame
        # sample is self-correcting via the overflow grow + hysteresis)
        if ((iteration == 1 or iteration % 500 == 0)
              and rcfg.pairs_per_gaussian > ppg_floor
              and rcfg.pairs_per_gaussian > 2.5 * pair_ema):
            new_ppg = max(pair_ema * 1.5, ppg_floor)
            print(f"[iter {iteration}] shrinking pairs_per_gaussian "
                  f"{rcfg.pairs_per_gaussian:.1f} → {new_ppg:.1f}")
            rcfg = dataclasses.replace(rcfg, pairs_per_gaussian=new_ppg)
            dp_steps.clear()   # step fns bake rcfg into their closures

        if not quiet and iteration % 10 == 0:
            n_act = int(np.asarray(state.gaussians.num_active()))
            print(f"[{iteration}/{opt.iterations}] loss={ema_loss:.5f} "
                  f"depth={ema_depth:.5f} n={n_act} "
                  f"({(time.time()-t_start):.0f}s)", flush=True)

        if iteration in testing_iterations:
            report_eval(scene, state, rcfg, pipe, bg_color, iteration,
                        dataset.train_test_exp, telemetry=telemetry)
        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.gaussians = state.gaussians
            scene.save(iteration, exposures=np.asarray(state.exposure)
                       if dataset.train_test_exp else None)
        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            ckpt_lib.save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.npz"),
                state, iteration)
        if ckpt_mngr is not None and iteration % checkpoint_interval == 0:
            ckpt_mngr.save(iteration, state)

    scene.gaussians = state.gaussians
    telemetry.close()
    if ckpt_mngr is not None:
        ckpt_mngr.close()
    return scene, state


def report_eval(scene, state, rcfg, pipe, bg_color, iteration,
                train_test_exp=False, telemetry=None):
    """Parity: reference training_report (train.py:214-252)."""
    configs = [("test", scene.getTestCameras()),
               ("train", [scene.getTrainCameras()[idx % len(scene.getTrainCameras())]
                          for idx in range(5, 30, 5)])]
    for name, cams in configs:
        if not cams:
            continue
        l1_sum, psnr_sum = 0.0, 0.0
        for cam in cams:
            out = render(state.gaussians, cam.view(), cam.width, cam.height,
                         bg_color, rcfg, antialiasing=pipe.antialiasing)
            img = jnp.clip(out.image, 0.0, 1.0)
            gt = jnp.clip(jnp.asarray(cam.image), 0.0, 1.0)
            if train_test_exp:
                img = img[..., img.shape[-1] // 2:]
                gt = gt[..., gt.shape[-1] // 2:]
            l1_sum += float(losses.l1_loss(img, gt))
            psnr_sum += float(losses.psnr(img[None], gt[None]).mean())
        print(f"\n[ITER {iteration}] Evaluating {name}: "
              f"L1 {l1_sum / len(cams):.6f} PSNR {psnr_sum / len(cams):.3f}")
        if telemetry is not None:
            telemetry.scalars(iteration,
                              **{f"{name}/loss_viewpoint - l1_loss":
                                 l1_sum / len(cams),
                                 f"{name}/loss_viewpoint - psnr":
                                 psnr_sum / len(cams)})
