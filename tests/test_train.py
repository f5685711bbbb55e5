"""Tests for optimizer, schedules-in-step, densification state machine."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.train import densify as densify_lib
from gsplat_tpu.train import optim, trainer
from tests.test_rasterize import make_scene, cfg, TILE_H, TILE_W


def test_adam_matches_reference_formula(rng):
    params = {"w": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)}
    grads = {"w": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)}
    st = optim.init(params)
    lrs = {"w": jnp.asarray(0.01)}
    p1, st1 = optim.apply_updates(params, grads, st, lrs)
    # step 1: mu = 0.1 g, nu = 0.001 g²; update = lr·g/(|g|+eps)
    g = np.asarray(grads["w"])
    expect = np.asarray(params["w"]) - 0.01 * g / (np.abs(g) + 1e-15)
    np.testing.assert_allclose(np.asarray(p1["w"]), expect, rtol=1e-5)


def test_adam_visibility_masking(rng):
    params = {"w": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)}
    grads = {"w": jnp.ones((8, 3), jnp.float32)}
    st = optim.init(params)
    mask = jnp.asarray([True, False] * 4)
    p1, st1 = optim.apply_updates(params, grads, st, {"w": jnp.asarray(0.1)},
                                  visibility_mask=mask)
    w0 = np.asarray(params["w"])
    w1 = np.asarray(p1["w"])
    assert (w1[1] == w0[1]).all() and (w1[3] == w0[3]).all()
    assert (w1[0] != w0[0]).all()
    assert np.asarray(st1.mu["w"])[1].sum() == 0  # moments untouched


def _mini_gaussians(rng, n=8, cap=16):
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return gm.create_from_pcd(pts, colors, 1, capacity=cap)


def test_densify_clone_and_split(rng):
    g = _mini_gaussians(rng)
    adam = optim.init(gm.trainables(g))
    stats = densify_lib.init_stats(g.capacity)
    # gaussian 0: high grad + small scale → clone
    # gaussian 1: high grad + large scale → split
    g = dataclasses.replace(
        g,
        scaling=g.scaling.at[0].set(jnp.log(0.001)).at[1].set(jnp.log(10.0)))
    stats = dataclasses.replace(
        stats,
        xyz_gradient_accum=stats.xyz_gradient_accum.at[0].set(1.0).at[1].set(1.0),
        denom=stats.denom.at[:8].set(1.0))

    g2, adam2, stats2, ovf = densify_lib.densify_and_prune(
        g, adam, stats, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=1.0, percent_dense=0.01,
        use_screen_size_prune=False)
    n0 = int(np.asarray(g.num_active()))
    n2 = int(np.asarray(g2.num_active()))
    # clone adds 1; split adds 2, removes original → net +2
    assert n2 == n0 + 2, (n0, n2)
    assert int(ovf) == 0
    # gaussian 1 deactivated (split original)
    assert not bool(g2.active[1])
    # clone copy exists: some new slot equals gaussian 0's row exactly
    new_rows = np.asarray(g2.xyz[8:])
    assert (np.abs(new_rows - np.asarray(g.xyz[0])).sum(-1) < 1e-6).any()
    # split scale reduced by 1/1.6
    target = np.log(10.0 / 1.6)
    new_scales = np.asarray(g2.scaling[8:])
    assert (np.abs(new_scales - target) < 1e-4).any()
    # stats zeroed
    assert float(jnp.sum(stats2.xyz_gradient_accum)) == 0.0


def test_densify_prune_low_opacity(rng):
    g = _mini_gaussians(rng)
    adam = optim.init(gm.trainables(g))
    stats = densify_lib.init_stats(g.capacity)
    g = dataclasses.replace(g, opacity=g.opacity.at[3].set(-10.0))  # ~0
    g2, _, _, _ = densify_lib.densify_and_prune(
        g, adam, stats, jax.random.PRNGKey(0), max_grad=1e9,
        min_opacity=0.005, extent=1.0, percent_dense=0.01,
        use_screen_size_prune=False)
    assert not bool(g2.active[3])
    assert int(np.asarray(g2.num_active())) == 7


def test_densify_overflow_reported(rng):
    g = _mini_gaussians(rng, n=16, cap=16)  # no free slots
    adam = optim.init(gm.trainables(g))
    stats = densify_lib.init_stats(16)
    stats = dataclasses.replace(
        stats, xyz_gradient_accum=jnp.ones(16), denom=jnp.ones(16))
    g2, _, _, ovf = densify_lib.densify_and_prune(
        g, adam, stats, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=1.0, percent_dense=10.0,
        use_screen_size_prune=False)
    assert int(ovf) == 16  # 16 clones wanted, 0 free
    # all originals still intact
    assert int(np.asarray(g2.num_active())) == 16


def test_reset_opacity(rng):
    g = _mini_gaussians(rng)
    adam = optim.init(gm.trainables(g))
    adam = optim.AdamState(
        mu={**adam.mu, "opacity": jnp.ones_like(adam.mu["opacity"])},
        nu=adam.nu, count=adam.count)
    g2, adam2 = densify_lib.reset_opacity(g, adam)
    act = np.asarray(g2.get_opacity())[np.asarray(g2.active)]
    assert (act <= 0.0101).all()
    assert float(jnp.sum(adam2.mu["opacity"])) == 0.0


def test_train_step_improves_loss(rng):
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig(iterations=100, position_lr_max_steps=100)
    state = trainer.init_state(g, 1)
    target = rng.uniform(0.2, 0.8, (3, H, W)).astype(np.float32)
    gt = jnp.asarray(target)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    bg = jnp.zeros(3)
    losses = []
    for _ in range(8):
        state, aux = trainer.train_step(
            state, cam, gt, ones, zeros, zeros, bg, image_width=W,
            image_height=H, opt=opt, rcfg=rcfg, spatial_lr_scale=1.0,
            antialiasing=False, use_sparse_adam=False, train_test_exp=False,
            use_depth=False)
        losses.append(float(aux.loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # inactive slots unchanged
    assert np.asarray(state.gaussians.xyz[100:]).sum() == 0.0


def test_sh_degree_warmup(rng):
    W, H = TILE_W, TILE_H
    g, cam = make_scene(rng, n=16, sh_degree=2)
    g = dataclasses.replace(g, active_sh_degree=jnp.asarray(0, jnp.int32))
    opt = OptimizationConfig()
    state = trainer.init_state(g, 1)
    state = dataclasses.replace(state, step=jnp.asarray(999, jnp.int32))
    gt = jnp.zeros((3, H, W))
    ones = jnp.ones((1, H, W))
    zeros = jnp.zeros((1, H, W))
    state, _ = trainer.train_step(
        state, cam, gt, ones, zeros, zeros, jnp.zeros(3), image_width=W,
        image_height=H, opt=opt, rcfg=cfg(), spatial_lr_scale=1.0,
        antialiasing=False, use_sparse_adam=False, train_test_exp=False,
        use_depth=False)
    assert int(state.gaussians.active_sh_degree) == 1


def test_ssim_matches_torch_reference(rng):
    """Our SSIM vs an independent torch implementation of the published
    SSIM (11x11 Gaussian window sigma=1.5, C1=0.01^2, C2=0.03^2, same-pad
    depthwise conv) — the math of reference utils/loss_utils.py:46-86."""
    import torch
    import torch.nn.functional as F
    from gsplat_tpu.ops.ssim import ssim

    def torch_ssim(img1, img2, window_size=11, sigma=1.5):
        C = img1.shape[0]
        xs = torch.arange(window_size, dtype=torch.float64)
        g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma ** 2))
        g = (g / g.sum()).float()
        win = (g[:, None] @ g[None, :]).expand(C, 1, window_size, window_size)
        pad = window_size // 2

        def blur(x):
            return F.conv2d(x[None], win, padding=pad, groups=C)[0]

        mu1, mu2 = blur(img1), blur(img2)
        s1 = blur(img1 * img1) - mu1 ** 2
        s2 = blur(img2 * img2) - mu2 ** 2
        s12 = blur(img1 * img2) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        return float(m.mean())

    a = rng.uniform(0, 1, (3, 40, 56)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((3, 40, 56)).astype(np.float32),
                0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-6)


def test_fused_ssim_kernel_matches_xla(rng):
    """The Pallas fused-SSIM kernel (ops/pallas/ssim_kernel.py — the
    train-loss path on TPU, reference fused-ssim analogue) == the XLA
    form, forward and img1 gradients, including a non-uniform upstream
    cotangent (the per-pixel map case) and the variance clamp."""
    from gsplat_tpu.ops import ssim as ssim_lib
    from gsplat_tpu.ops.pallas.ssim_kernel import (
        ssim_fused, ssim_map_fused, _Static)

    a = jnp.asarray(rng.uniform(0, 1, (3, 37, 53)).astype(np.float32))
    b = jnp.asarray(
        np.clip(np.asarray(a) + 0.1 * rng.standard_normal(
            (3, 37, 53)).astype(np.float32), 0, 1))

    ref = float(ssim_lib.ssim(a, b))
    got = float(ssim_fused(a, b, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    gref = jax.grad(lambda x: ssim_lib.ssim(x, b))(a)
    ggot = jax.grad(lambda x: ssim_fused(x, b, interpret=True))(a)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                               rtol=2e-4, atol=1e-6)

    wts = jnp.asarray(rng.uniform(0, 1, (3, 37, 53)).astype(np.float32))
    st = _Static(window_size=11, sigma=1.5, c1=0.01 ** 2, c2=0.03 ** 2,
                 interpret=True)
    g2 = jax.grad(lambda x: jnp.sum(ssim_map_fused(x, b, st) * wts))(a)
    g2r = jax.grad(lambda x: jnp.sum(ssim_lib.ssim_map(x, b) * wts))(a)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2r),
                               rtol=2e-4, atol=1e-6)


def test_checkpoint_roundtrip_npz_and_orbax(tmp_path, rng):
    """Save/restore the full TrainState through both backends."""
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.train import checkpoint as ckpt
    from gsplat_tpu.train import trainer

    pts = rng.standard_normal((40, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, cols, 1, capacity=64)
    state = trainer.init_state(g, 3)
    state = dataclasses.replace(state, step=jnp.asarray(123, jnp.int32))

    p = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(p, state, 123)
    state2, it = ckpt.load_checkpoint(p)
    assert it == 123
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    d = str(tmp_path / "orbax")
    ckpt.save_checkpoint_orbax(d, state, 123)
    template = trainer.init_state(g, 3)
    state3, it3 = ckpt.load_checkpoint_orbax(d, template)
    assert it3 == 123
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_manager_roundtrip(tmp_path, rng):
    """Async manager: periodic save overlaps training; restore_latest
    rebuilds the template from the stored shapes (mid-train resume path,
    loop.py --checkpoint_interval)."""
    from gsplat_tpu.models import gaussian_model as gm
    from gsplat_tpu.train import checkpoint as ckpt
    from gsplat_tpu.train import trainer

    pts = rng.standard_normal((40, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, cols, 2, capacity=64)
    state = trainer.init_state(g, 3)
    state = dataclasses.replace(state, step=jnp.asarray(7, jnp.int32))

    d = str(tmp_path / "mngr")
    mngr = ckpt.AsyncCheckpointManager(d, max_to_keep=2)
    mngr.save(100, state)
    state2 = dataclasses.replace(state, step=jnp.asarray(200, jnp.int32))
    mngr.save(200, state2)
    mngr.close()

    mngr2 = ckpt.AsyncCheckpointManager(d)
    restored, it = mngr2.restore_latest()
    mngr2.close()
    assert it == 200
    for a, b in zip(jax.tree_util.tree_leaves(state2),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_regularization_active(rng):
    """The scheduled depth-L1 term (reference train.py:129-137): with a
    depth map supplied, aux.depth_l1 reports the masked inverse-depth error
    and the loss/update actually depend on it."""
    from tests.test_rasterize import make_scene, cfg, TILE_H, TILE_W
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.ops.rasterize import render
    from gsplat_tpu.train import trainer

    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    bg = jnp.zeros(3)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    # target inverse depth: a perturbed copy of the model's own render
    inv_gt = render(g, cam, W, H, bg, rcfg).invdepth + 0.05
    dmask = jnp.ones((1, H, W), jnp.float32)

    state0 = trainer.init_state(g, 1)
    common = dict(image_width=W, image_height=H, opt=opt, rcfg=rcfg,
                  spatial_lr_scale=1.0, antialiasing=False,
                  use_sparse_adam=False, train_test_exp=False)
    state_d, aux_d = trainer.train_step(
        state0, cam, gt, ones, inv_gt, dmask, bg, use_depth=True, **common)
    state_n, aux_n = trainer.train_step(
        state0, cam, gt, ones, inv_gt, dmask, bg, use_depth=False, **common)

    assert float(aux_d.depth_l1) > 0.01       # the masked error is reported
    assert float(aux_d.loss) > float(aux_n.loss)   # weighted term is in loss
    # and it changes the parameter update (gradients flow through invdepth)
    assert not np.allclose(np.asarray(state_d.gaussians.xyz),
                           np.asarray(state_n.gaussians.xyz))
    # masked-out depth contributes nothing
    _, aux_m = trainer.train_step(
        state0, cam, gt, ones, inv_gt, jnp.zeros_like(dmask), bg,
        use_depth=True, **common)
    assert float(aux_m.depth_l1) == 0.0
