"""Multi-chip tests on the 8-virtual-CPU-device mesh (SURVEY.md §4d):
camera DP equals sequential averaging; tile-sharded render equals
single-device render."""
import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/multi-device tier: full suite only

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops.rasterize import render
from gsplat_tpu.parallel import dp, tile_shard
from gsplat_tpu.parallel.mesh import make_mesh
from gsplat_tpu.train import trainer
from tests.test_rasterize import make_scene, cfg, TILE_H, TILE_W


N_DEV = 8


def test_mesh_helpers():
    mesh = make_mesh((("data", -1),))
    assert mesh.shape["data"] == N_DEV
    mesh2 = make_mesh((("data", 2), ("tile", -1)))
    assert mesh2.shape == {"data": 2, "tile": 4}


def test_tile_sharded_render_matches_single(rng):
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=300)
    rcfg = cfg()
    mesh = make_mesh((("tile", N_DEV),))
    img_s, invd_s, _, ovf = jax.jit(
        lambda g_, c_: tile_shard.render_tile_sharded(
            g_, c_, W, H, jnp.full(3, 0.3), rcfg, mesh))(g, cam)
    assert int(ovf) == 0
    out = render(g, cam, W, H, jnp.full(3, 0.3), rcfg)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(out.image),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(invd_s), np.asarray(out.invdepth),
                               rtol=1e-5, atol=1e-6)


def test_chunk_tables_offset_layout():
    """chunk_tables with a nonzero layout origin (a tile-shard's slice of the
    global aligned buffer): chunks before the slice and past its end must map
    to the sentinel tile; chunks inside must map to their real tiles.
    Regression for the round-1 bug where is_tail compared against the chunk
    COUNT instead of the layout end, silently blanking every shard but the
    first on the Pallas path."""
    from gsplat_tpu.ops.pallas.composite import chunk_tables
    chunk = 16
    # shard owns 3 tiles with counts 5, 0, 40 laid out from entry 64
    tile_start = jnp.asarray([64, 80, 80], jnp.int32)
    tile_count = jnp.asarray([5, 0, 40], jnp.int32)
    n_chunks = 12    # full replicated buffer: 192 entries
    ct, rank0, cnt = chunk_tables(tile_start, tile_count, n_tiles=3,
                                  chunk=chunk, n_chunks=n_chunks)
    ct, rank0, cnt = map(np.asarray, (ct, rank0, cnt))
    # chunks 0-3 precede the slice; chunks 8-11 are past its end
    np.testing.assert_array_equal(ct[:4], [3, 3, 3, 3])
    np.testing.assert_array_equal(cnt[:4], 0)
    np.testing.assert_array_equal(ct[8:], [3, 3, 3, 3])
    np.testing.assert_array_equal(cnt[8:], 0)
    # chunk 4 = tile 0 (5 entries); chunks 5-7 = tile 2 (40 entries)
    np.testing.assert_array_equal(ct[4:8], [0, 2, 2, 2])
    np.testing.assert_array_equal(cnt[4:8], [5, 40, 40, 40])
    np.testing.assert_array_equal(rank0[4:8], [0, 0, 16, 32])


def test_tile_sharded_render_matches_single_pallas(rng):
    """The same equivalence through the PALLAS compositor (interpret mode):
    every shard passes its slice of the GLOBAL tile layout, which is the
    offset-origin case of chunk_tables above."""
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=300)
    rcfg = cfg(use_pallas=True)
    mesh = make_mesh((("tile", N_DEV),))
    img_s, invd_s, _, ovf = jax.jit(
        lambda g_, c_: tile_shard.render_tile_sharded(
            g_, c_, W, H, jnp.full(3, 0.3), rcfg, mesh,
            interpret=True))(g, cam)
    assert int(ovf) == 0
    out = render(g, cam, W, H, jnp.full(3, 0.3), cfg(), interpret=True)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(out.image),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(invd_s), np.asarray(out.invdepth),
                               rtol=1e-5, atol=1e-6)


def test_dp_step_matches_grad_average(rng):
    """One DP step over 8 identical cameras == single-camera step (the
    psum-mean of identical grads is the same grad)."""
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("data", N_DEV),))

    state0 = trainer.init_state(g, N_DEV)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    bg = jnp.zeros(3)

    step_fn = dp.make_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)
    cam_b = dp.stack_camera_batch([cam] * N_DEV)
    gt_b = jnp.tile(gt[None], (N_DEV, 1, 1, 1))
    ones_b = jnp.tile(ones[None], (N_DEV, 1, 1, 1))
    zeros_b = jnp.tile(zeros[None], (N_DEV, 1, 1, 1))
    state_dp, aux_dp = step_fn(state0, cam_b, gt_b, ones_b, zeros_b, zeros_b,
                               bg)

    state_1, aux_1 = trainer.train_step(
        state0, cam, gt, ones, zeros, zeros, bg, image_width=W,
        image_height=H, opt=opt, rcfg=rcfg, spatial_lr_scale=1.0,
        antialiasing=False, use_sparse_adam=False, train_test_exp=False,
        use_depth=False)

    np.testing.assert_allclose(float(aux_dp.loss), float(aux_1.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_dp.gaussians.xyz),
                               np.asarray(state_1.gaussians.xyz),
                               rtol=1e-4, atol=1e-7)
    # densification stats: 8 views visited → denom 8x the single-view denom
    np.testing.assert_allclose(np.asarray(state_dp.stats.denom),
                               8 * np.asarray(state_1.stats.denom))


def test_dp_step_different_cameras_runs(rng):
    """Distinct per-device cameras: step executes and produces finite loss."""
    W, H = TILE_W, TILE_H
    g, cam = make_scene(rng, n=64, cap=64)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("data", N_DEV),))
    cams = []
    for i in range(N_DEV):
        c = dataclasses.replace(
            cam, camera_center=cam.camera_center + 0.01 * i)
        cams.append(c)
    step_fn = dp.make_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)
    state = trainer.init_state(g, N_DEV)
    gt_b = jnp.asarray(rng.uniform(0, 1, (N_DEV, 3, H, W)), jnp.float32)
    ones_b = jnp.ones((N_DEV, 1, H, W), jnp.float32)
    zeros_b = jnp.zeros((N_DEV, 1, H, W), jnp.float32)
    state, aux = step_fn(state, dp.stack_camera_batch(cams), gt_b, ones_b,
                         zeros_b, zeros_b, jnp.zeros(3))
    assert np.isfinite(float(aux.loss))
    assert int(state.step) == 1


def test_prim_sharded_render_matches_single(rng):
    """Depth-slab primitive sharding + ordered segment merge matches the
    single-device render. With the exact-cut transmittance carry (pass-1
    cut-free T fed to pass 2's early-out test) the contribution sets match
    single-chip compositing up to sub-eps tails — tolerance is the cut's
    own magnitude (1e-4-scale weights), not the 2.5e-2 the cut divergence
    cost before. The companion grad test runs with no cut firing and checks
    near-exactness of the merge itself."""
    from gsplat_tpu.parallel import prim_shard
    W, H = TILE_W, 4 * TILE_H
    g, cam = make_scene(rng, n=400)
    rcfg = cfg()
    mesh = make_mesh((("prim", N_DEV),))
    # depth slabs are load-imbalanced: the default per-chip m_cap (total/8)
    # truncates the densest slab here — exactly what the overflow output
    # exists to surface. Give each chip half the total capacity instead.
    img_s, invd_s, ovf = jax.jit(lambda g_, c_: prim_shard.render_prim_sharded(
        g_, c_, W, H, jnp.full(3, 0.25), rcfg, mesh,
        m_cap=int(g.capacity * 24 / 2)))(g, cam)
    assert int(ovf) == 0
    out = render(g, cam, W, H, jnp.full(3, 0.25), rcfg)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(out.image),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(invd_s), np.asarray(out.invdepth),
                               rtol=0, atol=1e-3)


def test_prim_sharded_grads_match_single(rng):
    """Gradients through the sharded merge equal single-device gradients.

    Uses low opacities so the early-termination cut never fires (no pixel
    saturates) — isolating the merge math, which must then be exact."""
    import gsplat_tpu.core.transforms as tf
    from gsplat_tpu.parallel import prim_shard
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=200)
    g = dataclasses.replace(
        g, opacity=jnp.full_like(g.opacity, float(tf.inverse_sigmoid(
            jnp.asarray(0.2)))))
    rcfg = cfg()
    mesh = make_mesh((("prim", N_DEV),))
    bg = jnp.full(3, 0.25)

    def loss_sharded(xyz):
        g2 = dataclasses.replace(g, xyz=xyz)
        img, _, _ = prim_shard.render_prim_sharded(g2, cam, W, H, bg, rcfg,
                                                   mesh)
        return jnp.sum(img ** 2)

    def loss_single(xyz):
        g2 = dataclasses.replace(g, xyz=xyz)
        return jnp.sum(render(g2, cam, W, H, bg, rcfg).image ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(g.xyz)
    g_single = jax.jit(jax.grad(loss_single))(g.xyz)
    # dominant components match to ~1e-6 relative; atol covers f32
    # reassociation noise (slab boundaries re-chunk the cumprod chains),
    # which cancellation amplifies on near-zero components.
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("transient", ["replicated", "ring", "slab"])
def test_sharded_storage_render_matches_single(rng, transient):
    """Gaussian-sharded storage + tile-row-sharded rendering: per-chip
    params are CAP/8 rows, per-chip binning covers only its tile rows, and
    the assembled image equals the single-chip render near-bitwise (tiles
    are independent — exact early-out semantics, unlike depth slabs).
    'ring' streams the packed rows slab-by-slab over ppermute instead of
    all_gathering them (O(N/D) transient, parallel/sharded.py)."""
    from gsplat_tpu.parallel import sharded
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=300, cap=320)   # 320 % 8 == 0
    rcfg = cfg()
    mesh = make_mesh((("prim", N_DEV),))
    bg = jnp.full(3, 0.3)

    g_sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("prim"))
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == 320
            else jax.NamedSharding(mesh, jax.sharding.PartitionSpec())), g)

    render_fn = sharded.make_sharded_render(
        mesh, image_width=W, image_height=H, cfg=rcfg, transient=transient)
    out_s = jax.jit(render_fn, static_argnums=())(g_sharded, cam, bg)
    assert int(out_s.overflow) == 0
    # per-chip shard shapes really are CAP/8
    shard_shapes = {s.data.shape for s in out_s.radii.addressable_shards}
    assert shard_shapes == {(320 // N_DEV,)}

    out_1 = render(g, cam, W, H, bg, rcfg)
    np.testing.assert_allclose(np.asarray(out_s.image),
                               np.asarray(out_1.image), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_s.invdepth),
                               np.asarray(out_1.invdepth),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out_s.radii),
                                  np.asarray(out_1.radii))
    assert int(out_s.num_pairs) > 0


@pytest.mark.parametrize("transient", ["replicated", "ring", "slab"])
def test_sharded_storage_train_step_matches_single(rng, transient):
    """One sharded-storage train step == the single-chip step: same loss,
    same parameter update, same densify stats — with params, moments and
    stats all row-sharded over the prim axis. 'ring' exercises the
    streamed-slab gather AND its ring reduce-scatter backward."""
    from gsplat_tpu.parallel import sharded
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("prim", N_DEV),))

    state0 = trainer.init_state(g, 1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    bg = jnp.zeros(3)

    state_sh = sharded.shard_state(state0, mesh)
    step_fn = sharded.make_sharded_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0, transient=transient)
    state_s, aux_s = step_fn(state_sh, cam, gt, ones, zeros, zeros, bg)

    state_1, aux_1 = trainer.train_step(
        state0, cam, gt, ones, zeros, zeros, bg, image_width=W,
        image_height=H, opt=opt, rcfg=rcfg, spatial_lr_scale=1.0,
        antialiasing=False, use_sparse_adam=False, train_test_exp=False,
        use_depth=False)

    np.testing.assert_allclose(float(aux_s.loss), float(aux_1.loss),
                               rtol=1e-6)
    # Adam's mu/(sqrt(nu)+1e-15) amplifies f32 reassociation noise for
    # near-zero-gradient rows (the reduce-scatter sums per-tile gradient
    # contributions in a different order) — same tolerance rationale as the
    # prim-shard gradient test.
    np.testing.assert_allclose(np.asarray(state_s.gaussians.xyz),
                               np.asarray(state_1.gaussians.xyz),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(state_s.stats.denom),
                               np.asarray(state_1.stats.denom))
    np.testing.assert_allclose(np.asarray(state_s.stats.xyz_gradient_accum),
                               np.asarray(state_1.stats.xyz_gradient_accum),
                               rtol=1e-4, atol=1e-8)
    # optimizer moments live sharded
    shard_shapes = {s.data.shape[0] for s in
                    state_s.adam.mu["xyz"].addressable_shards}
    assert shard_shapes == {128 // N_DEV}


def test_sharded_dp_2d_mesh_step_matches_single(rng):
    """The 2D mesh: camera DP (data axis) composed with gaussian-sharded
    storage (prim axis). With identical cameras on every data shard, one
    step equals the single-chip step (psum-mean of identical grads), while
    params/moments stay at CAP/4 rows per chip and densify stats follow
    camera-DP semantics (denom = batch size x single-view denom)."""
    from gsplat_tpu.parallel import sharded
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("data", 2), ("prim", 4)))

    state0 = trainer.init_state(g, 1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    bg = jnp.zeros(3)

    state_sh = sharded.shard_state(state0, mesh)
    step_fn = sharded.make_sharded_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)
    B = 2
    cam_b = dp.stack_camera_batch([cam] * B)
    gt_b = jnp.tile(gt[None], (B, 1, 1, 1))
    ones_b = jnp.tile(ones[None], (B, 1, 1, 1))
    zeros_b = jnp.tile(zeros[None], (B, 1, 1, 1))
    state_s, aux_s = step_fn(state_sh, cam_b, gt_b, ones_b, zeros_b,
                             zeros_b, bg)

    state_1, aux_1 = trainer.train_step(
        state0, cam, gt, ones, zeros, zeros, bg, image_width=W,
        image_height=H, opt=opt, rcfg=rcfg, spatial_lr_scale=1.0,
        antialiasing=False, use_sparse_adam=False, train_test_exp=False,
        use_depth=False)

    np.testing.assert_allclose(float(aux_s.loss), float(aux_1.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_s.gaussians.xyz),
                               np.asarray(state_1.gaussians.xyz),
                               rtol=1e-3, atol=5e-4)
    # DP stats semantics: 2 views visited -> denom 2x single-view
    np.testing.assert_allclose(np.asarray(state_s.stats.denom),
                               2 * np.asarray(state_1.stats.denom))
    np.testing.assert_allclose(np.asarray(state_s.stats.xyz_gradient_accum),
                               2 * np.asarray(state_1.stats.xyz_gradient_accum),
                               rtol=1e-3, atol=1e-6)
    rows = {s.data.shape[0]
            for s in state_s.adam.mu["xyz"].addressable_shards}
    assert rows == {128 // 4}, f"moments not prim-sharded: {rows}"


def test_sharded_dp_2d_mesh_capacity_growth(rng):
    """Capacity growth mid-training on the 2D mesh: grow_capacity + re-shard
    keeps rows divisible by and sharded over the PRIM axis, and the step
    still runs (regression: the loop's growth path previously checked only
    the 1D prim mesh)."""
    from gsplat_tpu.parallel import sharded
    from gsplat_tpu.train import checkpoint as ckpt_lib
    W, H = TILE_W, 4 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("data", 2), ("prim", 4)))

    state = sharded.shard_state(trainer.init_state(g, 1), mesh)
    # grow to a capacity divisible by n_prim (the loop rounds to this) and
    # re-shard — the step must keep running with CAP/4 rows per chip
    state = ckpt_lib.grow_capacity(state, 192)
    state = sharded.shard_state(state, mesh)
    rows = {s.data.shape[0] for s in state.gaussians.xyz.addressable_shards}
    assert rows == {192 // 4}

    step_fn = sharded.make_sharded_dp_train_step(
        mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
        spatial_lr_scale=1.0)
    gt_b = jnp.asarray(rng.uniform(0, 1, (2, 3, H, W)), jnp.float32)
    ones_b = jnp.ones((2, 1, H, W), jnp.float32)
    zeros_b = jnp.zeros((2, 1, H, W), jnp.float32)
    state, aux = step_fn(state, dp.stack_camera_batch([cam, cam]), gt_b,
                         ones_b, zeros_b, zeros_b, jnp.zeros(3))
    assert np.isfinite(float(aux.loss))
    rows2 = {s.data.shape[0]
             for s in state.adam.mu["xyz"].addressable_shards}
    assert rows2 == {192 // 4}


def test_slab_bounds_balanced_beyond_sample_size():
    """_slab_bounds with n_vis >> n_samples: boundaries must be even
    quantiles of ALL visible depths (the old double-scaled indexing
    sampled only the nearest n_samples, collapsing every inner boundary
    into the near field — review finding)."""
    from gsplat_tpu.parallel.prim_shard import _slab_bounds
    rng = np.random.default_rng(0)
    n = 20_000
    depth = jnp.asarray(rng.uniform(1.0, 9.0, n).astype(np.float32))
    visible = jnp.ones((n,), bool)
    for n_dev in (2, 4, 8):
        b = np.asarray(_slab_bounds(depth, visible, n_dev, n_samples=4096))
        assert b.shape == (n_dev + 1,)
        counts = np.array([np.sum((np.asarray(depth) >= b[i])
                                  & (np.asarray(depth) < b[i + 1]))
                           for i in range(n_dev)])
        frac = counts / n
        assert (np.abs(frac - 1.0 / n_dev) < 0.05).all(), \
            f"n_dev={n_dev}: slab fractions {frac} far from uniform"


def test_ring_fori_loop_form_matches_unrolled(rng, monkeypatch):
    """Past _RING_UNROLL_MAX devices the ring gather/reduce-scatter loops
    switch from unrolled ppermute steps to fori_loop (bounded compile at
    pod-scale D). Force the fori path at D=8 and assert the sharded-storage
    step still matches the single-chip step (both ring and slab modes)."""
    from gsplat_tpu.parallel import sharded
    monkeypatch.setattr(sharded, "_RING_UNROLL_MAX", 1)
    W, H = TILE_W, 8 * TILE_H
    g, cam = make_scene(rng, n=100, cap=128)
    rcfg = cfg()
    opt = OptimizationConfig()
    mesh = make_mesh((("prim", N_DEV),))
    state0 = trainer.init_state(g, 1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    bg = jnp.zeros(3)
    state_1, aux_1 = trainer.train_step(
        state0, cam, gt, ones, zeros, zeros, bg, image_width=W,
        image_height=H, opt=opt, rcfg=rcfg, spatial_lr_scale=1.0,
        antialiasing=False, use_sparse_adam=False, train_test_exp=False,
        use_depth=False)
    for transient in ("ring", "slab"):
        step_fn = sharded.make_sharded_train_step(
            mesh, image_width=W, image_height=H, opt=opt, rcfg=rcfg,
            spatial_lr_scale=1.0, transient=transient)
        state_s, aux_s = step_fn(sharded.shard_state(state0, mesh), cam,
                                 gt, ones, zeros, zeros, bg)
        np.testing.assert_allclose(float(aux_s.loss), float(aux_1.loss),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state_s.gaussians.xyz),
                                   np.asarray(state_1.gaussians.xyz),
                                   rtol=1e-3, atol=5e-4)
