"""Rasterizer correctness: tiled XLA compositor vs naive oracle, Pallas
(interpret mode) vs XLA compositor, forward and gradients.

This is SURVEY.md §4b: kernel tests against a pure-jnp reference renderer,
plus gradient checks on tiny scenes (BASELINE config 1 scale).
"""
import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import composite_ref, naive, preprocess as pre_lib
from gsplat_tpu.ops import rasterize


TILE_H, TILE_W = 8, 128   # small tiles keep the test image tiny


def make_scene(rng, n=300, cap=None, sh_degree=1, seed_spread=1.0):
    """Random gaussians in front of a simple camera."""
    cap = cap or n
    pts = rng.standard_normal((n, 3)).astype(np.float32) * seed_spread
    pts[:, 2] += 5.0  # in front of camera
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    g = gm.create_from_pcd(pts, colors, sh_degree, capacity=cap)
    g = dataclasses.replace(
        g,
        rotation=g.rotation.at[:n].set(
            rng.standard_normal((n, 4)).astype(np.float32)),
        scaling=g.scaling.at[:n].add(
            rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
        opacity=g.opacity.at[:n].set(
            rng.uniform(-1.0, 3.0, n).astype(np.float32)),
        f_rest=g.f_rest.at[:n].set(
            0.1 * rng.standard_normal(g.f_rest.shape[1:]).astype(np.float32)),
        active_sh_degree=jnp.asarray(sh_degree, jnp.int32),
    )
    cam = CameraView.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7)
    return g, cam


def cfg(**kw):
    base = dict(tile_h=TILE_H, tile_w=TILE_W, chunk=16, use_pallas=False,
                pairs_per_gaussian=24.0)
    base.update(kw)
    return RasterizerConfig(**base)


@pytest.mark.parametrize("antialiasing", [False, True])
def test_tiled_xla_matches_naive(rng, antialiasing):
    W, H = 2 * TILE_W, 3 * TILE_H
    g, cam = make_scene(rng, n=300)
    c = cfg()
    pre = pre_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active, antialiasing=antialiasing)
    accum_naive, t_naive = naive.composite_naive(
        pre, image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W)

    out = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3), cfg=c,
                           antialiasing=antialiasing, clamp=False)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(accum_naive[:3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.invdepth[0]),
                               np.asarray(accum_naive[3]),
                               rtol=1e-4, atol=1e-5)


def test_background_blending(rng):
    W, H = TILE_W, TILE_H
    g, cam = make_scene(rng, n=5)
    # move all gaussians behind the camera: image must equal bg exactly
    g2 = dataclasses.replace(g, xyz=g.xyz - jnp.array([0.0, 0.0, 100.0]))
    bg = jnp.array([0.2, 0.4, 0.6])
    out = rasterize.render(g2, cam, W, H, bg_color=bg, cfg=cfg())
    img = np.asarray(out.image)
    for ch in range(3):
        np.testing.assert_allclose(img[ch], float(bg[ch]), atol=1e-6)
    assert int(np.asarray((out.radii > 0).sum())) == 0


def test_padding_slots_do_not_render(rng):
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=64, cap=128)
    out1 = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3), cfg=cfg())
    # activate padding with junk: must not change the image while inactive
    g_junk = dataclasses.replace(
        g, xyz=g.xyz.at[64:].set(jnp.asarray(
            np.random.default_rng(1).standard_normal((64, 3)) + [0, 0, 5],
            jnp.float32)),
        opacity=g.opacity.at[64:].set(3.0))
    out2 = rasterize.render(g_junk, cam, W, H, bg_color=jnp.zeros(3), cfg=cfg())
    np.testing.assert_allclose(np.asarray(out1.image), np.asarray(out2.image))


@pytest.mark.parametrize("interpret", [True])
def test_pallas_forward_matches_xla(rng, interpret):
    W, H = 2 * TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=400)
    out_ref = rasterize.render(g, cam, W, H, bg_color=jnp.full(3, 0.3),
                               cfg=cfg(use_pallas=False), clamp=False)
    out_pl = rasterize.render(g, cam, W, H, bg_color=jnp.full(3, 0.3),
                              cfg=cfg(use_pallas=True), clamp=False,
                              interpret=interpret)
    np.testing.assert_allclose(np.asarray(out_pl.image),
                               np.asarray(out_ref.image),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pl.invdepth),
                               np.asarray(out_ref.invdepth),
                               rtol=2e-4, atol=2e-5)


def _loss_fn(use_pallas, g, cam, W, H, interpret=False):
    target = jnp.linspace(0, 1, 3 * H * W).reshape(3, H, W)

    def loss(params_and_tap):
        trains, tap = params_and_tap
        params = gm.with_trainables(g, trains)
        out = rasterize.render(
            params, cam, W, H, bg_color=jnp.full(3, 0.25),
            cfg=cfg(use_pallas=use_pallas), mean2d_tap=tap,
            clamp=False, interpret=interpret)
        return (jnp.abs(out.image - target).mean()
                + 0.1 * jnp.abs(out.invdepth).mean())
    return loss


@pytest.mark.slow
def test_pallas_backward_matches_xla_autodiff(rng):
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=200)
    tap = jnp.zeros((g.capacity, 2), jnp.float32)

    grads_ref = jax.grad(_loss_fn(False, g, cam, W, H))((gm.trainables(g), tap))
    grads_pl = jax.grad(_loss_fn(True, g, cam, W, H, interpret=True))(
        (gm.trainables(g), tap))

    for name in ["xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"]:
        a = np.asarray(grads_pl[0][name])
        b = np.asarray(grads_ref[0][name])
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=1e-6,
            err_msg=f"grad mismatch for {name}")
    np.testing.assert_allclose(np.asarray(grads_pl[1]),
                               np.asarray(grads_ref[1]),
                               rtol=5e-3, atol=1e-6,
                               err_msg="mean2d tap grad mismatch")
    # tap gradient must be non-trivial (it drives densification)
    assert np.abs(np.asarray(grads_ref[1])).max() > 0


def test_stream_compositor_forward_matches_xla(rng):
    """Strip-grid streaming compositor (ops/pallas/composite_stream.py) ==
    the XLA oracle through the full render() path, including the m_cap
    strip-rounding the stream route performs."""
    W, H = 2 * TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=400)
    out_ref = rasterize.render(g, cam, W, H, bg_color=jnp.full(3, 0.3),
                               cfg=cfg(use_pallas=False), clamp=False)
    out_st = rasterize.render(
        g, cam, W, H, bg_color=jnp.full(3, 0.3),
        cfg=cfg(use_pallas=True, compositor="stream", strip_chunks=4),
        clamp=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out_st.image),
                               np.asarray(out_ref.image),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_st.invdepth),
                               np.asarray(out_ref.invdepth),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("moments", ["vpu", "mxu"])
def test_stream_compositor_backward_matches_xla(rng, moments):
    """moments="mxu" validates the moment-basis contraction + tile-local→
    mean shift algebra (exact in f32 under interpret; on-chip it runs
    bf16x3 — see composite_stream.py _bwd_strip_kernel notes)."""
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=200)
    tap = jnp.zeros((g.capacity, 2), jnp.float32)

    def loss_fn(use_pallas):
        target = jnp.linspace(0, 1, 3 * H * W).reshape(3, H, W)

        def loss(params_and_tap):
            trains, tap = params_and_tap
            params = gm.with_trainables(g, trains)
            out = rasterize.render(
                params, cam, W, H, bg_color=jnp.full(3, 0.25),
                cfg=cfg(use_pallas=use_pallas, compositor="stream",
                        strip_chunks=4, moments=moments),
                mean2d_tap=tap, clamp=False, interpret=True)
            return (jnp.abs(out.image - target).mean()
                    + 0.1 * jnp.abs(out.invdepth).mean())
        return loss

    grads_ref = jax.grad(loss_fn(False))((gm.trainables(g), tap))
    grads_st = jax.grad(loss_fn(True))((gm.trainables(g), tap))
    for name in ["xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"]:
        np.testing.assert_allclose(
            np.asarray(grads_st[0][name]), np.asarray(grads_ref[0][name]),
            rtol=5e-3, atol=1e-6, err_msg=f"grad mismatch for {name}")
    np.testing.assert_allclose(np.asarray(grads_st[1]),
                               np.asarray(grads_ref[1]),
                               rtol=5e-3, atol=1e-6)


def test_xla_gradients_finite_difference(rng):
    """Spot finite-difference check of the full differentiable pipeline."""
    W, H = TILE_W, TILE_H
    g, cam = make_scene(rng, n=20)
    target = jnp.zeros((3, H, W))

    def loss_of_xyz(xyz):
        params = dataclasses.replace(g, xyz=xyz)
        out = rasterize.render(params, cam, W, H, bg_color=jnp.zeros(3),
                               cfg=cfg(), clamp=False)
        return jnp.abs(out.image - target).mean()

    grad = jax.grad(loss_of_xyz)(g.xyz)
    eps = 1e-3
    rng2 = np.random.default_rng(3)
    for _ in range(4):
        i = rng2.integers(0, 20)
        j = rng2.integers(0, 3)
        e = jnp.zeros_like(g.xyz).at[i, j].set(eps)
        fd = (float(loss_of_xyz(g.xyz + e)) - float(loss_of_xyz(g.xyz - e))) / (2 * eps)
        an = float(grad[i, j])
        assert abs(fd - an) <= 1e-3 * max(1.0, abs(fd)) + 1e-5, (i, j, fd, an)


def test_binning_expand_multi_matches_expand(rng):
    """The fused limb-scan expansion (one MXU blocked scan for K int32
    cumsums) must be bit-exact against the scalar _expand — including
    int32 wraparound in the telescoping diffs (large uoffsets values)."""
    n, m = 700, 16384
    counts = rng.integers(0, 40, n).astype(np.int32)
    offsets = (np.cumsum(counts) - counts).astype(np.int32)
    vals = [
        jnp.asarray(rng.integers(0, n, n).astype(np.int32)),
        jnp.asarray(offsets),
        # near-int32-max values exercise the mod-2^32 telescoping
        jnp.asarray(rng.integers(-2**31, 2**31 - 1, n).astype(np.int32)),
    ]
    off = jnp.asarray(offsets)
    want = [binning_lib._expand(v, off, m) for v in vals]
    got = binning_lib._expand_multi(vals, off, m, force=True,
                                    interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_binning_overflow_reporting(rng):
    W, H = TILE_W, TILE_H
    g, cam = make_scene(rng, n=200)
    out = rasterize.render(g, cam, W, H, bg_color=jnp.zeros(3),
                           cfg=cfg(), m_cap=16)
    assert int(out.overflow) > 0


@pytest.mark.slow
def test_python_path_overrides_match_builtin(rng):
    """override_color = eval_sh(...) and cov3d_precomp = get_covariance()
    must reproduce the built-in paths exactly (the reference's
    convert_SHs_python / compute_cov3D_python cross-check, reference
    gaussian_renderer/__init__.py:64-80)."""
    from gsplat_tpu.core import sh as sh_lib
    from gsplat_tpu.ops.rasterize import render
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=150)
    rcfg = cfg()
    bg = jnp.full(3, 0.1)
    base = render(g, cam, W, H, bg, rcfg)

    cv = cam
    dirs = g.xyz - cv.camera_center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    deg = int(g.active_sh_degree)
    colors = jnp.maximum(
        sh_lib.eval_sh(deg, g.get_features().swapaxes(1, 2), dirs) + 0.5, 0.0)
    alt = render(g, cam, W, H, bg, rcfg, override_color=colors,
                 cov3d_precomp=g.get_covariance())
    np.testing.assert_allclose(np.asarray(alt.image), np.asarray(base.image),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pallas_t_init_cut_matches_oracle(rng):
    """The incoming-transmittance carry (prim_shard exact cut): both
    compositors must apply a nontrivial t_init to the early-out test
    identically — forward and backward."""
    W, H = TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=200)
    c = cfg()
    pre = pre_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active)
    m_cap = -(-int(200 * 24) // c.chunk) * c.chunk
    b = binning_lib.bin_gaussians(
        jax.lax.stop_gradient(pre.mean2d), jax.lax.stop_gradient(pre.depth),
        jax.lax.stop_gradient(pre.radius), image_width=W, image_height=H,
        tile_h=TILE_H, tile_w=TILE_W, m_cap=m_cap, align=c.chunk)
    entries0 = rasterize.pack_entries(pre)[b.gidx_sorted]
    T = 2
    P = TILE_H * TILE_W
    # near-saturating incoming transmittance forces the cut to fire early
    t_init = jnp.asarray(
        rng.uniform(1e-5, 0.3, (T, P)).astype(np.float32))

    from gsplat_tpu.ops.pallas.composite import composite_tiles_pallas
    from gsplat_tpu.ops.composite_ref import composite_tiles_xla

    def run(fn, e):
        out = fn(e, b.tile_start, b.tile_count, n_tiles_x=1, n_tiles_y=2,
                 tile_h=TILE_H, tile_w=TILE_W, chunk=c.chunk, t_init=t_init)
        return out

    out_p = run(functools.partial(composite_tiles_pallas, interpret=True),
                entries0)
    out_x = run(composite_tiles_xla, entries0)
    np.testing.assert_allclose(np.asarray(out_p.accum),
                               np.asarray(out_x.accum), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_p.n_contrib),
                                  np.asarray(out_x.n_contrib))
    # the cut actually fired somewhere (t_init small enough)
    full = run(composite_tiles_xla,
               entries0).n_contrib
    assert (np.asarray(out_x.n_contrib) <= np.asarray(full)).all()

    g_p = jax.grad(lambda e: jnp.sum(run(
        functools.partial(composite_tiles_pallas, interpret=True),
        e).accum))(entries0)
    g_x = jax.grad(lambda e: jnp.sum(run(composite_tiles_xla, e).accum))(
        entries0)
    # recompute-based backward vs autodiff: f32 reassociation on the large
    # unclamped conic gradients of a sum-loss (forward + n_contrib match
    # exactly above, so the cut semantics themselves are identical)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-2, atol=1e-4)


def test_blocked_cumsum_kernel_matches_xla(rng):
    """ops/pallas/scan.py: the folded-lane MXU scan reproduces the blocked
    XLA cumsum (the gather-VJP reduction's two-level prefix structure)
    exactly — including the per-L-block reset and the block totals."""
    from gsplat_tpu.ops.pallas.scan import blocked_cumsum_16
    M, L = 512, 64
    x = rng.standard_normal((M, 16)).astype(np.float32)
    intra, tot = blocked_cumsum_16(jnp.asarray(x), L=L, interpret=True)
    ref = np.cumsum(x.reshape(M // L, L, 16), axis=1).reshape(M, 16)
    ref_tot = ref[L - 1::L]
    np.testing.assert_allclose(np.asarray(intra), ref, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tot), ref_tot, rtol=1e-6,
                               atol=1e-5)


def test_slab_transmittance_matches_cutfree_composite(rng):
    """ops/pallas/composite.slab_transmittance_pallas: the log-sum kernel
    must equal the full compositor's t_final with the cut disabled
    (t_eps=0) — the quantity the depth-slab exact-cut pre-pass consumes."""
    from gsplat_tpu.ops.pallas.composite import (composite_tiles_pallas,
                                                 slab_transmittance_pallas)
    W, H = 2 * TILE_W, 2 * TILE_H
    g, cam = make_scene(rng, n=300)
    c = cfg(chunk=16)
    pre = pre_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active)
    ntx, nty = W // TILE_W, H // TILE_H
    b = binning_lib.bin_gaussians(
        pre.mean2d, pre.depth, pre.radius, rx=pre.rx, ry=pre.ry,
        image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W,
        m_cap=int(g.capacity * c.pairs_per_gaussian), align=c.chunk,
        sort_gaussians=True)
    perm_ext = jnp.concatenate([b.perm, jnp.full((1,), g.capacity,
                                                 jnp.int32)])
    entries = rasterize._gather_entries(
        rasterize.pack_entries(pre)[perm_ext], b.gidx_sorted, b.inv_src,
        b.g_offsets, b.g_counts, b.gidx_sorted.shape[0])
    kw = dict(n_tiles_x=ntx, n_tiles_y=nty, tile_h=TILE_H, tile_w=TILE_W,
              chunk=c.chunk, alpha_min=c.alpha_min, alpha_max=c.alpha_max)
    ref = composite_tiles_pallas(entries, b.tile_start, b.tile_count,
                                 t_eps=0.0, interpret=True, **kw)
    t_fast = slab_transmittance_pallas(entries, b.tile_start, b.tile_count,
                                       interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(t_fast), np.asarray(ref.t_final),
                               rtol=1e-5, atol=1e-6)


def test_row_cull_exact_and_tighter(rng):
    """Per-tile-row ellipse culling (ops/binning.py conic/t_cut path).

    The rigorous property: every (tile, gaussian) pair the culled binning
    drops has max-over-tile-pixels alpha < alpha_min — exactly what the
    compositor zeroes — and no pair is ever ADDED. Checked explicitly
    against the conic quadratic below. The image comparison then only sees
    summation-regrouping float noise (culling shifts chunk boundaries, so
    ~100-term f32 accumulations reassociate — measured ~1e-4 max here)."""
    n = 300
    g, cam = make_scene(rng, n=n)
    # elongate + rotate: worst case for rect binning
    g = dataclasses.replace(
        g, scaling=g.scaling.at[:, 1].add(-1.5).at[:, 0].add(0.7))
    W, H = 2 * TILE_W, 4 * TILE_H
    pre = pre_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active)
    kw = dict(image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W,
              m_cap=48 * n, align=1, sort_gaussians=True)
    b0 = binning_lib.bin_gaussians(pre.mean2d, pre.depth, pre.radius,
                                   rx=pre.rx, ry=pre.ry, **kw)
    ntx = W // TILE_W
    T = ntx * (H // TILE_H)
    ts0, tc0 = np.asarray(b0.tile_start), np.asarray(b0.tile_count)
    perm_ext0 = np.append(np.asarray(b0.perm), n)      # sentinel gidx = n
    gs0 = perm_ext0[np.asarray(b0.gidx_sorted)]
    conic = np.asarray(pre.conic)
    mean2d = np.asarray(pre.mean2d)
    t_cut = np.asarray(pre.t_cut)

    def check_subset_and_exact(b1):
        ts1, tc1 = np.asarray(b1.tile_start), np.asarray(b1.tile_count)
        perm_ext1 = np.append(np.asarray(b1.perm), n)
        gs1 = perm_ext1[np.asarray(b1.gidx_sorted)]
        for t in range(T):
            s0 = set(gs0[ts0[t]:ts0[t] + tc0[t]])
            s1 = set(gs1[ts1[t]:ts1[t] + tc1[t]])
            assert s1 <= s0, f"tile {t}: culling ADDED pairs {s1 - s0}"
            ox, oy = (t % ntx) * TILE_W, (t // ntx) * TILE_H
            xs, ys = np.meshgrid(np.arange(ox, ox + TILE_W),
                                 np.arange(oy, oy + TILE_H))
            for gg in s0 - s1:
                dx = xs - mean2d[gg, 0]
                dy = ys - mean2d[gg, 1]
                ca, cb, cc = conic[gg]
                q = ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy
                assert q.min() > t_cut[gg], \
                    f"tile {t} wrongly dropped visible gaussian {gg}"

    b1 = binning_lib.bin_gaussians(pre.mean2d, pre.depth, pre.radius,
                                   rx=pre.rx, ry=pre.ry, conic=pre.conic,
                                   t_cut=pre.t_cut, **kw)
    assert int(b1.num_pairs) < int(b0.num_pairs)
    check_subset_and_exact(b1)
    # row_slots=2 forces the TAIL-BLOCK path (one single row + a jointly-
    # culled multi-row tail) for every splat taller than one tile row
    b2 = binning_lib.bin_gaussians(pre.mean2d, pre.depth, pre.radius,
                                   rx=pre.rx, ry=pre.ry, conic=pre.conic,
                                   t_cut=pre.t_cut, row_slots=2, **kw)
    assert int(b1.num_pairs) <= int(b2.num_pairs) <= int(b0.num_pairs)
    check_subset_and_exact(b2)

    c0 = cfg(row_cull=False, pairs_per_gaussian=48.0)
    c1 = cfg(row_cull=True, pairs_per_gaussian=48.0)
    out0 = rasterize.render(g, cam, W, H, jnp.zeros(3), c0, clamp=False)
    out1 = rasterize.render(g, cam, W, H, jnp.zeros(3), c1, clamp=False)
    assert int(out0.overflow) == 0 and int(out1.overflow) == 0
    np.testing.assert_allclose(np.asarray(out1.image),
                               np.asarray(out0.image), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1.invdepth),
                               np.asarray(out0.invdepth), atol=2e-4)
    # gradients flow through the culled entry list unchanged. atol covers
    # sub-threshold entries present-but-zeroed in one path vs absent in
    # the other: their exact-0 grad vs the other path's reassociation
    # residue (~1e-6) trips any pure-rtol check.
    tr = gm.trainables(g)

    def loss(trains, use_cull):
        params = gm.with_trainables(g, trains)
        out = rasterize.render(params, cam, W, H, jnp.zeros(3),
                               c1 if use_cull else c0, clamp=False)
        return jnp.abs(out.image - 0.5).mean()
    g0 = jax.grad(functools.partial(loss, use_cull=False))(tr)
    g1 = jax.grad(functools.partial(loss, use_cull=True))(tr)
    for k in ("xyz", "opacity", "scaling"):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("seed,row_slots", [(1, 2), (2, 3), (3, 4), (4, 6)])
def test_row_cull_fuzz_subset_property(seed, row_slots):
    """Randomized culling invariants on synthetic conics (no preprocess):
    off-screen centers, extreme anisotropy, sub-threshold opacities,
    non-tile-multiple images. For EVERY tile the culled entry set must be
    a subset of the rect set, every dropped pair must satisfy
    q(pixel) > t_cut on all the tile's pixels, and the per-tile ranges
    must agree with the sorted entry stream itself."""
    rng = np.random.default_rng(seed)
    n = 160
    W, H = 3 * TILE_W - 40, 5 * TILE_H - 3     # ragged right/bottom tiles
    ntx, nty = -(-W // TILE_W), -(-H // TILE_H)
    T = ntx * nty
    # random PSD pixel-space covariances with wild anisotropy
    A = rng.standard_normal((n, 2, 2)) * rng.uniform(0.5, 30, (n, 1, 1))
    cov = A @ np.transpose(A, (0, 2, 1)) + 0.3 * np.eye(2)
    conic = np.linalg.inv(cov).astype(np.float32)
    conic = np.stack([conic[:, 0, 0], conic[:, 0, 1], conic[:, 1, 1]], -1)
    op = rng.uniform(1e-3, 1.0, n).astype(np.float32)   # some < 1/255
    t_cut = np.maximum(2.0 * np.log(op * 255.0), 0.0).astype(np.float32)
    mean2d = np.stack([rng.uniform(-30, W + 30, n),
                       rng.uniform(-30, H + 30, n)], -1).astype(np.float32)
    # exact level-set AABB half-extents (preprocess's tight rx/ry)
    rx = np.ceil(np.sqrt(t_cut * cov[:, 0, 0])).astype(np.float32)
    ry = np.ceil(np.sqrt(t_cut * cov[:, 1, 1])).astype(np.float32)
    radius = np.maximum(rx, ry).astype(np.float32)
    depth = rng.uniform(0.5, 10.0, n).astype(np.float32)

    kw = dict(image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W,
              m_cap=64 * n, align=1, sort_gaussians=True)
    b0 = binning_lib.bin_gaussians(jnp.asarray(mean2d), jnp.asarray(depth),
                                   jnp.asarray(radius), rx=jnp.asarray(rx),
                                   ry=jnp.asarray(ry), **kw)
    b1 = binning_lib.bin_gaussians(jnp.asarray(mean2d), jnp.asarray(depth),
                                   jnp.asarray(radius), rx=jnp.asarray(rx),
                                   ry=jnp.asarray(ry),
                                   conic=jnp.asarray(conic),
                                   t_cut=jnp.asarray(t_cut),
                                   row_slots=row_slots, **kw)
    assert int(b0.overflow) == 0 and int(b1.overflow) == 0
    assert int(b1.num_pairs) <= int(b0.num_pairs)

    def tile_sets(b):
        ts, tc = np.asarray(b.tile_start), np.asarray(b.tile_count)
        perm_ext = np.append(np.asarray(b.perm), n)
        gs = perm_ext[np.asarray(b.gidx_sorted)]
        tiles = np.asarray(b.tile_sorted)
        out = []
        for t in range(T):
            seg = gs[ts[t]:ts[t] + tc[t]]
            # the histogram-derived range must contain exactly this tile's
            # entries in the sorted stream
            assert (tiles[ts[t]:ts[t] + tc[t]] == t).all()
            out.append(set(seg.tolist()))
        return out
    sets0, sets1 = tile_sets(b0), tile_sets(b1)
    n_drop = 0
    for t in range(T):
        assert sets1[t] <= sets0[t], f"tile {t} gained {sets1[t] - sets0[t]}"
        ox, oy = (t % ntx) * TILE_W, (t // ntx) * TILE_H
        xs, ys = np.meshgrid(np.arange(ox, min(ox + TILE_W, W)),
                             np.arange(oy, min(oy + TILE_H, H)))
        for gg in sets0[t] - sets1[t]:
            dx = xs - mean2d[gg, 0]
            dy = ys - mean2d[gg, 1]
            ca, cb, cc = conic[gg]
            q = ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy
            assert q.min() > t_cut[gg], \
                f"tile {t} wrongly dropped visible gaussian {gg}"
            n_drop += 1
    # the fuzz must actually exercise drops to mean anything
    assert n_drop > 0


def test_pad_cap_overflow_detected(rng):
    """Review-confirmed repro: when m_cap has slack but the alignment
    padding outgrows pad_cap, the clamped per-tile shifts silently
    misplace entries — binning must report overflow > 0 (the host's
    grow-retry contract), not a valid-looking frame."""
    n = 200
    g, cam = make_scene(rng, n=n)
    W, H = 2 * TILE_W, 8 * TILE_H
    pre = pre_lib.preprocess(
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
        g.get_features(), g.active_sh_degree, cam, W, H,
        active_mask=g.active)
    kw = dict(image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W,
              align=64, sort_gaussians=True)
    args = (pre.mean2d, pre.depth, pre.radius)
    # generous pad_cap: valid layout, overflow 0
    b_ok = binning_lib.bin_gaussians(*args, rx=pre.rx, ry=pre.ry,
                                     m_cap=64 * n, pad_cap=64 * 16 * 2,
                                     **kw)
    assert int(b_ok.overflow) == 0
    pad_need = int(b_ok.num_padded) - int(b_ok.num_pairs)
    assert pad_need > 128   # the scene must actually exercise padding
    # huge m_cap (slack!), pad_cap far below the needed padding: the old
    # num_padded > m_cap + pad_cap check never fired here
    b_bad = binning_lib.bin_gaussians(*args, rx=pre.rx, ry=pre.ry,
                                      m_cap=64 * n, pad_cap=64,
                                      **kw)
    assert int(b_bad.overflow) > 0, (
        f"padding needs {pad_need} > pad_cap=64 yet overflow=0 — "
        "clamped shifts are corrupting the aligned layout silently")


def test_gather_vjp_routes_garbage_to_sentinel():
    """The scatter-add gather-VJP's garbage contract: dead aligned slots
    (pads, past-num_padded tail — on hardware the chunk-grid backward
    kernel's dead-chunk DMA skip leaves them as recycled HBM bits, NaN in
    the worst case) all carry the SENTINEL gaussian id, so their rows —
    finite or not — must land ONLY in the sentinel row of d_packed (which
    render()'s pack_entries concat-VJP discards). Real rows must come out
    as exact per-gaussian segment sums, unpolluted."""
    from gsplat_tpu.ops import rasterize as rz
    rng = np.random.default_rng(3)
    width, n = 16, 5
    counts = np.array([3, 0, 7, 2, 1], np.int32)
    total = int(counts.sum())                               # 13
    m_out = 96
    # aligned layout: real entries first (gaussian ids repeated per count,
    # any order), every dead slot carrying the sentinel id n
    gidx = np.concatenate([np.repeat(np.arange(n), counts),
                           np.full(m_out - total, n)]).astype(np.int32)
    d_aligned = np.full((m_out, width), np.nan, np.float32)
    d_aligned[:total] = rng.standard_normal((total, width)).astype(np.float32)

    d_packed, *_ = rz._gather_entries_bwd(
        m_out, (jnp.asarray(gidx), n + 1), jnp.asarray(d_aligned))
    got = np.asarray(d_packed)
    assert got.shape == (n + 1, width)
    assert np.isfinite(got[:n]).all(), \
        "dead-slot garbage leaked out of the sentinel row"
    offsets = np.cumsum(counts) - counts
    for g in range(n):
        expect = d_aligned[offsets[g]:offsets[g] + counts[g]].sum(axis=0) \
            if counts[g] else np.zeros(width, np.float32)
        np.testing.assert_allclose(got[g], expect, rtol=1e-5, atol=1e-5)


def test_row_cull_per_entry_depth_keys():
    """The non-sorted binning branch (prim_shard's mode) with culling:
    per-tile entries must still come out depth-ascending, and the culled
    set must be a subset of the rect set."""
    rng = np.random.default_rng(11)
    n = 120
    W, H = 2 * TILE_W, 4 * TILE_H
    ntx, nty = W // TILE_W, H // TILE_H
    A = rng.standard_normal((n, 2, 2)) * rng.uniform(1, 20, (n, 1, 1))
    cov = A @ np.transpose(A, (0, 2, 1)) + 0.3 * np.eye(2)
    conic_m = np.linalg.inv(cov).astype(np.float32)
    conic = np.stack([conic_m[:, 0, 0], conic_m[:, 0, 1],
                      conic_m[:, 1, 1]], -1)
    op = rng.uniform(0.01, 1.0, n).astype(np.float32)
    t_cut = np.maximum(2.0 * np.log(op * 255.0), 0.0).astype(np.float32)
    mean2d = np.stack([rng.uniform(0, W, n),
                       rng.uniform(0, H, n)], -1).astype(np.float32)
    rx = np.ceil(np.sqrt(t_cut * cov[:, 0, 0])).astype(np.float32)
    ry = np.ceil(np.sqrt(t_cut * cov[:, 1, 1])).astype(np.float32)
    radius = np.maximum(rx, ry).astype(np.float32)
    depth = rng.uniform(0.5, 10.0, n).astype(np.float32)

    kw = dict(image_width=W, image_height=H, tile_h=TILE_H, tile_w=TILE_W,
              m_cap=64 * n, align=1, sort_gaussians=False)
    b0 = binning_lib.bin_gaussians(jnp.asarray(mean2d), jnp.asarray(depth),
                                   jnp.asarray(radius), rx=jnp.asarray(rx),
                                   ry=jnp.asarray(ry), **kw)
    b1 = binning_lib.bin_gaussians(jnp.asarray(mean2d), jnp.asarray(depth),
                                   jnp.asarray(radius), rx=jnp.asarray(rx),
                                   ry=jnp.asarray(ry),
                                   conic=jnp.asarray(conic),
                                   t_cut=jnp.asarray(t_cut), **kw)
    assert int(b1.num_pairs) <= int(b0.num_pairs)
    for b, other in ((b1, b0),):
        ts, tc = np.asarray(b.tile_start), np.asarray(b.tile_count)
        gs = np.asarray(b.gidx_sorted)
        ts0, tc0 = np.asarray(other.tile_start), np.asarray(other.tile_count)
        gs0 = np.asarray(other.gidx_sorted)
        for t in range(ntx * nty):
            seg = gs[ts[t]:ts[t] + tc[t]]
            d = depth[seg]
            assert (np.diff(d) >= 0).all(), f"tile {t} not depth-ordered"
            assert set(seg) <= set(gs0[ts0[t]:ts0[t] + tc0[t]]), \
                f"tile {t}: culling added pairs"
