"""Primitive-sharded rendering: the Gaussian set split across chips by depth
slab, with a depth-ordered segment merge over ICI.

New capability (SURVEY.md §2.3 "TP analogue", BASELINE config 5): when the
pair list / compositing work (or, later, the parameter set itself) exceeds
one chip, shard the *primitives*. Alpha compositing is associative over
depth-ordered segments:

    merge((C_a, T_a) near, (C_b, T_b) far) = (C_a + T_a*C_b, T_a*T_b)

so if every chip composites a contiguous **depth slab** of Gaussians over the
full tile grid, the per-pixel partials combine exactly — the 3DGS analogue of
ring-attention's ordered online-softmax merge.

v1 strategy (single-camera render):
1. preprocess runs replicated (cheap: O(N) elementwise vs O(pairs·P)
   compositing);
2. per-frame depth-slab boundaries come from a sampled quantile of visible
   depths (identical on every chip — no communication);
3. each chip bins + composites ONLY its slab (the expensive stages shard);
4. one all_gather of per-tile (accum, t_final) segments over the ``prim``
   axis and an exclusive-transmittance fold gives the exact image.

The fold is differentiable; gradients flow back through each chip's own
segment, so a backward pass psums parameter grads over the axis exactly like
camera-DP. Early-termination parity comes from a two-pass transmittance
carry (see ``render_prim_sharded``'s ``exact_cut``). For parameter-sharded
STORAGE (>HBM scenes) see ``parallel/sharded.py`` — the flagship axis,
which shards by tile rows instead of depth slabs and is exact by
construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models.gaussian_model import GaussianParams
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import composite_ref
from gsplat_tpu.ops import preprocess as preprocess_lib
from gsplat_tpu.ops.rasterize import pack_entries, _tiles_to_image


def _slab_bounds(depth: jnp.ndarray, visible: jnp.ndarray, n_dev: int,
                 n_samples: int = 4096):
    """Per-frame depth-slab boundaries (n_dev+1,) from an evenly strided
    sample of visible depths. Deterministic, replicated on every chip."""
    big = jnp.float32(3.0e38)
    d = jnp.where(visible, depth, big)
    d = jnp.sort(d)
    n_vis = jnp.maximum(jnp.sum(visible.astype(jnp.int32)), 1)
    # stride the sample over ALL n_vis visible depths (an i/n_samples·take
    # stride over the first `take` sorted entries sampled only the nearest
    # n_samples depths whenever n_vis > n_samples, collapsing every inner
    # boundary into the near field and dumping ~all pairs on the far
    # slab — review finding), then take even quantiles OF THE SAMPLE.
    idx = (jnp.arange(n_samples, dtype=jnp.float32) / n_samples
           * n_vis.astype(jnp.float32)).astype(jnp.int32)
    sample = d[jnp.clip(idx, 0, depth.shape[0] - 1)]            # sorted
    q = np.arange(1, n_dev) * n_samples // n_dev
    inner = sample[jnp.clip(q, 0, n_samples - 1)]
    return jnp.concatenate([jnp.full((1,), -big), inner,
                            jnp.full((1,), big)])


def render_prim_sharded(gaussians: GaussianParams, cam: CameraView,
                        image_width: int, image_height: int,
                        bg_color: jnp.ndarray, cfg: RasterizerConfig,
                        mesh: Mesh, axis: str = "prim", *,
                        antialiasing: bool = False,
                        m_cap: int | None = None, interpret: bool = False,
                        exact_cut: bool = True):
    """Render with primitives depth-slab-sharded over mesh[axis].

    Returns (image (3,H,W), invdepth (1,H,W), overflow ()). ``overflow`` is
    the pmax over chips of dropped pairs: depth slabs can be load-imbalanced
    against the per-chip m_cap, and a truncated slab's image is garbage by
    the binning contract — callers must check it and grow-and-retry exactly
    like the single-chip path.

    With ``exact_cut`` (default) the early-termination semantics match the
    single-chip renderer to the cut's own magnitude: a first CUT-FREE
    transmittance pass per slab is all_gathered, the exclusive product
    gives each slab the transmittance ARRIVING from nearer slabs, and the
    second (real) pass feeds it to the compositor's cut test — the
    contribution sets then agree with single-chip compositing except for
    sub-eps tails. Costs one extra forward composite per slab;
    ``exact_cut=False`` restores the single-pass behavior, whose cut
    diverges by up to ~1e-2 on nearly saturated pixels (each slab restarts
    at local T=1). The merge itself is exact either way. m_cap is the
    PER-CHIP pair-list capacity (the scaling win: each chip bins/sorts/
    composites only ~1/n_dev of the pairs).
    """
    W, H = image_width, image_height
    th, tw = cfg.tile_h, cfg.tile_w
    n_dev = mesh.shape[axis]
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    T = n_tiles_x * n_tiles_y
    cap = gaussians.capacity
    if m_cap is None:
        m_cap = int(cap * cfg.pairs_per_gaussian / n_dev)
    m_cap = -(-m_cap // cfg.chunk) * cfg.chunk

    pre = preprocess_lib.preprocess(
        gaussians.xyz, gaussians.get_scaling(), gaussians.get_rotation(),
        gaussians.get_opacity(), gaussians.get_features(),
        gaussians.active_sh_degree, cam, W, H,
        active_mask=gaussians.active, antialiasing=antialiasing,
        dilation=cfg.dilation, alpha_min=cfg.alpha_min)
    bounds = _slab_bounds(jax.lax.stop_gradient(pre.depth),
                          jax.lax.stop_gradient(pre.radius) > 0, n_dev)
    packed = pack_entries(pre)                                   # (N+1,16)

    def shard_fn(packed, pre_mean2d, pre_depth, pre_radius, pre_rx, pre_ry,
                 bounds):
        # NOTE on gradients: ``packed`` is replicated (P() in-spec) and
        # differentiable; shard_map's transpose psums the per-slab
        # cotangents itself here — verified empirically by
        # test_prim_sharded_grads_match_single, which FAILS with a 2x
        # grad if an explicit _psum_grad is added on top. (tile_shard's
        # explicit _psum_grad serves its different out-spec layout.)
        k = jax.lax.axis_index(axis)
        lo = bounds[k]
        hi = bounds[k + 1]
        # half-open slabs [lo, hi); the last slab is closed by +big bound
        in_slab = (pre_depth >= lo) & (pre_depth < hi)
        radius = jnp.where(in_slab, pre_radius, 0.0)
        from gsplat_tpu.ops.rasterize import composite_dispatch
        cull_kw = {}
        if cfg.row_cull:
            # slab masking rides radius/rx/ry (valid_g); the per-gaussian
            # intervals are slab-independent so the union over slabs drops
            # exactly the single-chip culled set
            cull_kw = dict(conic=jax.lax.stop_gradient(pre.conic),
                           t_cut=jax.lax.stop_gradient(pre.t_cut),
                           row_slots=cfg.row_slots)
        b = binning_lib.bin_gaussians(
            pre_mean2d, pre_depth, radius,
            rx=jnp.where(in_slab, pre_rx, 0.0),
            ry=jnp.where(in_slab, pre_ry, 0.0),
            image_width=W, image_height=H,
            tile_h=th, tile_w=tw, m_cap=m_cap, align=cfg.chunk, **cull_kw)
        from gsplat_tpu.ops.rasterize import _gather_entries
        entries = _gather_entries(packed, b.gidx_sorted, b.inv_src,
                                  b.g_offsets, b.g_counts, m_cap)
        t_arrive = None
        if exact_cut:
            # pass 1: cut-free per-slab transmittance Π(1-α); its exclusive
            # product over nearer slabs is the transmittance each pixel
            # arrives with — fed to pass 2's cut test for single-chip-parity
            # termination. Needs NO compositing order, so it runs as the
            # dedicated log-sum kernel (~the alpha evaluation alone — the
            # previous full cut-free composite per slab roughly doubled the
            # sharded forward; round-2 review finding).
            from gsplat_tpu.ops.rasterize import use_pallas_resolved
            if use_pallas_resolved(cfg):
                from gsplat_tpu.ops.pallas.composite import \
                    slab_transmittance_pallas
                t_slab = slab_transmittance_pallas(
                    jax.lax.stop_gradient(entries), b.tile_start,
                    b.tile_count, n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y,
                    tile_h=th, tile_w=tw, chunk=cfg.chunk,
                    alpha_min=cfg.alpha_min, alpha_max=cfg.alpha_max,
                    interpret=interpret)
            else:
                import dataclasses as _dc
                t_slab = composite_dispatch(
                    jax.lax.stop_gradient(entries), b.tile_start,
                    b.tile_count, _dc.replace(cfg, transmittance_eps=0.0),
                    n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y,
                    interpret=interpret).t_final
            t_nocut = jax.lax.all_gather(
                jax.lax.stop_gradient(t_slab), axis)            # (D,T,P)
            t_arrive = jnp.cumprod(jnp.concatenate(
                [jnp.ones_like(t_nocut[:1]), t_nocut[:-1]], axis=0),
                axis=0)[jax.lax.axis_index(axis)]               # (T,P)
        out = composite_dispatch(
            entries, b.tile_start, b.tile_count, cfg,
            n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, interpret=interpret,
            t_init=t_arrive)
        # ordered segment merge: all_gather (k-major = near-to-far), fold
        seg_a = jax.lax.all_gather(out.accum, axis)       # (n_dev,T,4,P)
        seg_t = jax.lax.all_gather(out.t_final, axis)     # (n_dev,T,P)
        t_excl = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(seg_t[:1]), seg_t[:-1]], axis=0),
            axis=0)                                        # (n_dev,T,P)
        accum = jnp.sum(seg_a * t_excl[:, :, None, :], axis=0)   # (T,4,P)
        t_final = t_excl[-1] * seg_t[-1]                   # (T,P)
        return accum, t_final, jax.lax.pmax(b.overflow, axis)

    accum, t_final, overflow = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)(packed, jax.lax.stop_gradient(pre.mean2d),
                         jax.lax.stop_gradient(pre.depth),
                         jax.lax.stop_gradient(pre.radius),
                         jax.lax.stop_gradient(pre.rx),
                         jax.lax.stop_gradient(pre.ry), bounds)

    accum_img = _tiles_to_image(accum, n_tiles_y, n_tiles_x, th, tw, H, W)
    t_img = _tiles_to_image(t_final[:, None, :], n_tiles_y, n_tiles_x,
                            th, tw, H, W)[0]
    image = accum_img[:3] + t_img[None] * bg_color[:, None, None]
    return jnp.clip(image, 0.0, 1.0), accum_img[3:4], overflow
