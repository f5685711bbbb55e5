"""Tile-sharded rendering: the image tile grid split across chips.

New capability (SURVEY.md §2.3 "SP/CP analogue"): for large renders the
pixel-tile grid is sharded over the ``tile`` mesh axis, and — v2 — the
BINNING shards with the tiles: each chip builds only its tile-row window's
entry list (the ``parallel/sharded.py`` y-shift trick) at m_cap/D, so the
expansion, sort, gather, compositing and backward all run at ~1/D size per
chip. (v1 replicated binning and the full entry list in every chip's HBM,
which defeated the large-render motivation — round-2 review finding.)

Gaussians stay replicated (this axis scales PIXELS, not primitives);
gradient flow: each chip produces entry gradients for its window, the
gather-VJP reduces them to per-gaussian rows locally, and the replicated
parameters' cotangents psum over the axis (``_psum_grad``). Zero forward
communication except the final image-slab all_gather.

Primitive-major sharding (Gaussian set sharded, storage + compute at 1/D)
is the companion strategy for >HBM scenes — parallel/sharded.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.models.gaussian_model import GaussianParams
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import preprocess as preprocess_lib
from gsplat_tpu.ops.rasterize import (_gather_entries, _tiles_to_image,
                                      composite_dispatch, pack_entries,
                                      use_pallas_resolved)


def render_tile_sharded(gaussians: GaussianParams, cam: CameraView,
                        image_width: int, image_height: int,
                        bg_color: jnp.ndarray, cfg: RasterizerConfig,
                        mesh: Mesh, axis: str = "tile", *,
                        antialiasing: bool = False,
                        m_cap: int | None = None, interpret: bool = False):
    """Render with tiles sharded over mesh[axis]. Returns ((3,H,W) image
    (replicated via all-gather of tile-row slabs), (1,H,W) invdepth,
    num_pairs, overflow). A tile-imbalanced scene can overflow one chip's
    m_cap/D window while the global pair count fits — callers must treat
    overflow > 0 frames as garbage (grow m_cap and re-render), exactly
    like the single-chip contract."""
    from gsplat_tpu.parallel.sharded import _psum_grad

    W, H = image_width, image_height
    th, tw = cfg.tile_h, cfg.tile_w
    n_dev = mesh.shape[axis]
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    # pad the tile grid so it divides evenly over the axis
    n_tiles_y_pad = -(-n_tiles_y // n_dev) * n_dev
    rows_loc = n_tiles_y_pad // n_dev
    cap = gaussians.capacity
    if m_cap is None:
        m_cap = int(cap * cfg.pairs_per_gaussian)
    # per-chip capacity: 1/D of the total with an imbalance margin
    m_loc = -(-int(m_cap * 1.5 / n_dev) // cfg.chunk) * cfg.chunk
    if cfg.compositor == "stream" and use_pallas_resolved(cfg):
        # the strip grid needs the padded layout (m_loc + the local
        # default pad_cap) to be a whole number of strips — same
        # rounding render() applies to its m_cap
        from gsplat_tpu.ops.pallas.composite_stream import \
            pad_chunks_to_strips
        pc = cfg.chunk * n_tiles_x * rows_loc
        m_loc = pad_chunks_to_strips(m_loc + pc, cfg.chunk,
                                     cfg.strip_chunks) - pc

    def shard_fn(trainables, active, sh_degree, cam):
        # replicated params, per-window cotangents → explicit psum backward
        trainables = jax.tree_util.tree_map(
            lambda v: _psum_grad(v, axis), trainables)
        g = GaussianParams(active_sh_degree=sh_degree, active=active,
                           **trainables)
        pre = preprocess_lib.preprocess(
            g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity(),
            g.get_features(), sh_degree, cam, W, H, active_mask=active,
            antialiasing=antialiasing, dilation=cfg.dilation,
            alpha_min=cfg.alpha_min)
        k = jax.lax.axis_index(axis)
        # local tile-row window: shift y so the standard binning runs on a
        # [0, rows_loc·th) window at per-chip capacity
        shift = (k * rows_loc * th).astype(jnp.float32)
        mean2d_w = jnp.stack(
            [pre.mean2d[:, 0], pre.mean2d[:, 1] - shift], axis=-1)
        cull_kw = {}
        if cfg.row_cull:
            cull_kw = dict(conic=jax.lax.stop_gradient(pre.conic),
                           t_cut=jax.lax.stop_gradient(pre.t_cut),
                           row_slots=cfg.row_slots)
        b = binning_lib.bin_gaussians(
            jax.lax.stop_gradient(mean2d_w),
            jax.lax.stop_gradient(pre.depth),
            jax.lax.stop_gradient(pre.radius),
            rx=jax.lax.stop_gradient(pre.rx),
            ry=jax.lax.stop_gradient(pre.ry),
            image_width=W, image_height=rows_loc * th, tile_h=th, tile_w=tw,
            m_cap=m_loc, align=cfg.chunk, sort_gaussians=True, **cull_kw)
        perm_ext = jnp.concatenate(
            [b.perm, jnp.full((1,), cap, jnp.int32)])
        entries = _gather_entries(pack_entries(pre)[perm_ext],
                                  b.gidx_sorted, b.inv_src, b.g_offsets,
                                  b.g_counts, m_loc)
        # entries carry GLOBAL mean2d — pass the global tile-id origin so
        # the compositor's pixel coordinates match the unshifted frame
        out = composite_dispatch(
            entries, b.tile_start, b.tile_count, cfg,
            n_tiles_x=n_tiles_x, n_tiles_y=rows_loc,
            tile_id_base=k * rows_loc * n_tiles_x, interpret=interpret)
        slab = jnp.concatenate([out.accum, out.t_final[:, None, :]], axis=1)
        slab = _tiles_to_image(slab, rows_loc, n_tiles_x, th, tw,
                               rows_loc * th, W)            # (5,h_loc,W)
        full = jax.lax.all_gather(slab, axis, tiled=True, axis=1)
        return (full[:, :H, :], jax.lax.psum(b.num_pairs, axis),
                jax.lax.pmax(b.overflow, axis))

    slab, num_pairs, overflow = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(gm.trainables(gaussians), gaussians.active,
      gaussians.active_sh_degree, cam)

    image = jnp.clip(slab[:3] + slab[4:5] * bg_color[:, None, None],
                     0.0, 1.0)
    return image, slab[3:4], num_pairs, overflow
