"""Tile-sharded rendering: the image tile grid split across chips.

New capability (SURVEY.md §2.3 "SP/CP analogue"): for large renders the
pixel-tile grid is sharded over the ``tile`` mesh axis. v1 strategy:
preprocess + binning run replicated (cheap relative to compositing), the
sorted entry list is replicated in every chip's HBM, and each chip
composites only its contiguous slice of tiles — zero communication in the
forward (tiles are disjoint), one all-gather of image slices at the end if a
full image is needed on one host. Gradients: each chip produces entry
gradients for its tiles; the gather-transpose scatter-add then psums per-
Gaussian grads over the axis.

Primitive-major sharding (Gaussian set sharded, depth-ordered segment merge
over ICI) is the companion strategy for >HBM scenes — see parallel/prim_shard
(round 2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models.gaussian_model import GaussianParams
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import composite_ref
from gsplat_tpu.ops import preprocess as preprocess_lib
from gsplat_tpu.ops.rasterize import pack_entries, _tiles_to_image


def render_tile_sharded(gaussians: GaussianParams, cam: CameraView,
                        image_width: int, image_height: int,
                        bg_color: jnp.ndarray, cfg: RasterizerConfig,
                        mesh: Mesh, axis: str = "tile", *,
                        antialiasing: bool = False,
                        m_cap: int | None = None, interpret: bool = False):
    """Render with tiles sharded over mesh[axis]. Returns (3,H,W) image
    (replicated via all-gather of tile slices)."""
    W, H = image_width, image_height
    th, tw = cfg.tile_h, cfg.tile_w
    n_dev = mesh.shape[axis]
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    # pad the tile grid so it divides evenly over the axis
    n_tiles_y_pad = -(-n_tiles_y // n_dev) * n_dev
    T = n_tiles_x * n_tiles_y_pad
    cap = gaussians.capacity
    if m_cap is None:
        m_cap = int(cap * cfg.pairs_per_gaussian)
    m_cap = -(-m_cap // cfg.chunk) * cfg.chunk

    pre = preprocess_lib.preprocess(
        gaussians.xyz, gaussians.get_scaling(), gaussians.get_rotation(),
        gaussians.get_opacity(), gaussians.get_features(),
        gaussians.active_sh_degree, cam, W, H,
        active_mask=gaussians.active, antialiasing=antialiasing,
        dilation=cfg.dilation, alpha_min=cfg.alpha_min)
    b = binning_lib.bin_gaussians(
        jax.lax.stop_gradient(pre.mean2d), jax.lax.stop_gradient(pre.depth),
        jax.lax.stop_gradient(pre.radius),
        rx=jax.lax.stop_gradient(pre.rx), ry=jax.lax.stop_gradient(pre.ry),
        image_width=W, image_height=n_tiles_y_pad * th, tile_h=th, tile_w=tw,
        m_cap=m_cap, align=cfg.chunk, sort_gaussians=True)
    from gsplat_tpu.ops.rasterize import _gather_entries
    perm_ext = jnp.concatenate(
        [b.perm, jnp.full((1,), gaussians.capacity, jnp.int32)])
    # custom-VJP gather: backward is gather+cumsum, not the M-sized
    # duplicate-index scatter-add the plain gather's transpose would emit
    entries = _gather_entries(pack_entries(pre)[perm_ext], b.gidx_sorted,
                              b.inv_src, b.g_offsets, b.g_counts, m_cap)

    def shard_fn(tile_start, tile_count, entries):
        from gsplat_tpu.ops.rasterize import composite_dispatch
        base = jax.lax.axis_index(axis) * (T // n_dev)
        out = composite_dispatch(
            entries, tile_start, tile_count, cfg,
            n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y_pad // n_dev,
            tile_id_base=base, interpret=interpret)
        return out.accum, out.t_final

    accum, t_final = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False)(b.tile_start, b.tile_count, entries)

    accum_img = _tiles_to_image(accum, n_tiles_y_pad, n_tiles_x, th, tw, H, W)
    t_img = _tiles_to_image(t_final[:, None, :], n_tiles_y_pad, n_tiles_x,
                            th, tw, H, W)[0]
    image = accum_img[:3] + t_img[None] * bg_color[:, None, None]
    return jnp.clip(image, 0.0, 1.0), accum_img[3:4]
