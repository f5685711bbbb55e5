"""Tile binning: exact key duplication + global (tile, depth) sort, all XLA.

TPU-native replacement for the reference rasterizer's cub pipeline
(InclusiveSum → key duplication → 64-bit radix sort → tile ranges; SURVEY.md
§2.2). Instead of CUDA's prefix-sum + per-thread scatter we use the
static-shape "repeat" trick: ``jnp.repeat(arange(N), counts,
total_repeat_length=M_cap)`` expands each Gaussian into exactly
rect-area-many (tile, depth) entries inside a fixed capacity buffer, then one
``lax.sort`` with two keys (tile id, f32 depth — exact ordering, no key
quantization) groups entries per tile in front-to-back order. Per-tile ranges
come from two searchsorted passes. Overflow beyond M_cap is counted and
surfaced so the host can double capacity and re-jit (same policy as Gaussian
capacity growth).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gidx_sorted: jnp.ndarray   # (M_cap,) int32 gaussian index per entry (N = pad)
    tile_sorted: jnp.ndarray   # (M_cap,) int32 tile id per entry (n_tiles = pad)
    tile_start: jnp.ndarray    # (T,) int32 first entry per tile
    tile_count: jnp.ndarray    # (T,) int32 entries per tile
    num_pairs: jnp.ndarray     # () int32 total real entries (pre-truncation)
    overflow: jnp.ndarray      # () int32 dropped entries (0 if M_cap sufficed)


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              n_tiles_x: int, n_tiles_y: int, tile_h: int, tile_w: int):
    """Inclusive-exclusive tile rectangle [x0,x1)×[y0,y1) covered by each
    Gaussian's radius. CUDA getRect parity (BLOCK → our tile_h/tile_w)."""
    x0 = jnp.clip(((mean2d[:, 0] - radius) / tile_w), 0, n_tiles_x).astype(jnp.int32)
    y0 = jnp.clip(((mean2d[:, 1] - radius) / tile_h), 0, n_tiles_y).astype(jnp.int32)
    x1 = jnp.clip(((mean2d[:, 0] + radius + tile_w - 1) // tile_w), 0, n_tiles_x).astype(jnp.int32)
    y1 = jnp.clip(((mean2d[:, 1] + radius + tile_h - 1) // tile_h), 0, n_tiles_y).astype(jnp.int32)
    # Negative-coordinate floor: jnp int cast truncates toward 0; use floor.
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_w), 0, n_tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_h), 0, n_tiles_y).astype(jnp.int32)
    return x0, y0, x1, y1


def bin_gaussians(mean2d: jnp.ndarray, depth: jnp.ndarray, radius: jnp.ndarray,
                  *, image_width: int, image_height: int,
                  tile_h: int, tile_w: int, m_cap: int,
                  align: int = 1) -> Binning:
    """Build the sorted (tile ‖ depth)-ordered entry list.

    All inputs should be stop-gradiented by the caller — ordering is not
    differentiated (CUDA reference likewise treats the sort as constant).

    With ``align > 1`` every tile's entry range starts at a multiple of
    ``align`` and is padded (sentinel entries) to a multiple of ``align``.
    The Pallas kernels require align == chunk: per-chunk DMAs then always
    start 128-lane-aligned and per-tile gradient writes never touch another
    tile's rows. Output arrays have static length m_cap + align·n_tiles.
    """
    n = mean2d.shape[0]
    n_tiles_x = -(-image_width // tile_w)
    n_tiles_y = -(-image_height // tile_h)
    n_tiles = n_tiles_x * n_tiles_y

    x0, y0, x1, y1 = tile_rect(mean2d, radius, n_tiles_x, n_tiles_y, tile_h, tile_w)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(radius > 0, rect_w * rect_h, 0).astype(jnp.int32)  # (N,)

    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - m_cap, 0)

    # Expand: entry e belongs to gaussian gidx[e]; k = rank of e within its
    # gaussian's rect (row-major over the rect).
    gidx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                      total_repeat_length=m_cap)   # (M,) pads with last value
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)
    valid = e_idx < total
    k = e_idx - offsets[gidx]
    w = jnp.maximum(rect_w[gidx], 1)
    ty = y0[gidx] + k // w
    tx = x0[gidx] + k % w
    tile = ty * n_tiles_x + tx
    tile = jnp.where(valid, tile, n_tiles)         # sentinel sorts last
    entry_depth = jnp.where(valid, depth[gidx], jnp.inf)
    gidx = jnp.where(valid, gidx, n)               # sentinel gaussian

    tile_sorted, _, gidx_sorted = jax.lax.sort(
        (tile, entry_depth, gidx), num_keys=2)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    if align > 1:
        padded_count = -(-tile_count // align) * align
        ends = jnp.cumsum(padded_count).astype(jnp.int32)
        padded_start = ends - padded_count
        m_out = m_cap + align * n_tiles
        nn = jnp.arange(m_out, dtype=jnp.int32)
        t_of = jnp.searchsorted(ends, nn, side="right").astype(jnp.int32)
        t_c = jnp.minimum(t_of, n_tiles - 1)
        rank = nn - padded_start[t_c]
        src = tile_start[t_c] + rank
        valid2 = (t_of < n_tiles) & (rank < tile_count[t_c])
        src = jnp.clip(src, 0, m_cap - 1)
        gidx_aligned = jnp.where(valid2, gidx_sorted[src], n)
        tile_aligned = jnp.where(valid2, t_c, n_tiles)
        return Binning(gidx_sorted=gidx_aligned, tile_sorted=tile_aligned,
                       tile_start=padded_start, tile_count=tile_count,
                       num_pairs=total, overflow=overflow)

    return Binning(gidx_sorted=gidx_sorted, tile_sorted=tile_sorted,
                   tile_start=tile_start, tile_count=tile_count,
                   num_pairs=total, overflow=overflow)
