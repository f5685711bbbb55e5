"""Naive per-pixel whole-image compositor — independent second oracle.

Composites every visible Gaussian against every pixel (O(N·H·W)) with the
same alpha/termination rules as the tile pipeline, including the tile-rect
coverage cut (a Gaussian only touches pixels whose tile lies in its radius
rect, matching CUDA's binning-induced support). Exists purely to cross-check
``binning`` + ``composite_tiles_*`` on tiny scenes; never used in training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import tile_rect
from gsplat_tpu.ops.preprocess import Preprocessed


def composite_naive(pre: Preprocessed, *, image_width: int, image_height: int,
                    tile_h: int, tile_w: int,
                    alpha_min: float = 1.0 / 255.0, alpha_max: float = 0.99,
                    t_eps: float = 1e-4):
    """Returns (accum (4,H,W) pre-background, t_final (H,W))."""
    H, W = image_height, image_width
    n_tiles_x = -(-W // tile_w)
    n_tiles_y = -(-H // tile_h)

    order = jnp.lexsort((jnp.arange(pre.depth.shape[0]), pre.depth))
    mean2d = pre.mean2d[order]
    conic = pre.conic[order]
    color = jnp.concatenate([pre.color, pre.invdepth[:, None]], -1)[order]
    opacity = pre.opacity[order]
    radius = pre.radius[order]
    x0, y0, x1, y1 = tile_rect(mean2d, radius, radius, n_tiles_x, n_tiles_y,
                               tile_h, tile_w)

    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    ptx = (px / tile_w).astype(jnp.int32)
    pty = (py / tile_h).astype(jnp.int32)

    def step(carry, g):
        accum, t, done = carry
        m2d, con, col, op, rad = (mean2d[g], conic[g], color[g], opacity[g],
                                  radius[g])
        in_rect = ((ptx >= x0[g]) & (ptx < x1[g]) &
                   (pty >= y0[g]) & (pty < y1[g]) & (rad > 0))
        dx = px - m2d[0]
        dy = py - m2d[1]
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(op * jnp.exp(jnp.minimum(power, 0.0)), alpha_max)
        a = jnp.where(in_rect & (alpha >= alpha_min) & (power <= 0.0), alpha, 0.0)
        test_t = t * (1.0 - a)
        cross = (a > 0) & (test_t < t_eps)
        contrib = (a > 0) & ~cross & ~done
        a = jnp.where(contrib, a, 0.0)
        accum = accum + (t * a)[None] * col[:, None, None]
        t = t * (1.0 - a)
        done = done | cross
        return (accum, t, done), None

    init = (jnp.zeros((4, H, W), jnp.float32), jnp.ones((H, W), jnp.float32),
            jnp.zeros((H, W), bool))
    (accum, t, _), _ = jax.lax.scan(step, init,
                                    jnp.arange(mean2d.shape[0]))
    return accum, t
