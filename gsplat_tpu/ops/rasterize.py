"""The differentiable render pipeline: preprocess → bin/sort → gather →
tile-composite → background/exposure.

This is the TPU-native counterpart of the reference's
``GaussianRasterizer(...)`` call plus its Python wrapper
(/root/reference/gaussian_renderer/__init__.py:18-128). Autodiff supplies
every backward chain except compositing (custom-VJP Pallas kernel, with the
pure-XLA compositor as oracle/fallback):

  preprocess (jnp, autodiff)            ~ CUDA preprocess fwd+bwd
  bin_gaussians (int ops, stop-grad)    ~ cub prefix-sum + radix sort
  packed[gidx]  (XLA gather; transpose = scatter-add)   ~ per-tile fetch
  composite_tiles (Pallas custom VJP)   ~ CUDA render fwd+bwd

The screen-space mean gradient tap (``mean2d_tap``) reproduces the
reference's zero-tensor trick (gaussian_renderer/__init__.py:25-30): pass
zeros of shape (N,2) and take the loss gradient w.r.t. it; the tap is scaled
by (W/2, H/2) so the magnitudes match the CUDA kernel's NDC-unit mean2D
gradients that feed densification thresholds.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.models.gaussian_model import GaussianParams
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import composite_ref
from gsplat_tpu.ops import preprocess as preprocess_lib


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # (3, H, W) clamped to [0,1]
    invdepth: jnp.ndarray     # (1, H, W)
    radii: jnp.ndarray        # (N,) float; 0 = invisible
    num_pairs: jnp.ndarray    # () int32 — binning load (diagnostics)
    overflow: jnp.ndarray     # () int32 — dropped pairs (should be 0)
    num_padded: jnp.ndarray = None  # () int32 — padded layout extent
    #   (for host pad_cap right-sizing; see RasterizerConfig.pad_cap)


def pack_rows(pre: preprocess_lib.Preprocessed) -> jnp.ndarray:
    """(N, 16) per-gaussian packed rows. Column layout (consumed by the
    kernels): 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
    6..8 rgb, 9 invdepth, 10..15 zero padding."""
    n = pre.mean2d.shape[0]
    return jnp.concatenate([
        pre.mean2d,                       # 0,1
        pre.conic,                        # 2,3,4
        pre.opacity[:, None],             # 5
        pre.color,                        # 6,7,8
        pre.invdepth[:, None],            # 9
        jnp.zeros((n, 6), pre.mean2d.dtype),
    ], axis=-1)


def pack_entries(pre: preprocess_lib.Preprocessed) -> jnp.ndarray:
    """(N+1, 16) packed rows; row N is the zero padding row addressed by
    sentinel indices."""
    cols = pack_rows(pre)
    return jnp.concatenate([cols, jnp.zeros((1, 16), cols.dtype)], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_entries(packed, gidx, inv_src, g_offsets, g_counts, m_cap):
    """entries = packed[gidx], with a hand-written backward.

    The backward is ONE duplicate-index scatter-add at ``gidx`` — the
    direct transpose. Two properties make it the right TPU form (r5
    on-chip A/B, tools/experiments/gather_ab.py at m=1.63M: scatter-add
    27.5 ms vs 21.4 gather + ~12 scan/boundary for the r2-r4 presort
    prefix-difference chain it replaces):

    - every dead aligned slot (pads, past-num_padded tail — including
      slots the chunk-grid backward kernel's dead-chunk DMA skip leaves
      as recycled HBM garbage) carries the SENTINEL gaussian id, so its
      row (finite or not) lands in the sentinel row of d_packed, which
      every caller discards (render()'s pack_entries concat drops the
      zero-row cotangent). No tail-zeroing contract needed.
    - XLA's TPU scatter-add is deterministic (no atomics), so grads are
      run-to-run identical, reassociated at worst vs the oracle (~7
      f32 addends per gaussian; well inside the pallas-vs-xla test
      tolerances).

    ``inv_src``/``g_offsets``/``g_counts`` stay in the signature for the
    sharded ring path (parallel/sharded.py), whose backward still uses the
    presort prefix-difference form (masked_presort_prefix below): its
    per-gaussian rows reduce-scatter across shards, where boundary
    differences compose with the ring and a duplicate scatter would not."""
    return packed[gidx]


def _gather_entries_fwd(packed, gidx, inv_src, g_offsets, g_counts, m_cap):
    return packed[gidx], (gidx, packed.shape[0])


def _blocked_prefix(d_presort, m_cap):
    """Two-level (blocked) prefix sums of the presort-ordered gradient rows:
    the boundary differences then carry f32 error that grows with the
    4096-entry block and the block chain instead of the full multi-million-
    entry running sum (whose magnitude would swamp gaussians with few
    entries — round-1 advisory). On TPU the MXU-blocked scan kernel computes
    both levels in one pass (~1 ms vs ~9 ms for XLA's multi-pass cumsum at
    this width; ops/pallas/scan.py). Returns (intra, block_pre, L)."""
    width = d_presort.shape[1]
    L = 4096
    B = -(-m_cap // L)
    pad_rows = B * L - m_cap
    d_pad = jnp.pad(d_presort, ((0, pad_rows), (0, 0)))
    if jax.default_backend() == "tpu" and width == 16:
        from gsplat_tpu.ops.pallas.scan import blocked_cumsum_16
        intra, block_tot = blocked_cumsum_16(d_pad, L=L)
    else:
        intra = jnp.cumsum(d_pad.reshape(B, L, width),
                           axis=1).reshape(B * L, width)
        block_tot = intra[L - 1::L]                     # (B, width)
    block_pre = jnp.cumsum(block_tot, axis=0) - block_tot
    return intra, block_pre, L


def _prefix_at(intra, block_pre, L, bnd):
    """cs(j) = inclusive prefix sum of the first j presort rows, evaluated
    at positions ``bnd`` (any int array) from the blocked representation."""
    jm1 = jnp.maximum(bnd - 1, 0)
    v = intra[jm1] + block_pre[jm1 // L]
    return jnp.where((bnd > 0)[..., None], v, 0.0)


def masked_presort_prefix(d_aligned, inv_src, total, m_cap):
    """``_blocked_prefix`` of the presort-ordered gradient rows with the
    tail past ``total`` ZEROED first. Rows there come from sentinel
    inv_src slots pointing at d_aligned positions the backward kernel
    never wrote (the dead-chunk DMA skip leaves them as recycled HBM
    bits). The exact-add cumsum never surfaces them in any boundary
    difference, but the MXU scan kernel multiplies them by literal zeros
    — and 0·NaN/0·Inf poisons every prefix row of the block containing
    ``total``. EVERY gather-VJP variant must route through this helper
    (the single-chip path below and parallel/sharded's ring backward)."""
    d_presort = d_aligned[inv_src]                      # (m_cap, width)
    d_presort = jnp.where(
        (jnp.arange(m_cap, dtype=jnp.int32) < total)[:, None],
        d_presort, 0.0)
    return _blocked_prefix(d_presort, m_cap)


def masked_presort_prefix_slabs(d_aligned, inv_src, slab_totals, m_slab,
                                m_cap):
    """``masked_presort_prefix`` for the slab-streamed presort layout
    (ops/binning.py merge_slab_binning): slab s owns presort rows
    [s·m_slab, (s+1)·m_slab) of which only the first slab_totals[s] are
    real — the per-slab dead tails must be zeroed before the MXU scan for
    the same 0·garbage reason as the single-list tail."""
    d_presort = d_aligned[inv_src]                      # (m_cap, width)
    pos = jnp.arange(m_cap, dtype=jnp.int32)
    s = pos // m_slab
    valid = (pos - s * m_slab) < slab_totals[s]
    d_presort = jnp.where(valid[:, None], d_presort, 0.0)
    return _blocked_prefix(d_presort, m_cap)


def _gather_entries_bwd(m_cap, res, d_aligned):
    gidx, n_rows = res
    width = d_aligned.shape[1]
    d_packed = jnp.zeros((n_rows, width), d_aligned.dtype).at[gidx].add(
        d_aligned, mode="drop")
    return d_packed, None, None, None, None


_gather_entries.defvjp(_gather_entries_fwd, _gather_entries_bwd)


def use_pallas_resolved(cfg: RasterizerConfig) -> bool:
    """Normalize cfg.use_pallas: "auto" → Pallas on TPU; "on"/"off"
    strings and plain bools both accepted. Every dispatch site must use
    this — a truthy-string test would send "auto"/"off" down the Pallas
    path unconditionally."""
    up = cfg.use_pallas
    if isinstance(up, str):
        up = (jax.default_backend() == "tpu") if up == "auto" else (up == "on")
    return up


def composite_dispatch(entries, tile_start, tile_count,
                       cfg: RasterizerConfig, *, n_tiles_x: int,
                       n_tiles_y: int, tile_id_base=0, interpret=False,
                       t_init=None):
    """Route to the Pallas kernel or the pure-XLA oracle compositor.

    cfg.use_pallas: "auto" picks Pallas on TPU; bools are accepted from
    library callers. ``t_init`` (T,P): transmittance arriving from nearer
    depth slabs, scaling the early-out test only (prim_shard exact cut)."""
    if use_pallas_resolved(cfg):
        if cfg.compositor == "stream" and t_init is None:
            from gsplat_tpu.ops.pallas.composite_stream import \
                composite_tiles_stream
            return composite_tiles_stream(
                entries, tile_start, tile_count,
                n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=cfg.tile_h,
                tile_w=cfg.tile_w, chunk=cfg.chunk,
                strip_chunks=cfg.strip_chunks, alpha_min=cfg.alpha_min,
                alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
                moments=cfg.moments, interpret=interpret,
                tile_id_base=tile_id_base)
        from gsplat_tpu.ops.pallas.composite import composite_tiles_pallas
        return composite_tiles_pallas(
            entries, tile_start, tile_count,
            n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=cfg.tile_h,
            tile_w=cfg.tile_w, chunk=cfg.chunk, alpha_min=cfg.alpha_min,
            alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
            interpret=interpret, tile_id_base=tile_id_base, t_init=t_init)
    return composite_ref.composite_tiles_xla(
        entries, tile_start, tile_count,
        n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=cfg.tile_h,
        tile_w=cfg.tile_w, chunk=cfg.chunk, alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
        tile_id_base=tile_id_base, t_init=t_init)


def _tiles_to_image(tiles: jnp.ndarray, n_tiles_y: int, n_tiles_x: int,
                    tile_h: int, tile_w: int, H: int, W: int) -> jnp.ndarray:
    """(T, C, P) tile-flat → (C, H, W) cropped image."""
    C = tiles.shape[1]
    img = tiles.reshape(n_tiles_y, n_tiles_x, C, tile_h, tile_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(C, n_tiles_y * tile_h,
                                               n_tiles_x * tile_w)
    return img[:, :H, :W]


def render(gaussians: GaussianParams,
           cam: CameraView,
           image_width: int,
           image_height: int,
           bg_color: jnp.ndarray,                 # (3,)
           cfg: RasterizerConfig = RasterizerConfig(),
           *,
           scaling_modifier: float = 1.0,
           antialiasing: bool = False,
           mean2d_tap: Optional[jnp.ndarray] = None,   # (CAP,2) zeros tap
           exposure: Optional[jnp.ndarray] = None,     # (3,4) affine
           override_color: Optional[jnp.ndarray] = None,
           cov3d_precomp: Optional[jnp.ndarray] = None,
           m_cap: Optional[int] = None,
           clamp: bool = True,
           interpret: bool = False) -> RenderOutput:
    """Render one camera view. Fully jittable; all shapes static.

    Functional parity with reference gaussian_renderer/__init__.py:18-128
    (same output contract: clamped image, radii/visibility, invdepth image,
    exposure affine applied pre-clamp when given).
    """
    W, H = image_width, image_height
    th, tw = cfg.tile_h, cfg.tile_w
    n_tiles_x = -(-W // tw)
    n_tiles_y = -(-H // th)
    cap = gaussians.capacity
    if m_cap is None:
        m_cap = int(cap * cfg.pairs_per_gaussian)
    m_cap = -(-m_cap // cfg.chunk) * cfg.chunk
    if cfg.compositor == "stream" and use_pallas_resolved(cfg):
        # The strip grid needs the padded layout to be a whole number of
        # strips; grow m_cap (never pad_cap — bin_gaussians clamps that to
        # align*n_tiles) so no runtime concat is needed.
        from gsplat_tpu.ops.pallas.composite_stream import \
            pad_chunks_to_strips
        pc = cfg.pad_cap if cfg.pad_cap >= 0 \
            else cfg.chunk * n_tiles_x * n_tiles_y
        pc = min(-(-pc // cfg.chunk) * cfg.chunk,
                 cfg.chunk * n_tiles_x * n_tiles_y)
        m_cap = pad_chunks_to_strips(m_cap + pc, cfg.chunk,
                                     cfg.strip_chunks) - pc

    pre = preprocess_lib.preprocess(
        gaussians.xyz, gaussians.get_scaling(), gaussians.get_rotation(),
        gaussians.get_opacity(), gaussians.get_features(),
        gaussians.active_sh_degree, cam, W, H,
        active_mask=gaussians.active, scaling_modifier=scaling_modifier,
        antialiasing=antialiasing, dilation=cfg.dilation,
        alpha_min=cfg.alpha_min,
        cov3d_precomp=cov3d_precomp, colors_precomp=override_color)

    if mean2d_tap is not None:
        # NDC-unit gradient tap (see module docstring).
        tap_px = mean2d_tap * jnp.array([[0.5 * W, 0.5 * H]], jnp.float32)
        pre = pre._replace(mean2d=pre.mean2d + tap_px)

    cull_kw = {}
    if cfg.row_cull:
        cull_kw = dict(conic=jax.lax.stop_gradient(pre.conic),
                       t_cut=jax.lax.stop_gradient(pre.t_cut),
                       row_slots=cfg.row_slots)
    b = binning_lib.bin_gaussians(
        jax.lax.stop_gradient(pre.mean2d), jax.lax.stop_gradient(pre.depth),
        jax.lax.stop_gradient(pre.radius),
        rx=jax.lax.stop_gradient(pre.rx), ry=jax.lax.stop_gradient(pre.ry),
        image_width=W, image_height=H, tile_h=th, tile_w=tw, m_cap=m_cap,
        align=cfg.chunk, sort_gaussians=True,
        pad_cap=None if cfg.pad_cap < 0 else cfg.pad_cap, **cull_kw)

    # Per-gaussian tables in the binning's depth order (perm); the extra
    # row cap keeps the sentinel (= zero padding row) addressable. The
    # [perm_ext] gather's VJP is a unique-index scatter — cheap at N size.
    perm_ext = jnp.concatenate(
        [b.perm, jnp.full((1,), cap, jnp.int32)])
    packed = pack_entries(pre)[perm_ext]             # (N+1, 16), depth order
    if b.inv_src is not None:
        entries = _gather_entries(packed, b.gidx_sorted, b.inv_src,
                                  b.g_offsets, b.g_counts, m_cap)
    else:
        entries = packed[b.gidx_sorted]              # (M, 16) — diff gather

    out = composite_dispatch(
        entries, b.tile_start, b.tile_count, cfg,
        n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, interpret=interpret)

    accum_img = _tiles_to_image(out.accum, n_tiles_y, n_tiles_x, th, tw, H, W)
    t_img = _tiles_to_image(out.t_final[:, None, :], n_tiles_y, n_tiles_x,
                            th, tw, H, W)[0]         # (H, W)

    image = accum_img[:3] + t_img[None] * bg_color[:, None, None]
    invdepth = accum_img[3:4]

    if exposure is not None:
        # Parity: reference gaussian_renderer/__init__.py:113-115.
        image = jnp.einsum("chw,ck->khw", image, exposure[:3, :3],
                           precision=jax.lax.Precision.HIGHEST) \
            + exposure[:3, 3, None, None]
    if clamp:
        image = jnp.clip(image, 0.0, 1.0)

    return RenderOutput(image=image, invdepth=invdepth, radii=pre.radius,
                        num_pairs=b.num_pairs, overflow=b.overflow,
                        num_padded=b.num_padded)
