"""Pallas TPU tile-compositing kernels (forward + hand-derived backward).

TPU-native re-design of the reference CUDA *render* kernel pair
(diff-gaussian-rasterization forward.cu/backward.cu, reconstructed in
SURVEY.md §2.2). Layout decisions, driven by TPU hardware:

- The grid iterates over **entry chunks** (G gaussians each), not tiles:
  chunk i streams block i of the depth-sorted entry list through Mosaic's
  automatic input pipeline — double-buffered DMA with zero manual semaphore
  code. A scalar-prefetched table maps chunk → tile; the per-tile output
  blocks (accumulated color, transmittance, last contributor) use that
  table in their index_map, so a tile's state stays resident in VMEM across
  its consecutive chunks and is written back once.
- Per-chunk working set is (G, P) with **gaussians on sublanes** and
  **pixels on lanes** (P = tile pixels, a multiple of 128). This matches
  the (M, 16) row-major entry buffer exactly: input blocks are (G, 16)
  row slices and backward gradient blocks are (G, 16) row slices — neither
  direction needs the ~8.5 ms (16,M)↔(M,16) HBM transpose the previous
  pixels-on-sublanes layout paid on both sides of the kernel.
- Front-to-back transmittance inside a chunk: the FORWARD uses an exact-f32
  multiplicative prefix scan of (1−α) down the sublanes (log-step doubling
  on the VPU, ``_sublane_scan``) — the vector-parallel equivalent of CUDA's
  sequential per-thread ``T *= (1-alpha)`` loop; a log-space triangular
  matmul needs ≥bf16x3 MXU passes to keep the image inside the oracle gate
  on real hardware. The BACKWARD keeps the matmul form at DEFAULT
  precision — its rounding lands on gradients (1% gate), where it is
  measurably faster than two scans (see ``_tri_lower``). The
  early-termination cut (T·(1−α) < 1e-4 checked *before* committing, CUDA
  parity) reduces to a per-pixel min over crossing sublanes.
- Per-tile ranges are pre-aligned to G (ops/binning.py align=chunk): chunk
  blocks never straddle tiles and backward gradient writes are
  collision-free by construction.
- Backward re-walks the chunks front-to-back (recompute strategy, like the
  CUDA backward) using the saved final transmittance + last-contributor
  index; per-entry gradients stream out through the same block pipeline
  (every block is written — no uninitialized rows) and the gather-VJP
  reduction accumulates them onto the N Gaussians.

Entry column layout (matches ops/rasterize.pack_entries):
  col 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6..8 rgb,
  9 invdepth, 10..15 pad.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.composite_ref import CompositeOut


def _tri_lower(G: int, strict: bool, dtype=jnp.float32):
    """L[g, k] = 1 where k < g (strict) or k <= g: L @ (G,P) = prefix sums
    down the sublane (gaussian) axis. BACKWARD-kernel only: its ~1e-3
    relative rounding at DEFAULT matmul precision lands on gradients
    (gate: within 1% of the oracle — passes), not the image; the forward
    uses the exact _sublane_scan instead. Measured r4: scan-based bwd
    31.5 ms vs matmul bwd 23.5 ms at the 1080p bench."""
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return ((c < r) if strict else (c <= r)).astype(dtype)


def _sublane_scan(x, op, unit):
    """Inclusive prefix scan down the sublane (gaussian) axis by log-step
    doubling: ceil(log2 G) shifted-`op` rounds, exact f32 on the VPU.

    Replaces the (G,G)×(G,P) triangular-matmul form: measured on-chip (r4)
    the MXU matmul needs ≥bf16x3 passes to stay inside the oracle gate
    (DEFAULT drifted the image 1.3e-3; HIGHEST fixed it but cost ~21% of
    the whole train step), while this form is exact f32, costs only
    log2(G) vector ops, and — used multiplicatively on (1−α) — deletes the
    log1p/exp transcendental round-trip from the kernel entirely."""
    G, P = x.shape
    s = 1
    while s < G:
        pad = jnp.full((s, P), unit, x.dtype)
        x = op(x, jnp.concatenate([pad, x[:-s]], axis=0))
        s *= 2
    return x


def _prodscan_excl(x):
    """(inclusive scan, exclusive scan) of products down sublanes: excl[g]
    = ∏_{k<g} x[k] (row 0 = 1), incl[g] = ∏_{k<=g} x[k]."""
    incl = _sublane_scan(x, jnp.multiply, 1.0)
    excl = jnp.concatenate(
        [jnp.ones((1, x.shape[1]), x.dtype), incl[:-1]], axis=0)
    return incl, excl


def _pixel_coords(t, n_tiles_x: int, tile_h: int, tile_w: int):
    """(1,P) pixel centers for tile t (row-major pixels within the tile)."""
    P = tile_h * tile_w
    ox = (t % n_tiles_x) * tile_w
    oy = (t // n_tiles_x) * tile_h
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (ox + p % tile_w).astype(jnp.float32)
    py = (oy + p // tile_w).astype(jnp.float32)
    return px, py


def _alpha_terms(data, px, py):
    """data (G,16) chunk; px/py (1,P) → dx, dy, power, alpha_raw (G,P)."""
    mx, my = data[:, 0:1], data[:, 1:2]
    ca, cb, cc = data[:, 2:3], data[:, 3:4], data[:, 4:5]
    op = data[:, 5:6]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # exp clamped at 0: power>0 entries are masked out everywhere, and an
    # unclamped exp would overflow to inf and poison masked lanes via 0·inf.
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    return dx, dy, power, alpha_raw


def _alpha_terms_local(data, pxl, pyl, ox, oy):
    """``_alpha_terms`` in TILE-LOCAL coordinates (pxl/pyl (1,P) are pixel
    centers relative to the tile origin ox/oy; the mean shifts to (G,1)
    mxl = mx − ox). Same values to ≤1 ulp — tile-local dx is in fact the
    tighter form: |mxl| ≤ radius + tile_w for any binned pair, so the
    subtraction rounds at ulp(radius+32) instead of ulp(1920). The
    quadratic uses the 6-FMA Horner split q = dx·(ca·dx + cb·dy) +
    dy·(cb·dx + cc·dy) (exact same reassociation class as the expanded
    form, 2 fewer VPU ops per (G,P) element). Returns (dx, dy, mxl, myl,
    power, alpha_raw)."""
    mxl = data[:, 0:1] - ox
    myl = data[:, 1:2] - oy
    ca, cb, cc = data[:, 2:3], data[:, 3:4], data[:, 4:5]
    op = data[:, 5:6]
    dx = pxl - mxl
    dy = pyl - myl
    u = ca * dx + cb * dy
    v = cb * dx + cc * dy
    power = -0.5 * (dx * u + dy * v)
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    return dx, dy, mxl, myl, power, alpha_raw


def _local_coords(tile_h: int, tile_w: int):
    """(1,P) TILE-LOCAL pixel centers (row-major pixels within the tile).
    Tile-id independent — hoistable out of per-chunk loops; pair with the
    tile origin from ``_tile_origin`` for global positioning."""
    P = tile_h * tile_w
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    return ((p % tile_w).astype(jnp.float32),
            (p // tile_w).astype(jnp.float32))


def _tile_origin(t, n_tiles_x: int, tile_h: int, tile_w: int):
    """Scalar (ox, oy) pixel origin of tile t, as f32."""
    return ((t % n_tiles_x) * tile_w).astype(jnp.float32), \
        ((t // n_tiles_x) * tile_h).astype(jnp.float32)


from gsplat_tpu.ops.binning import chunk_tables  # noqa: F401  (shared with
#   the XLA oracle compositor; moved to binning.py, re-exported here for
#   existing importers)


# ---------------------------------------------------------------- forward

def _fwd_kernel(ct_ref, rank0_ref, cnt_ref, base_ref, dma_ref, entries_ref,
                *refs,
                G: int, P: int, n_tiles_x: int, tile_h: int, tile_w: int,
                alpha_min: float, alpha_max: float, t_eps: float,
                has_tinit: bool):
    # Per-chunk fixed cost is ~half the forward kernel (measured 0.9 of
    # 1.9 us/chunk), dominated by per-block index_map/revisit machinery —
    # so the three per-tile outputs (accum, t_final, nc) are ONE merged
    # (6,P) f32 block (rows 0-3 accum, 4 t_final, 5 nc-as-f32; counts stay
    # exact in f32 below 2^24), and the t_init input block exists only for
    # the depth-slab exact-cut path (has_tinit).
    if has_tinit:
        tinit_ref, out_ref, st_t, st_done = refs
    else:
        out_ref, st_t, st_done = refs
        tinit_ref = None
    i = pl.program_id(0)
    t = ct_ref[i] + base_ref[0]   # global tile id (tile-sharded rendering)
    rank0 = rank0_ref[i]
    count = cnt_ref[i]

    @pl.when(rank0 == 0)
    def _init():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((4, P), jnp.float32), jnp.ones((1, P), jnp.float32),
             jnp.zeros((1, P), jnp.float32)], axis=0)
        st_t[:] = jnp.ones((1, P), jnp.float32)
        st_done[:] = jnp.zeros((1, P), jnp.float32)

    live = jnp.logical_and(rank0 < count, st_done[0, 0] < 2.0)

    @pl.when(live)
    def _step():
        px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        data = entries_ref[:]                                 # (G,16)
        tcur = st_t[:]                                        # (1,P)
        done = st_done[:] > 0.0                               # (1,P)
        _, _, power, alpha_raw = _alpha_terms(data, px, py)
        alpha = jnp.minimum(alpha_raw, alpha_max)
        valid = (rank0 + g_iota) < count                      # (G,1)
        a1 = jnp.where(valid & (alpha >= alpha_min) & (power <= 0.0),
                       alpha, 0.0)                            # (G,P)
        # Transmittance by exact-f32 multiplicative prefix scan of (1−α)
        # down the sublanes (see _sublane_scan note); incl = tcur-relative
        # ∏_{k<=g}(1−α_k), excl the strict form. The remaining contraction
        # dots stay on the MXU at HIGHEST — their FLOPs are negligible
        # (K or output dim = 4) and bf16 rounding there shows in the image.
        one_m = 1.0 - a1                                      # (G,P)
        incl, excl = _prodscan_excl(one_m)
        t_excl = tcur * excl                                  # (G,P)
        # early-termination cut: contributions stop AT the first sublane
        # where the post-commit GLOBAL transmittance would cross t_eps
        # (CUDA parity); t_excl·(1−α) ≡ tcur·incl. tinit is the
        # transmittance arriving from nearer depth slabs (1 everywhere
        # single-chip); it scales the cut test only — accumulation stays
        # unit-T so the sharded merge stays differentiable.
        if has_tinit:
            t_arr = tinit_ref[0]                              # (1,P)
            cross = (a1 > 0.0) & (t_arr * tcur * incl < t_eps)
        else:
            cross = (a1 > 0.0) & (tcur * incl < t_eps)
        first_cross = jnp.min(jnp.where(cross, g_iota, G), axis=0,
                              keepdims=True)                  # (1,P)
        contrib = (a1 > 0.0) & (g_iota < first_cross) & jnp.logical_not(done)
        w = jnp.where(contrib, t_excl * a1, 0.0)              # (G,P)
        col = data[:, 6:10]                                   # (G,4)
        new_accum = out_ref[0, :4] + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (4,P)
        # Committed-rows product ∏_{g<first_cross} (1−α_g) without a second
        # scan: every factor is ≤1 so incl is non-increasing down rows, and
        # the masked min over committed rows IS incl[first_cross−1] (1.0
        # fill ⇒ tcur unchanged when nothing commits / pixel done).
        commit = (g_iota < first_cross) & jnp.logical_not(done)
        st_t[:] = tcur * jnp.min(jnp.where(commit, incl, 1.0), axis=0,
                                 keepdims=True)
        new_done = done | jnp.any(cross, axis=0, keepdims=True)
        st_done[:] = new_done.astype(jnp.float32)
        rank1 = (rank0 + g_iota + 1).astype(jnp.float32)      # (G,1)
        new_nc = jnp.maximum(
            out_ref[0, 5:6], jnp.max(jnp.where(contrib, rank1, 0.0), axis=0,
                                     keepdims=True))
        out_ref[0] = jnp.concatenate([new_accum, st_t[:], new_nc], axis=0)
        # whole-tile early out: flag 2.0 skips remaining chunks' compute
        # (done pixels read st_done > 0, so 2.0 keeps per-pixel semantics)
        @pl.when(jnp.all(new_done))
        def _():
            st_done[:] = jnp.full((1, P), 2.0)


def _composite_fwd_call(entries, tile_start, tile_count, tile_base, t_init,
                        *, n_tiles_x, n_tiles_y, tile_h, tile_w, chunk,
                        alpha_min, alpha_max, t_eps, interpret):
    """entries: (M, 16) packed rows, with per-tile ranges aligned to `chunk`
    (binning align=chunk). t_init: (T, P) incoming transmittance for the
    early-out test (depth-slab sharding), or None for the standard cut."""
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries.shape[0]
    n_chunks = M // G
    has_tinit = t_init is not None

    ct, rank0, cnt, dma, _end = chunk_tables(
        tile_start, tile_count, n_tiles=T, chunk=G, n_chunks=n_chunks,
        with_dma=True)

    kernel = functools.partial(
        _fwd_kernel, G=G, P=P, n_tiles_x=n_tiles_x, tile_h=tile_h,
        tile_w=tile_w, alpha_min=alpha_min, alpha_max=alpha_max, t_eps=t_eps,
        has_tinit=has_tinit)

    in_specs = [
        # dead chunks revisit the last live entry block — no DMA issued
        pl.BlockSpec((G, 16), lambda i, ct, r0, cn, tb, dm: (dm[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [entries]
    if has_tinit:
        in_specs.append(
            pl.BlockSpec((1, 1, P),
                         lambda i, ct, r0, cn, tb, dm: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(jnp.concatenate(
            [t_init.reshape(T, 1, P), jnp.ones((1, 1, P), jnp.float32)]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 6, P), lambda i, ct, r0, cn, tb, dm:
                               (ct[i], 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + 1, 6, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ct, rank0, cnt, tile_base, dma, *inputs)
    # empty tiles are never visited by any chunk — their rows are
    # uninitialized; mask them to the empty-tile state.
    empty = (tile_count == 0)
    emptyp = jnp.concatenate([empty, jnp.ones((1,), bool)])[:, None]
    accum = jnp.where(emptyp[:, None], 0.0, out[:, :4])[:T]
    t_final = jnp.where(emptyp, 1.0, out[:, 4])[:T][:, None, :]
    nc = jnp.where(emptyp, 0.0, out[:, 5]).astype(jnp.int32)[:T][:, None, :]
    return accum, t_final, nc


# ------------------------------------------------- transmittance-only pass

def _tmit_kernel(ct_ref, rank0_ref, cnt_ref, dma_ref, entries_ref, out_ref,
                 *, G: int, P: int, n_tiles_x: int, tile_h: int, tile_w: int,
                 alpha_min: float, alpha_max: float):
    # Accumulates Σ log1p(-a1) per pixel — the CUT-FREE slab transmittance
    # in log space. No triangular matmuls, no color contraction, no
    # done/contributor bookkeeping: ~the alpha evaluation alone, which is
    # the cheap part of compositing. Used by the depth-slab exact-cut
    # pre-pass (parallel/prim_shard.py), which previously paid a full
    # cut-free composite per slab (round-2 review finding).
    i = pl.program_id(0)
    t = ct_ref[i]
    rank0 = rank0_ref[i]
    count = cnt_ref[i]

    @pl.when(rank0 == 0)
    def _init():
        out_ref[:] = jnp.zeros((1, 1, P), jnp.float32)

    @pl.when(rank0 < count)
    def _step():
        px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        data = entries_ref[:]
        _, _, power, alpha_raw = _alpha_terms(data, px, py)
        alpha = jnp.minimum(alpha_raw, alpha_max)
        valid = (rank0 + g_iota) < count
        a1 = jnp.where(valid & (alpha >= alpha_min) & (power <= 0.0),
                       alpha, 0.0)
        out_ref[:] = out_ref[:] + jnp.sum(jnp.log1p(-a1), axis=0,
                                          keepdims=True)[None]


def slab_transmittance_pallas(entries, tile_start, tile_count, *, n_tiles_x,
                              n_tiles_y, tile_h, tile_w, chunk=128,
                              alpha_min=1.0 / 255.0, alpha_max=0.99,
                              interpret=False):
    """(T, P) cut-free transmittance Π(1-α) over each tile's whole entry
    list. Equals composite(t_eps=0).t_final (tested) at a fraction of the
    cost. Non-differentiable by intent (callers stop_gradient anyway)."""
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries.shape[0]
    n_chunks = M // G
    ct, rank0, cnt, dma, _end = chunk_tables(
        tile_start, tile_count, n_tiles=T, chunk=G, n_chunks=n_chunks,
        with_dma=True)
    kernel = functools.partial(
        _tmit_kernel, G=G, P=P, n_tiles_x=n_tiles_x, tile_h=tile_h,
        tile_w=tile_w, alpha_min=alpha_min, alpha_max=alpha_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((G, 16), lambda i, ct, r0, cn, dm: (dm[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        # unit middle dim so the block's last-two dims (1,P) EQUAL the
        # array's — a 2D (1,P) block over (T+1,P) violates the TPU tiling
        # contract (second-minor must be 8-divisible or full); interpret
        # mode doesn't check (caught on-chip, round 4)
        out_specs=pl.BlockSpec((1, 1, P),
                               lambda i, ct, r0, cn, dm: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    lg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + 1, 1, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ct, rank0, cnt, dma, entries)
    # empty tiles are never visited: mask to T=1
    return jnp.where((tile_count == 0)[:, None], 1.0,
                     jnp.exp(lg[:T, 0]))


# ---------------------------------------------------------------- backward

def _bwd_kernel(ct_ref, rank0_ref, cnt_ref, base_ref, dma_ref, out_idx_ref,
                entries_ref,
                tile_ref,
                d_entries_ref,
                st_t, st_cumu, *,
                G: int, P: int, n_tiles_x: int, tile_h: int, tile_w: int,
                alpha_min: float, alpha_max: float, t_eps: float):
    # All five per-tile tensors arrive as ONE merged (11,P) block — per-
    # block index_map/revisit machinery is the dominant per-chunk fixed
    # cost (measured ~0.9 us/chunk): rows 0-3 g_accum, 4 g_t, 5-8 accum,
    # 9 t_final, 10 n_contrib (f32).
    i = pl.program_id(0)
    t = ct_ref[i] + base_ref[0]   # global tile id (tile-sharded rendering)
    rank0 = rank0_ref[i]
    count = cnt_ref[i]

    @pl.when(rank0 == 0)
    def _init():
        st_t[:] = jnp.ones((1, P), jnp.float32)
        st_cumu[:] = jnp.zeros((1, P), jnp.float32)

    d_entries_ref[:] = jnp.zeros((G, 16), jnp.float32)

    @pl.when(rank0 < count)
    def _step():
        px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        data = entries_ref[:]                                 # (G,16)
        tb = tile_ref[0]                                      # (11,P)
        g_acc = tb[0:4]                                       # (4,P)
        g_t = tb[4:5]                                         # (1,P)
        acc = tb[5:9]                                         # (4,P)
        t_n = tb[9:10]                                        # (1,P)
        nc = tb[10:11]                                        # (1,P) f32
        # P0 = g·accum_total; bg blending happens outside via the t_final
        # cotangent, so no bg term appears here.
        p0 = jnp.sum(g_acc * acc, axis=0, keepdims=True)      # (1,P)
        gt_tn = g_t * t_n                                     # (1,P)

        tcur = st_t[:]
        cum_u = st_cumu[:]
        dx, dy, power, alpha_raw = _alpha_terms(data, px, py)
        alpha = jnp.minimum(alpha_raw, alpha_max)
        rank = rank0 + g_iota                                 # (G,1)
        keep = ((rank < count) & (alpha >= alpha_min) & (power <= 0.0)
                & (rank.astype(jnp.float32) < nc))            # (G,P)
        a2 = jnp.where(keep, alpha, 0.0)
        # log-space triangular matmul at DEFAULT precision (see _tri_lower
        # note: bwd-only — grads tolerate it, the image path does not)
        lg2 = jnp.log1p(-a2)
        t_excl = tcur * jnp.exp(
            jnp.dot(_tri_lower(G, strict=True), lg2,
                    preferred_element_type=jnp.float32))      # (G,P)
        w = t_excl * a2                                       # (G,P)
        col = data[:, 6:10]                                   # (G,4)
        gc = jax.lax.dot_general(col, g_acc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)  # (G,P)
        u = w * gc
        cum_incl = cum_u + jnp.dot(_tri_lower(G, strict=False), u,
                                   preferred_element_type=jnp.float32)
        s_term = (p0 - cum_incl) + gt_tn                      # (G,P)
        one_m = jnp.where(keep, 1.0 - a2, 1.0)
        dl_da = jnp.where(keep, gc * t_excl - s_term / one_m, 0.0)
        # dL/dc_j (channel) = Σ_px w·g → (G,4), already in output layout
        d_col = jax.lax.dot_general(w, g_acc, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        # CUDA-parity: gradient passes through the 0.99 alpha clamp.
        # (A moment-matmul variant — one (G,P)@(P,6) contraction against
        # [1,x,y,x²,y²,xy] replacing these six lane reductions — measured
        # +5 ms/step SLOWER on-chip: the reductions are not the bottleneck
        # here. See tools/experiments/ notes.)
        dl_dpow = jnp.where(keep, dl_da * alpha_raw, 0.0)     # (G,P)
        d_op = jnp.sum(jnp.where(keep,
                                 dl_da * jnp.exp(jnp.minimum(power, 0.0)),
                                 0.0),
                       axis=1, keepdims=True)                 # (G,1)
        d_ca = jnp.sum(dl_dpow * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cb = jnp.sum(dl_dpow * (-dx * dy), axis=1, keepdims=True)
        d_cc = jnp.sum(dl_dpow * (-0.5 * dy * dy), axis=1, keepdims=True)
        ca, cb, cc = data[:, 2:3], data[:, 3:4], data[:, 4:5]
        d_mx = jnp.sum(dl_dpow * (ca * dx + cb * dy), axis=1, keepdims=True)
        d_my = jnp.sum(dl_dpow * (cc * dy + cb * dx), axis=1, keepdims=True)
        d_entries_ref[:] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col,
             jnp.zeros((G, 6), jnp.float32)], axis=1)         # (G,16)
        st_t[:] = tcur * jnp.exp(jnp.sum(lg2, axis=0, keepdims=True))
        st_cumu[:] = cum_u + jnp.sum(u, axis=0, keepdims=True)


def _composite_bwd_call(entries, tile_start, tile_count, tile_base, accum,
                        t_final, nc, g_accum, g_t, *, n_tiles_x, n_tiles_y,
                        tile_h, tile_w, chunk, alpha_min, alpha_max, t_eps,
                        interpret):
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries.shape[0]
    n_chunks = M // G

    # Beyond a tile's last contributor (max n_contrib over its pixels) every
    # entry has keep = False and zero gradient — clamp the effective count
    # so those chunks skip compute entirely (their d blocks are zeroed by
    # the unconditional init). On saturating scenes this skips most of the
    # backward walk, mirroring the forward's early-out economics.
    max_nc = jnp.max(nc[:, 0, :], axis=1).astype(jnp.int32)    # (T,)
    ct, rank0, cnt, dma, end = chunk_tables(tile_start, tile_count,
                                            n_tiles=T, chunk=G,
                                            n_chunks=n_chunks,
                                            count_clamp=max_nc,
                                            with_dma=True)
    # d_entries block routing: clamp-dead chunks still write their zero
    # block (the reduction consumes those rows), but the contiguous tail
    # region — rows past the real aligned layout, never consumed — shares
    # ONE block (`end`), so tail chunks cost no output DMA after the first.
    ci = jnp.arange(n_chunks, dtype=jnp.int32)
    out_idx = jnp.where(ci < end, ci,
                        jnp.minimum(end, n_chunks - 1)).astype(jnp.int32)
    # ONE merged (T+1, 11, P) per-tile input (see _bwd_kernel layout); the
    # sentinel row keeps every ct[i] addressable.
    merged = jnp.concatenate(
        [g_accum, g_t[:, None, :] if g_t.ndim == 2 else g_t,
         accum, t_final, nc.astype(jnp.float32)], axis=1)      # (T,11,P)
    merged = jnp.concatenate(
        [merged, jnp.zeros((1, 11, P), jnp.float32)
         .at[0, 9].set(1.0)], axis=0)                          # sentinel

    kernel = functools.partial(
        _bwd_kernel, G=G, P=P, n_tiles_x=n_tiles_x, tile_h=tile_h,
        tile_w=tile_w, alpha_min=alpha_min, alpha_max=alpha_max, t_eps=t_eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_chunks,),
        in_specs=[
            # dead chunks (clamp-skipped + tail) revisit the last live
            # entry block — no input DMA issued
            pl.BlockSpec((G, 16), lambda i, ct, r0, cn, tb, dm, oi:
                         (dm[i], 0),
                         memory_space=pltpu.VMEM),             # entries
            pl.BlockSpec((1, 11, P), lambda i, ct, r0, cn, tb, dm, oi:
                         (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),             # merged tile
        ],
        out_specs=pl.BlockSpec((G, 16), lambda i, ct, r0, cn, tb, dm, oi:
                               (oi[i], 0),
                               memory_space=pltpu.VMEM),       # d_entries
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    d_entries = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ct, rank0, cnt, tile_base, dma, out_idx, entries, merged)
    # Contract: rows past the aligned layout's real extent (the tail) are
    # UNSPECIFIED on hardware — the out_idx routing above never writes
    # them. Consumers MUST NOT read them as numbers: sentinel inv_src
    # slots DO address this tail, which is why _gather_entries_bwd zeroes
    # presort rows past the real entry count before its prefix scan (the
    # MXU kernel's 0·garbage would otherwise propagate NaN/Inf — see
    # test_gather_vjp_masks_unwritten_tail). In interpret mode (the
    # oracle-comparison tests) zero them so raw d_entries comparisons
    # stay exact.
    if interpret:
        row = jnp.arange(M, dtype=jnp.int32)
        d_entries = jnp.where((row < end * G)[:, None], d_entries, 0.0)
    return d_entries


# ---------------------------------------------------------------- public op

class _Static(NamedTuple):
    n_tiles_x: int
    n_tiles_y: int
    tile_h: int
    tile_w: int
    chunk: int
    alpha_min: float
    alpha_max: float
    t_eps: float
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _composite(entries, tile_start, tile_count, tile_base, t_init, static):
    accum, t_final, nc = _composite_fwd_call(
        entries, tile_start, tile_count, tile_base, t_init,
        **static._asdict())
    return accum, t_final, nc


def _composite_fwd(entries, tile_start, tile_count, tile_base, t_init,
                   static):
    accum, t_final, nc = _composite_fwd_call(
        entries, tile_start, tile_count, tile_base, t_init,
        **static._asdict())
    # the backward needs no t_init: n_contrib already encodes the cut
    return (accum, t_final, nc), (entries, tile_start, tile_count,
                                  tile_base, accum, t_final, nc)


def _composite_bwd(static, res, cot):
    entries, tile_start, tile_count, tile_base, accum, t_final, nc = res
    g_accum, g_t, _ = cot     # n_contrib is int-valued aux: no cotangent
    d_entries = _composite_bwd_call(
        entries, tile_start, tile_count, tile_base, accum, t_final, nc,
        g_accum, g_t, **static._asdict())
    return d_entries, None, None, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_pallas(entries, tile_start, tile_count, *, n_tiles_x,
                           n_tiles_y, tile_h, tile_w, chunk=128,
                           alpha_min=1.0 / 255.0, alpha_max=0.99,
                           t_eps=1e-4, interpret=False,
                           tile_id_base=0, t_init=None) -> CompositeOut:
    """entries: (M, 16) packed rows with chunk-aligned per-tile ranges
    (ops/binning.bin_gaussians(align=chunk)). Returns the same contract as
    the XLA oracle: accum (T,4,P), t_final (T,P), n_contrib (T,P)."""
    T = n_tiles_x * n_tiles_y
    static = _Static(n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=tile_h,
                     tile_w=tile_w, chunk=chunk, alpha_min=alpha_min,
                     alpha_max=alpha_max, t_eps=t_eps, interpret=interpret)
    base = jnp.reshape(jnp.asarray(tile_id_base, jnp.int32), (1,))
    if t_init is not None:
        t_init = jax.lax.stop_gradient(t_init)
    accum, t_final, nc = _composite(entries, tile_start, tile_count, base,
                                    t_init, static)
    P = tile_h * tile_w
    return CompositeOut(accum=accum,
                        t_final=t_final.reshape(T, P),
                        n_contrib=nc.reshape(T, P))
