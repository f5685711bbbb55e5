"""Strip-grid streaming compositor: the chunk-grid kernels' math with the
per-chunk Mosaic block machinery removed.

Round-5 on-chip profiling showed the chunk-grid forward kernel
(ops/pallas/composite.py) running at ~0.93 us per 128-entry chunk — almost
exactly its measured per-grid-step FIXED cost (index_map evaluation,
revisit checks, double-buffer swaps for 3-4 blocks), with the actual
VPU/MXU compute nearly free beside it. At ~16-21k chunks per 1080p frame
that fixed cost alone is ~15-19 ms per kernel pass, twice per step.

This module re-grids the same math so the fixed cost is paid per STRIP of
C consecutive chunks instead of per chunk:

- grid = (S,) strips; each strip's input block is (C·G, 16) entry rows —
  ONE Mosaic-pipelined DMA per strip (the aligned layout makes every
  tile's chunks contiguous, so a strip is a contiguous row range).
- the kernel body runs a lax.fori_loop over the strip's C chunks, reading
  chunk lc as a dynamic sublane slice of the resident block — a register
  move, not a block swap.
- per-tile state (accum / transmittance / done / n_contrib) lives in VMEM
  scratch, which persists across grid steps, so tiles that straddle strip
  boundaries carry over for free (same property the chunk grid relied on).
- outputs are written per-chunk into the strip's (C, 6, P) output block
  (unconditionally — dead chunks repeat the previous state, which is
  harmless: only each tile's LAST chunk slot is read outside). The
  per-tile result is then one monotone (T,)-row gather at the last-chunk
  indices — ~50 MB of streaming traffic, amortized far below the block
  machinery it replaces.
- the backward walks the same strips; its per-tile (11, P) cotangent/
  residual rows arrive duplicated per chunk (an XLA gather at n_chunks
  granularity), and d_entries stream out through the strip output block.

Semantics are IDENTICAL to ops/pallas/composite.py (same alpha floor/
clamp, early-termination cut before commit, count clamping past the last
contributor); equality is asserted against the XLA oracle in
tests/test_rasterize.py and on-chip by tools/drive_render.py --ab_stream.

The t_init (depth-slab exact-cut) path stays on the chunk-grid kernel —
it is not on the single-chip hot path; composite_dispatch routes there.

Reference: diff-gaussian-rasterization forward.cu/backward.cu semantics
as reconstructed in SURVEY.md §2.2 (renderCUDA fwd/bwd contracts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.binning import chunk_tables
from gsplat_tpu.ops.composite_ref import CompositeOut
from gsplat_tpu.ops.pallas.composite import (
    _alpha_terms_local,
    _local_coords,
    _prodscan_excl,
    _tile_origin,
    _tri_lower,
)


def _strip_grid(n_chunks: int, strip_chunks: int):
    """(S, C): C = chunks per strip, S·C == n_chunks (callers pad)."""
    C = strip_chunks
    assert n_chunks % C == 0, (n_chunks, C)
    return n_chunks // C, C


def pad_chunks_to_strips(m_out: int, chunk: int, strip_chunks: int) -> int:
    """Smallest padded row count ≥ m_out that is a whole number of strips.
    Host-side static arithmetic: callers size pad_cap with this so the
    entry buffer needs no runtime concat."""
    rows_per_strip = chunk * strip_chunks
    return -(-m_out // rows_per_strip) * rows_per_strip


# ---------------------------------------------------------------- forward


def _fwd_strip_kernel(ct_ref, rank0_ref, cnt_ref, base_ref, entries_ref,
                      out_ref, st, st_done, *,
                      C: int, G: int, P: int, n_tiles_x: int, tile_h: int,
                      tile_w: int, alpha_min: float, alpha_max: float,
                      t_eps: float):
    # st: (6,P) persistent tile state — rows 0-3 accum, 4 transmittance,
    # 5 n_contrib (exact in f32 below 2^24). st_done: (1,P) 0/1/2 flag
    # (2 = whole-tile early out).
    s = pl.program_id(0)
    pxl, pyl = _local_coords(tile_h, tile_w)      # tile-independent (1,P)

    def body(lc, _):
        j = s * C + lc
        t = ct_ref[j] + base_ref[0]
        rank0 = rank0_ref[j]
        count = cnt_ref[j]

        @pl.when(rank0 == 0)
        def _init():
            st[:] = jnp.concatenate(
                [jnp.zeros((4, P), jnp.float32),
                 jnp.ones((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32)], axis=0)
            st_done[:] = jnp.zeros((1, P), jnp.float32)

        live = jnp.logical_and(rank0 < count, st_done[0, 0] < 2.0)

        @pl.when(live)
        def _step():
            ox, oy = _tile_origin(t, n_tiles_x, tile_h, tile_w)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            data = entries_ref[pl.ds(lc * G, G), :]              # (G,16)
            tcur = st[4:5]                                       # (1,P)
            done = st_done[:] > 0.0                              # (1,P)
            _, _, _, _, power, alpha_raw = _alpha_terms_local(
                data, pxl, pyl, ox, oy)
            alpha = jnp.minimum(alpha_raw, alpha_max)
            valid = (rank0 + g_iota) < count                     # (G,1)
            a1 = jnp.where(valid & (alpha >= alpha_min) & (power <= 0.0),
                           alpha, 0.0)                           # (G,P)
            one_m = 1.0 - a1
            incl, excl = _prodscan_excl(one_m)
            t_excl = tcur * excl                                 # (G,P)
            cross = (a1 > 0.0) & (tcur * incl < t_eps)
            first_cross = jnp.min(jnp.where(cross, g_iota, G), axis=0,
                                  keepdims=True)                 # (1,P)
            contrib = (a1 > 0.0) & (g_iota < first_cross) \
                & jnp.logical_not(done)
            w = jnp.where(contrib, t_excl * a1, 0.0)             # (G,P)
            col = data[:, 6:10]                                  # (G,4)
            new_accum = st[0:4] + jax.lax.dot_general(
                col, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)             # (4,P)
            commit = (g_iota < first_cross) & jnp.logical_not(done)
            new_t = tcur * jnp.min(jnp.where(commit, incl, 1.0), axis=0,
                                   keepdims=True)
            new_done = done | jnp.any(cross, axis=0, keepdims=True)
            rank1 = (rank0 + g_iota + 1).astype(jnp.float32)     # (G,1)
            new_nc = jnp.maximum(
                st[5:6], jnp.max(jnp.where(contrib, rank1, 0.0), axis=0,
                                 keepdims=True))
            st[:] = jnp.concatenate([new_accum, new_t, new_nc], axis=0)
            st_done[:] = jnp.where(jnp.all(new_done), 2.0,
                                   new_done.astype(jnp.float32))

        # Snapshot the state into this chunk's slot only when it is the
        # tile's LAST chunk (the next chunk starts a different tile) —
        # the only slot the outside gather reads.
        cur = ct_ref[j]
        n_total = pl.num_programs(0) * C
        nxt = jnp.where(j + 1 < n_total, ct_ref[jnp.minimum(j + 1,
                                                            n_total - 1)],
                        cur + 1)

        @pl.when(nxt != cur)
        def _snapshot():
            out_ref[pl.ds(lc, 1)] = st[:].reshape(1, 6, P)

        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=False)


def composite_fwd_stream(entries, tile_start, tile_count, tile_base, *,
                         n_tiles_x, n_tiles_y, tile_h, tile_w, chunk,
                         strip_chunks, alpha_min, alpha_max, t_eps,
                         interpret):
    """Forward pass. entries (M,16) with M a whole number of strips
    (pad_chunks_to_strips); returns (accum (T,4,P), t_final (T,1,P),
    nc (T,1,P) int32)."""
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries.shape[0]
    n_chunks = M // G
    S, C = _strip_grid(n_chunks, strip_chunks)

    ct, rank0, cnt = chunk_tables(tile_start, tile_count, n_tiles=T,
                                  chunk=G, n_chunks=n_chunks)

    kernel = functools.partial(
        _fwd_strip_kernel, C=C, G=G, P=P, n_tiles_x=n_tiles_x,
        tile_h=tile_h, tile_w=tile_w, alpha_min=alpha_min,
        alpha_max=alpha_max, t_eps=t_eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((C * G, 16), lambda s, ct, r0, cn, tb: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 6, P), lambda s, ct, r0, cn, tb:
                               (s, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((6, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    per_chunk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 6, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # strips carry multi-MB blocks; the default 16 MB scoped
            # budget is sized for per-chunk blocks
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ct, rank0, cnt, tile_base, entries)

    # Per-tile rows live at each tile's last chunk slot: one monotone
    # T-sized row gather. Empty tiles (count 0) alias another tile's slot
    # — masked to the empty-tile state below, same as the chunk grid.
    n_chk_t = -(-tile_count // G)                                # (T,)
    last = jnp.clip(tile_start // G + n_chk_t - 1, 0, n_chunks - 1)
    out = per_chunk[last]                                        # (T,6,P)
    empty = (tile_count == 0)[:, None]
    accum = jnp.where(empty[:, None], 0.0, out[:, :4])
    t_final = jnp.where(empty, 1.0, out[:, 4])[:, None, :]
    nc = jnp.where(empty, 0.0, out[:, 5]).astype(jnp.int32)[:, None, :]
    return accum, t_final, nc


# ---------------------------------------------------------------- backward


def _bwd_strip_kernel(ct_ref, rank0_ref, cnt_ref, base_ref, entries_ref,
                      tile_ref, d_ref, st_t, st_cumu, *,
                      C: int, G: int, P: int, n_tiles_x: int, tile_h: int,
                      tile_w: int, alpha_min: float, alpha_max: float,
                      moments: str):
    s = pl.program_id(0)
    pxl, pyl = _local_coords(tile_h, tile_w)      # tile-independent (1,P)
    # moments="mxu": contract the six per-gaussian grad reductions against
    # a (8,P) moment basis in one MXU contraction at bf16x3 (manual hi/lo
    # splits — Mosaic lowers only DEFAULT/HIGHEST), with moments taken
    # about the TILE-LOCAL origin and shifted to the mean afterwards on
    # (G,1) data (bf16x3 keeps the shift cancellation ≤ ~5e-4 relative on
    # conic GRADIENTS for 1-px splats). MEASURED-AND-REJECTED on-chip
    # (r5 bench A/B): mxu 17.9 Mpx/s vs vpu 19.2 — the K=P, N=8
    # contraction runs the 128-wide MXU at 6% output utilization and the
    # per-chunk hi/lo splits add VPU work; at HIGHEST the dot costs +9 ms
    # more. "vpu" (default) keeps the exact elementwise+tree form; the
    # flag stays as the documented, tested experiment switch.
    basis_h = basis_l = None
    if moments == "mxu":
        basis = jnp.concatenate([
            jnp.ones((1, P), jnp.float32), pxl, pyl,
            pxl * pxl, pxl * pyl, pyl * pyl,
            jnp.zeros((2, P), jnp.float32)], axis=0)
        # Mosaic lowers only DEFAULT/HIGHEST dot precisions, so bf16x3 is
        # spelled manually: hi/lo bf16 splits, drop the lo·lo term. The
        # basis split is loop-invariant (hoisted here, one-time cost).
        basis_h = basis.astype(jnp.bfloat16)
        basis_l = (basis - basis_h.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(lc, _):
        j = s * C + lc
        t = ct_ref[j] + base_ref[0]
        rank0 = rank0_ref[j]
        count = cnt_ref[j]

        @pl.when(rank0 == 0)
        def _init():
            st_t[:] = jnp.ones((1, P), jnp.float32)
            st_cumu[:] = jnp.zeros((1, P), jnp.float32)

        d_ref[pl.ds(lc * G, G), :] = jnp.zeros((G, 16), jnp.float32)

        @pl.when(rank0 < count)
        def _step():
            ox, oy = _tile_origin(t, n_tiles_x, tile_h, tile_w)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            data = entries_ref[pl.ds(lc * G, G), :]               # (G,16)
            tb = tile_ref[lc]                                     # (11,P)
            g_acc = tb[0:4]
            g_t = tb[4:5]
            acc = tb[5:9]
            t_n = tb[9:10]
            nc = tb[10:11]
            p0 = jnp.sum(g_acc * acc, axis=0, keepdims=True)      # (1,P)
            gt_tn = g_t * t_n

            tcur = st_t[:]
            cum_u = st_cumu[:]
            dx, dy, mxl, myl, power, alpha_raw = _alpha_terms_local(
                data, pxl, pyl, ox, oy)
            alpha = jnp.minimum(alpha_raw, alpha_max)
            rank = rank0 + g_iota
            keep = ((rank < count) & (alpha >= alpha_min) & (power <= 0.0)
                    & (rank.astype(jnp.float32) < nc))            # (G,P)
            a2 = jnp.where(keep, alpha, 0.0)
            lg2 = jnp.log1p(-a2)
            t_excl = tcur * jnp.exp(
                jnp.dot(_tri_lower(G, strict=True), lg2,
                        preferred_element_type=jnp.float32))      # (G,P)
            w = t_excl * a2
            col = data[:, 6:10]
            gc = jax.lax.dot_general(col, g_acc, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
            u = w * gc
            cum_incl = cum_u + jnp.dot(_tri_lower(G, strict=False), u,
                                       preferred_element_type=jnp.float32)
            s_term = (p0 - cum_incl) + gt_tn
            one_m = jnp.where(keep, 1.0 - a2, 1.0)
            dl_da = jnp.where(keep, gc * t_excl - s_term / one_m, 0.0)
            d_col = jax.lax.dot_general(w, g_acc, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
            dl_dpow = dl_da * alpha_raw            # dl_da already masked
            # d_op·op = Σ dl_da·exp = Σ dl_dpow (alpha_raw = op·exp); any
            # kept entry has op ≥ alpha (≥ alpha_min), so the division is
            # bounded; op below the floor ⇒ nothing kept ⇒ m0 == 0.
            ca, cb, cc = data[:, 2:3], data[:, 3:4], data[:, 4:5]
            op = data[:, 5:6]
            if moments == "mxu":
                dims = (((1,), (1,)), ((), ()))
                w_h = dl_dpow.astype(jnp.bfloat16)
                w_l = (dl_dpow - w_h.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                mom = (jax.lax.dot_general(
                           w_h, basis_h, dims,
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           w_h, basis_l, dims,
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           w_l, basis_h, dims,
                           preferred_element_type=jnp.float32))   # (G,8)
                m0 = mom[:, 0:1]
                s_x = mom[:, 1:2] - mxl * m0       # Σ w·dx (dx = x − mxl)
                s_y = mom[:, 2:3] - myl * m0
                s_xx = mom[:, 3:4] - mxl * (mom[:, 1:2] + s_x)  # Σ w·dx²
                s_xy = mom[:, 4:5] - mxl * mom[:, 2:3] - myl * s_x
                s_yy = mom[:, 5:6] - myl * (mom[:, 2:3] + s_y)
                d_ca = -0.5 * s_xx
                d_cb = -s_xy
                d_cc = -0.5 * s_yy
                d_mx = ca * s_x + cb * s_y
                d_my = cc * s_y + cb * s_x
            else:
                m0 = jnp.sum(dl_dpow, axis=1, keepdims=True)
                d_ca = jnp.sum(dl_dpow * (-0.5 * dx * dx), axis=1,
                               keepdims=True)
                d_cb = jnp.sum(dl_dpow * (-dx * dy), axis=1, keepdims=True)
                d_cc = jnp.sum(dl_dpow * (-0.5 * dy * dy), axis=1,
                               keepdims=True)
                d_mx = jnp.sum(dl_dpow * (ca * dx + cb * dy), axis=1,
                               keepdims=True)
                d_my = jnp.sum(dl_dpow * (cc * dy + cb * dx), axis=1,
                               keepdims=True)
            d_op = jnp.where(op >= alpha_min, m0 / jnp.maximum(op, 1e-6),
                             0.0)
            d_ref[pl.ds(lc * G, G), :] = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col,
                 jnp.zeros((G, 6), jnp.float32)], axis=1)
            st_t[:] = tcur * jnp.exp(jnp.sum(lg2, axis=0, keepdims=True))
            st_cumu[:] = cum_u + jnp.sum(u, axis=0, keepdims=True)

        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=False)


def composite_bwd_stream(entries, tile_start, tile_count, tile_base, accum,
                         t_final, nc, g_accum, g_t, *, n_tiles_x, n_tiles_y,
                         tile_h, tile_w, chunk, strip_chunks, alpha_min,
                         alpha_max, moments, interpret):
    """d_entries (M,16). Every row is written (dead chunks write zeros) —
    the strip form has no unwritten-tail contract; the gather-VJP's
    masked_presort_prefix tail zeroing stays valid either way."""
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries.shape[0]
    n_chunks = M // G
    S, C = _strip_grid(n_chunks, strip_chunks)

    max_nc = jnp.max(nc[:, 0, :], axis=1).astype(jnp.int32)      # (T,)
    ct, rank0, cnt = chunk_tables(tile_start, tile_count, n_tiles=T,
                                  chunk=G, n_chunks=n_chunks,
                                  count_clamp=max_nc)

    merged = jnp.concatenate(
        [g_accum, g_t[:, None, :] if g_t.ndim == 2 else g_t,
         accum, t_final, nc.astype(jnp.float32)], axis=1)        # (T,11,P)
    merged = jnp.concatenate(
        [merged, jnp.zeros((1, 11, P), jnp.float32)
         .at[0, 9].set(1.0)], axis=0)                            # sentinel
    tile_in = merged[ct]                                         # (n_chunks,11,P)

    kernel = functools.partial(
        _bwd_strip_kernel, C=C, G=G, P=P, n_tiles_x=n_tiles_x,
        tile_h=tile_h, tile_w=tile_w, alpha_min=alpha_min,
        alpha_max=alpha_max, moments=moments)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((C * G, 16), lambda s, ct, r0, cn, tb: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 11, P), lambda s, ct, r0, cn, tb: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C * G, 16), lambda s, ct, r0, cn, tb:
                               (s, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ct, rank0, cnt, tile_base, entries, tile_in)


# ---------------------------------------------------------------- public op


def _fwd_kwargs(static):
    kw = dict(static)
    kw.pop("moments")                  # backward-only knob
    return kw


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _composite_s(entries, tile_start, tile_count, tile_base, static):
    return composite_fwd_stream(entries, tile_start, tile_count, tile_base,
                                **_fwd_kwargs(static))


def _composite_s_fwd(entries, tile_start, tile_count, tile_base, static):
    out = composite_fwd_stream(entries, tile_start, tile_count, tile_base,
                               **_fwd_kwargs(static))
    accum, t_final, nc = out
    return out, (entries, tile_start, tile_count, tile_base, accum,
                 t_final, nc)


def _composite_s_bwd(static, res, cot):
    entries, tile_start, tile_count, tile_base, accum, t_final, nc = res
    g_accum, g_t, _ = cot
    kw = dict(static)
    kw.pop("t_eps")
    d_entries = composite_bwd_stream(
        entries, tile_start, tile_count, tile_base, accum, t_final, nc,
        g_accum, g_t, **kw)
    return d_entries, None, None, None


_composite_s.defvjp(_composite_s_fwd, _composite_s_bwd)


class _HashableDict(dict):
    """Static kwargs carrier for custom_vjp nondiff argnums."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))


def composite_tiles_stream(entries, tile_start, tile_count, *, n_tiles_x,
                           n_tiles_y, tile_h, tile_w, chunk=64,
                           strip_chunks=256, alpha_min=1.0 / 255.0,
                           alpha_max=0.99, t_eps=1e-4, moments="vpu",
                           interpret=False, tile_id_base=0) -> CompositeOut:
    """Same contract as composite_tiles_pallas; entries row count must be
    a whole number of strips (pad_chunks_to_strips — rasterize.py sizes
    pad_cap so this holds without a runtime concat)."""
    T = n_tiles_x * n_tiles_y
    static = _HashableDict(
        n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=tile_h,
        tile_w=tile_w, chunk=chunk, strip_chunks=strip_chunks,
        alpha_min=alpha_min, alpha_max=alpha_max, t_eps=t_eps,
        moments=moments, interpret=interpret)
    base = jnp.reshape(jnp.asarray(tile_id_base, jnp.int32), (1,))
    accum, t_final, nc = _composite_s(entries, tile_start, tile_count,
                                      base, static)
    P = tile_h * tile_w
    return CompositeOut(accum=accum,
                        t_final=t_final.reshape(T, P),
                        n_contrib=nc.reshape(T, P))
