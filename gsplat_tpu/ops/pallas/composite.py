"""Pallas TPU tile-compositing kernels (forward + hand-derived backward).

TPU-native re-design of the reference CUDA *render* kernel pair
(diff-gaussian-rasterization forward.cu/backward.cu, reconstructed in
SURVEY.md §2.2). Layout decisions, driven by TPU hardware:

- One grid step = one pixel tile (tile_h×tile_w, default 16×128). Per-pixel
  state lives in VMEM as (P, ·) arrays with **pixels on sublanes** and
  **gaussians on lanes**: the hot (P, G) working set with G = 128 makes
  every elementwise pass a dense VPU op and every scan a full-width MXU op.
- Gaussians stream through VMEM in depth-ordered chunks of G, DMA'd from the
  globally sorted entry list stored **transposed** (16, M) in HBM, so each
  chunk fetch is a (16, 128)-shaped, 128-lane-aligned copy. Tile entry
  ranges are pre-aligned to G (ops/binning.py align=chunk): chunk DMAs never
  straddle tiles and gradient writes are collision-free by construction.
- Front-to-back transmittance inside a chunk is computed in log space with a
  (P,G)×(G,G) upper-triangular matmul — the vector-parallel equivalent of
  CUDA's sequential per-thread ``T *= (1-alpha)`` loop.
- Per-pixel early termination (T·(1−α) < 1e-4, checked *before* committing a
  contribution) and the 1/255 alpha floor replicate the CUDA semantics via
  masks; the per-pixel last-contributor index is saved for the backward.
- Loop-carried tile state (accumulated color, transmittance, done mask,
  last-contributor) lives in VMEM scratch; the while-loop carry is scalars
  only (Mosaic cannot yield vectors from scf loops).
- Backward re-walks the chunks front-to-back (recompute strategy, like the
  CUDA backward) using the saved final transmittance + last-contributor
  index; per-entry gradients land in a disjoint (16, M) buffer and the
  XLA-level gather transpose accumulates them onto the N Gaussians.

Entry row layout (matches ops/rasterize.pack_entries, transposed here):
  row 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6..8 rgb,
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


def _tri_upper(G: int, strict: bool, dtype=jnp.float32):
    """U[k, j] = 1 where k < j (strict) or k <= j: (P,G) @ U = prefix sums
    along the lane (gaussian) axis."""
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return ((r < c) if strict else (r <= c)).astype(dtype)


def _pixel_coords(t, n_tiles_x: int, tile_h: int, tile_w: int):
    """(P,1) pixel centers for tile t (row-major pixels within the tile)."""
    P = tile_h * tile_w
    ox = (t % n_tiles_x) * tile_w
    oy = (t // n_tiles_x) * tile_h
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (ox + p % tile_w).astype(jnp.float32)
    py = (oy + p // tile_w).astype(jnp.float32)
    return px, py


def _alpha_terms(data, px, py):
    """data (16,G) chunk; px/py (P,1) → dx, dy, power, alpha_raw (P,G)."""
    mx, my = data[0:1, :], data[1:2, :]
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[5:6, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # exp clamped at 0: power>0 entries are masked out everywhere, and an
    # unclamped exp would overflow to inf and poison masked lanes via 0·inf.
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    return dx, dy, power, alpha_raw


# ---------------------------------------------------------------- forward

def _fwd_kernel(start_ref, count_ref, entries_ref,
                accum_ref, tfinal_ref, nc_ref,
                chunk_vmem, st_t, st_done, dma_sem, *,
                G: int, P: int, n_tiles_x: int, tile_h: int, tile_w: int,
                alpha_min: float, alpha_max: float, t_eps: float):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    n_chunks = pl.cdiv(count, G)
    px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
    u_strict = _tri_upper(G, strict=True)
    u_incl = _tri_upper(G, strict=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    # Tile state lives in VMEM (output blocks + scratch); the loop carries
    # only scalars.
    accum_ref[0] = jnp.zeros((P, 4), jnp.float32)
    nc_ref[0] = jnp.zeros((P, 1), jnp.int32)
    st_t[:] = jnp.ones((P, 1), jnp.float32)
    st_done[:] = jnp.zeros((P, 1), jnp.float32)

    def body(state):
        i, _ = state
        off = pl.multiple_of(start + i * G, G)
        cp = pltpu.make_async_copy(
            entries_ref.at[:, pl.ds(off, G)], chunk_vmem, dma_sem)
        cp.start()
        cp.wait()
        data = chunk_vmem[:]                                  # (16,G)
        tcur = st_t[:]                                        # (P,1)
        done = st_done[:] > 0.0                               # (P,1)
        _, _, power, alpha_raw = _alpha_terms(data, px, py)
        alpha = jnp.minimum(alpha_raw, alpha_max)
        valid = (i * G + lane) < count                        # (1,G)
        a1 = jnp.where(valid & (alpha >= alpha_min) & (power <= 0.0),
                       alpha, 0.0)                            # (P,G)
        lg = jnp.log1p(-a1)
        t_excl = tcur * jnp.exp(
            jnp.dot(lg, u_strict, preferred_element_type=jnp.float32))
        cross = (a1 > 0.0) & (t_excl * (1.0 - a1) < t_eps)
        crossed = jnp.dot(cross.astype(jnp.float32), u_incl,
                          preferred_element_type=jnp.float32)
        done_incl = done | (crossed > 0.0)
        contrib = (a1 > 0.0) & jnp.logical_not(done_incl)
        a2 = jnp.where(contrib, a1, 0.0)
        lg2 = jnp.log1p(-a2)
        t_excl2 = tcur * jnp.exp(
            jnp.dot(lg2, u_strict, preferred_element_type=jnp.float32))
        w = t_excl2 * a2                                      # (P,G)
        col = data[6:10, :]                                   # (4,G)
        accum_ref[0] += jax.lax.dot_general(
            w, col, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (P,4)
        st_t[:] = tcur * jnp.exp(jnp.sum(lg2, axis=1, keepdims=True))
        new_done = done | jnp.any(cross, axis=1, keepdims=True)
        st_done[:] = new_done.astype(jnp.float32)
        rank1 = i * G + lane + 1                              # (1,G)
        nc_ref[0] = jnp.maximum(
            nc_ref[0], jnp.max(jnp.where(contrib, rank1, 0), axis=1,
                               keepdims=True))
        all_done = jnp.int32(jnp.all(new_done))
        return i + 1, all_done

    def cond(state):
        i, all_done = state
        return (i < n_chunks) & (all_done == 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    tfinal_ref[0] = st_t[:]


def _composite_fwd_call(entries_t, tile_start, tile_count, *, n_tiles_x,
                        n_tiles_y, tile_h, tile_w, chunk, alpha_min,
                        alpha_max, t_eps, interpret):
    """entries_t: (16, M) transposed packed entries, with per-tile ranges
    aligned to `chunk` (binning align=chunk)."""
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk

    kernel = functools.partial(
        _fwd_kernel, G=G, P=P, n_tiles_x=n_tiles_x, tile_h=tile_h,
        tile_w=tile_w, alpha_min=alpha_min, alpha_max=alpha_max, t_eps=t_eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, P, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, G), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    accum, t_final, nc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, P, 4), jnp.float32),
            jax.ShapeDtypeStruct((T, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, P, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tile_start, tile_count, entries_t)
    return accum, t_final, nc


# ---------------------------------------------------------------- backward

def _bwd_kernel(start_ref, count_ref, entries_ref, g_accum_ref, g_t_ref,
                accum_ref, tfinal_ref, nc_ref,
                d_entries_ref,
                chunk_in, chunk_out, st_t, st_cumu, sem_in, sem_out, *,
                G: int, P: int, n_tiles_x: int, tile_h: int, tile_w: int,
                alpha_min: float, alpha_max: float, t_eps: float):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    n_chunks = pl.cdiv(count, G)
    px, py = _pixel_coords(t, n_tiles_x, tile_h, tile_w)
    u_strict = _tri_upper(G, strict=True)
    u_incl = _tri_upper(G, strict=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    g_acc = g_accum_ref[0]                                    # (P,4)
    acc = accum_ref[0]                                        # (P,4)
    g_t = g_t_ref[0]                                          # (P,1)
    t_n = tfinal_ref[0]                                       # (P,1)
    nc = nc_ref[0]                                            # (P,1) int32
    # P0 = g·accum_total; bg blending happens outside via the t_final
    # cotangent, so no bg term appears here.
    p0 = jnp.sum(g_acc * acc, axis=1, keepdims=True)          # (P,1)
    gt_tn = g_t * t_n                                         # (P,1)

    st_t[:] = jnp.ones((P, 1), jnp.float32)
    st_cumu[:] = jnp.zeros((P, 1), jnp.float32)

    def body(i, _):
        off = pl.multiple_of(start + i * G, G)
        cp = pltpu.make_async_copy(
            entries_ref.at[:, pl.ds(off, G)], chunk_in, sem_in)
        cp.start()
        cp.wait()
        data = chunk_in[:]                                    # (16,G)
        tcur = st_t[:]
        cum_u = st_cumu[:]
        dx, dy, power, alpha_raw = _alpha_terms(data, px, py)
        alpha = jnp.minimum(alpha_raw, alpha_max)
        rank = i * G + lane                                   # (1,G)
        keep = ((rank < count) & (alpha >= alpha_min) & (power <= 0.0)
                & (rank < nc))                                # (P,G)
        a2 = jnp.where(keep, alpha, 0.0)
        lg2 = jnp.log1p(-a2)
        t_excl = tcur * jnp.exp(
            jnp.dot(lg2, u_strict, preferred_element_type=jnp.float32))
        w = t_excl * a2                                       # (P,G)
        col = data[6:10, :]                                   # (4,G)
        gc = jax.lax.dot_general(g_acc, col, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (P,G)
        u = w * gc
        cum_incl = cum_u + jnp.dot(u, u_incl,
                                   preferred_element_type=jnp.float32)
        s_term = (p0 - cum_incl) + gt_tn                      # (P,G)
        one_m = jnp.where(keep, 1.0 - a2, 1.0)
        dl_da = jnp.where(keep, gc * t_excl - s_term / one_m, 0.0)
        # dL/dc_j (channel) = Σ_px w·g  → (4,G), already in output layout
        d_col = jax.lax.dot_general(g_acc, w, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        # CUDA-parity: gradient passes through the 0.99 alpha clamp.
        dl_dpow = jnp.where(keep, dl_da * alpha_raw, 0.0)     # (P,G)
        d_op = jnp.sum(jnp.where(keep,
                                 dl_da * jnp.exp(jnp.minimum(power, 0.0)),
                                 0.0),
                       axis=0, keepdims=True)                 # (1,G)
        d_ca = jnp.sum(dl_dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_cb = jnp.sum(dl_dpow * (-dx * dy), axis=0, keepdims=True)
        d_cc = jnp.sum(dl_dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
        ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
        d_mx = jnp.sum(dl_dpow * (ca * dx + cb * dy), axis=0, keepdims=True)
        d_my = jnp.sum(dl_dpow * (cc * dy + cb * dx), axis=0, keepdims=True)
        d_chunk = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col,
             jnp.zeros((6, G), jnp.float32)], axis=0)         # (16,G)
        chunk_out[:] = d_chunk
        cpo = pltpu.make_async_copy(
            chunk_out, d_entries_ref.at[:, pl.ds(off, G)], sem_out)
        cpo.start()
        cpo.wait()
        st_t[:] = tcur * jnp.exp(jnp.sum(lg2, axis=1, keepdims=True))
        st_cumu[:] = cum_u + jnp.sum(u, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _composite_bwd_call(entries_t, tile_start, tile_count, accum, t_final,
                        nc, g_accum, g_t, *, n_tiles_x, n_tiles_y, tile_h,
                        tile_w, chunk, alpha_min, alpha_max, t_eps,
                        interpret):
    T = n_tiles_x * n_tiles_y
    P = tile_h * tile_w
    G = chunk
    M = entries_t.shape[1]

    kernel = functools.partial(
        _bwd_kernel, G=G, P=P, n_tiles_x=n_tiles_x, tile_h=tile_h,
        tile_w=tile_w, alpha_min=alpha_min, alpha_max=alpha_max, t_eps=t_eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),              # entries_t
            pl.BlockSpec((1, P, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # g_accum
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # g_t
            pl.BlockSpec((1, P, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # accum
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # t_final
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # n_contrib
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),        # d_entries_t
        scratch_shapes=[
            pltpu.VMEM((16, G), jnp.float32),
            pltpu.VMEM((16, G), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    d_entries_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tile_start, tile_count, entries_t, g_accum, g_t, accum, t_final, nc)
    return d_entries_t


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _composite(entries_t, tile_start, tile_count, static):
    accum, t_final, nc = _composite_fwd_call(
        entries_t, tile_start, tile_count, **static._asdict())
    return accum, t_final, nc


def _composite_fwd(entries_t, tile_start, tile_count, static):
    accum, t_final, nc = _composite_fwd_call(
        entries_t, tile_start, tile_count, **static._asdict())
    return (accum, t_final, nc), (entries_t, tile_start, tile_count,
                                  accum, t_final, nc)


def _composite_bwd(static, res, cot):
    entries_t, tile_start, tile_count, accum, t_final, nc = res
    g_accum, g_t, _ = cot     # n_contrib is int-valued aux: no cotangent
    d_entries_t = _composite_bwd_call(
        entries_t, tile_start, tile_count, accum, t_final, nc, g_accum, g_t,
        **static._asdict())
    return d_entries_t, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_pallas(entries, tile_start, tile_count, *, n_tiles_x,
                           n_tiles_y, tile_h, tile_w, chunk=128,
                           alpha_min=1.0 / 255.0, alpha_max=0.99,
                           t_eps=1e-4, interpret=False) -> CompositeOut:
    """entries: (M, 16) packed rows with chunk-aligned per-tile ranges
    (ops/binning.bin_gaussians(align=chunk)). Returns the same contract as
    the XLA oracle: accum (T,4,P), t_final (T,P), n_contrib (T,P)."""
    T = n_tiles_x * n_tiles_y
    static = _Static(n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tile_h=tile_h,
                     tile_w=tile_w, chunk=chunk, alpha_min=alpha_min,
                     alpha_max=alpha_max, t_eps=t_eps, interpret=interpret)
    accum, t_final, nc = _composite(entries.T, tile_start, tile_count, static)
    P = tile_h * tile_w
    return CompositeOut(accum=jnp.swapaxes(accum, 1, 2),
                        t_final=t_final.reshape(T, P),
                        n_contrib=nc.reshape(T, P))
