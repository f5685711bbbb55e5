"""Pure-XLA tile compositor — the differentiable correctness oracle.

Implements exactly the CUDA reference's per-pixel front-to-back compositing
semantics (reconstructed in SURVEY.md §2.2): alpha = min(0.99, op·exp(power)),
skip below 1/255, early termination when T·(1−α) < 1e-4 *before* committing
the contribution, per-pixel last-contributor bookkeeping. Used (a) as the
oracle the Pallas kernels are tested against — the same trick the reference
plays with its ``convert_SHs_python`` paths — and (b) as a CPU fallback.

Differentiable end-to-end via autodiff (the early-termination masks act as
stop-gradients exactly like the CUDA backward's contributor cutoffs).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    accum: jnp.ndarray      # (T, 4, P) premultiplied color+invdepth (no bg)
    t_final: jnp.ndarray    # (T, P) final transmittance
    n_contrib: jnp.ndarray  # (T, P) int32 1 + index of last contributor


def _chunk_update(chunk_data, valid, carry, px, py, base_rank, t_init, *,
                  alpha_min, alpha_max, t_eps):
    """Shared one-chunk compositing math. Shapes: chunk_data (T,G,16),
    valid (T,G) bool, px/py (T,1,P), carry = (accum, T_in, done, nc).

    ``t_init`` (T,1,P) is the transmittance ARRIVING from everything nearer
    than this entry list (depth-slab sharding's exact-cut carry): it scales
    the early-termination test only — accumulation stays in unit-T space so
    the sharded merge keeps its differentiable form."""
    accum, t_in, done_in, nc_in = carry
    G = chunk_data.shape[1]

    mx = chunk_data[..., 0][..., None]     # (T,G,1)
    my = chunk_data[..., 1][..., None]
    ca = chunk_data[..., 2][..., None]
    cb = chunk_data[..., 3][..., None]
    cc = chunk_data[..., 4][..., None]
    op = chunk_data[..., 5][..., None]
    col = chunk_data[..., 6:10]            # (T,G,4) rgb + invdepth

    dx = px - mx                           # (T,G,P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha_raw, alpha_max)
    a1 = jnp.where(valid[..., None] & (alpha >= alpha_min) & (power <= 0.0),
                   alpha, 0.0)

    one_m = 1.0 - a1
    cum = jnp.cumprod(one_m, axis=1)
    t_excl = t_in * jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)   # (T,G,P)
    test_t = t_excl * one_m
    cross = (a1 > 0) & (t_init * test_t < t_eps)
    done_incl = done_in | (jnp.cumsum(cross.astype(jnp.int32), axis=1) > 0)
    contrib = (a1 > 0) & ~done_incl

    a2 = jnp.where(contrib, a1, 0.0)
    one_m2 = 1.0 - a2
    cum2 = jnp.cumprod(one_m2, axis=1)
    t_excl2 = t_in * jnp.concatenate(
        [jnp.ones_like(cum2[:, :1]), cum2[:, :-1]], axis=1)
    wgt = t_excl2 * a2                                       # (T,G,P)

    accum = accum + jnp.einsum("tgp,tgc->tcp", wgt, col,
                               precision=jax.lax.Precision.HIGHEST)
    t_out = t_in * cum2[:, -1:, :]
    done_out = done_in | jnp.any(cross, axis=1, keepdims=True)
    rank = base_rank[:, :, None] + 1                          # (T,G,1)
    nc_out = jnp.maximum(nc_in, jnp.max(
        jnp.where(contrib, rank, 0), axis=1)).astype(jnp.int32)
    return (accum, t_out, done_out, nc_out)


@functools.partial(jax.jit, static_argnames=(
    "n_tiles_x", "n_tiles_y", "tile_h", "tile_w", "chunk",
    "alpha_min", "alpha_max", "t_eps"))
def composite_tiles_xla(entries: jnp.ndarray,     # (M, 16) packed
                        tile_start: jnp.ndarray,  # (T,)
                        tile_count: jnp.ndarray,  # (T,)
                        *, n_tiles_x: int, n_tiles_y: int,
                        tile_h: int, tile_w: int, chunk: int = 32,
                        alpha_min: float = 1.0 / 255.0,
                        alpha_max: float = 0.99, t_eps: float = 1e-4,
                        tile_id_base=0, t_init=None) -> CompositeOut:
    """lax.scan over GLOBAL entry chunks; each step updates only its own
    tile's carry row (the same chunk→tile tables the Pallas kernel
    prefetches — ops/binning.chunk_tables). Requires the align=chunk
    layout from bin_gaussians, like the kernel: per-tile ranges start on
    chunk boundaries so no chunk straddles tiles.

    O(M·P) — the previous all-tiles-walk-all-chunks form was O(T·M·P) and
    dominated every CPU path (e2e tests, CPU full_eval) by 20x+.
    """
    T = tile_start.shape[0]
    G = chunk
    P = tile_h * tile_w
    M = entries.shape[0]
    assert M % G == 0, (
        f"composite_tiles_xla requires the align=chunk entry layout "
        f"(M={M} not a multiple of chunk={G})")
    n_chunks = M // G

    from gsplat_tpu.ops.binning import chunk_tables
    ct, rank0, cnt = chunk_tables(tile_start, tile_count, n_tiles=T,
                                  chunk=G, n_chunks=n_chunks)

    # carries hold one extra sentinel row (T) that tail chunks harmlessly
    # visit (their count is 0, so the update is the identity)
    init = (jnp.zeros((T + 1, 4, P), jnp.float32),
            jnp.ones((T + 1, 1, P), jnp.float32),
            jnp.zeros((T + 1, 1, P), bool),
            jnp.zeros((T + 1, P), jnp.int32))
    if t_init is None:
        t_init_b = jnp.ones((T, 1, P), jnp.float32)
    else:
        t_init_b = jax.lax.stop_gradient(t_init).reshape(T, 1, P)
    t_init_b = jnp.concatenate(
        [t_init_b, jnp.ones((1, 1, P), jnp.float32)], axis=0)

    g = jnp.arange(G, dtype=jnp.int32)
    p = jnp.arange(P, dtype=jnp.int32)

    @jax.checkpoint
    def step(carry, x):
        data, t, r0, cn = x                   # (G,16), scalars
        accum, t_run, done, nc = carry
        gid = tile_id_base + t
        ox = ((gid % n_tiles_x) * tile_w).astype(jnp.float32)
        oy = ((gid // n_tiles_x) * tile_h).astype(jnp.float32)
        px = (ox + (p % tile_w))[None, None, :]          # (1,1,P)
        py = (oy + (p // tile_w))[None, None, :]
        valid = ((r0 + g) < cn)[None, :]                 # (1,G)
        base_rank = (r0 + g)[None, :]                    # (1,G)
        cur = (accum[t][None], t_run[t][None], done[t][None], nc[t][None])
        new = _chunk_update(data[None], valid, cur, px, py, base_rank,
                            t_init_b[t][None],
                            alpha_min=alpha_min, alpha_max=alpha_max,
                            t_eps=t_eps)
        carry = (accum.at[t].set(new[0][0]), t_run.at[t].set(new[1][0]),
                 done.at[t].set(new[2][0]), nc.at[t].set(new[3][0]))
        return carry, None

    (accum, t_out, _, nc), _ = jax.lax.scan(
        step, init, (entries.reshape(n_chunks, G, 16), ct, rank0, cnt))
    return CompositeOut(accum=accum[:T], t_final=t_out[:T, 0, :],
                        n_contrib=nc[:T])
