"""Pallas prefix-sum (cumsum) kernels — O(n) HBM traffic scans.

XLA lowers ``jnp.cumsum`` on TPU to a log-depth chain of shifted adds:
log2(n) full passes over the array in HBM (measured ~9 ms for a (2M,16)
f32 axis-0 cumsum and ~2.5-5 ms per (M,) i32 cumsum — 20-30x above the
bandwidth floor). The binning pipeline runs four M-sized cumsums per frame
and the gradient reduction one more, so the log factor is real money.

These kernels stream the array once through a sequential grid with a
VMEM-resident carry: per block, the in-register prefix (a log-depth chain
over VMEM data — effectively free next to HBM) plus the running carry.
Integer scans are exact (wraparound-safe int32 adds — the binning contract);
float scans accumulate in the same left-to-right order as a sequential sum.

Two entry points:
- ``cumsum_rows(x)``  — axis-0 inclusive cumsum of an (M, W) array.
- ``cumsum_flat(x)``  — inclusive cumsum of a flat (M,) array, internally
  tiled (M/128, 128) with a row-major in-block scan.

STATUS — experimental, NOT wired into the render path. Measured on the
real chip at the representative sizes (chained-loop timing):
  cumsum_flat (2M,) i32:    pallas 2.92 ms vs XLA jnp.cumsum 2.60 ms
  cumsum_rows (2M,16) f32:  pallas 15.30 ms vs XLA 9.44 ms
The hypothesis (XLA cumsum pays log-depth HBM passes) was wrong at these
sizes: XLA's lowering is close to bandwidth-bound already, while this
kernel loses on (a) per-block roll/mask VREG chains and (b) the (·,16)
width wasting 7/8 of each (8,128) vector register. Correctness is fully
validated (exact i32 incl. wraparound; f32 at 2.5e-3 abs vs float64 on
3.1e3-magnitude running sums — same error class as XLA's 1.6e-3).
A retry should fold 8 rows into lanes ((M/8,128) layout) before the scan.
Correctness tests live in test_pallas_scan.py next to this file.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prefix(x, axis):
    """Inclusive prefix sum along ``axis`` via log-step shifted adds.
    Mosaic lowers neither cumsum nor narrow shifted concats, but circular
    ``pltpu.roll`` + iota mask vectorizes on both sublane and lane axes;
    the data is VMEM-resident so the log passes are cheap."""
    n = x.shape[axis]
    s = 1
    while s < n:
        rolled = pltpu.roll(x, s, axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        x = x + jnp.where(idx >= s, rolled, jnp.zeros_like(x))
        s *= 2
    return x


def _rows_kernel(x_ref, o_ref, carry, *, BLK, W, reset_every):
    i = pl.program_id(0)

    @pl.when(i % reset_every == 0)
    def _():
        carry[:] = jnp.zeros((1, W), x_ref.dtype)

    x = x_ref[:]                                   # (BLK, W)
    cs = _prefix(x, axis=0) + carry[:]
    o_ref[:] = cs
    carry[:] = cs[BLK - 1:BLK, :]


def cumsum_rows(x: jnp.ndarray, *, block: int = 2048, reset_every: int = 0,
                interpret: bool = False) -> jnp.ndarray:
    """Inclusive axis-0 cumsum of (M, W); M is padded internally to a block
    multiple. Exact for integer dtypes; strictly left-to-right for floats.

    ``reset_every`` > 0 restarts the scan every reset_every·block rows —
    i.e. independent per-segment cumsums (the gradient reduction uses this
    for its blocked-precision prefix sums)."""
    M, W = x.shape
    Mp = -(-M // block) * block
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    grid = Mp // block
    out = pl.pallas_call(
        functools.partial(_rows_kernel, BLK=block, W=W,
                          reset_every=reset_every if reset_every > 0
                          else grid + 1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, W), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x)
    return out[:M]


def _flat_kernel(x_ref, o_ref, carry, *, BLK, C):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros((1, 1), x_ref.dtype)

    x = x_ref[:]                                   # (BLK, C) row-major flat
    lane_cs = _prefix(x, axis=1)                   # within-row prefix
    row_tot = lane_cs[:, C - 1:C]                  # (BLK, 1)
    row_pre = _prefix(row_tot, axis=0) - row_tot
    o_ref[:] = lane_cs + row_pre + carry[:]
    carry[:] = carry[:] + row_pre[BLK - 1:BLK, :] + row_tot[BLK - 1:BLK, :]


def cumsum_flat(x: jnp.ndarray, *, block_rows: int = 512,
                interpret: bool = False) -> jnp.ndarray:
    """Inclusive cumsum of a flat (M,) array (row-major (rows,128) tiling)."""
    (M,) = x.shape
    C = 128
    rows_total = -(-M // C)
    Rp = -(-rows_total // block_rows) * block_rows
    Mp = Rp * C
    if Mp != M:
        x = jnp.pad(x, (0, Mp - M))
    x2 = x.reshape(Rp, C)
    grid = Rp // block_rows
    out = pl.pallas_call(
        functools.partial(_flat_kernel, BLK=block_rows, C=C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 1), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2)
    return out.reshape(Mp)[:M]


def use_fast_scan() -> bool:
    """Route large scans through the Pallas kernels only on real TPU."""
    return jax.default_backend() == "tpu"


def fast_cumsum(x: jnp.ndarray, axis: int = 0, *,
                min_size: int = 200_000) -> jnp.ndarray:
    """Drop-in jnp.cumsum for the hot paths: Pallas on TPU for large
    arrays, XLA elsewhere (CPU tests, small arrays, sharded interpret)."""
    if not use_fast_scan() or x.size < min_size:
        return jnp.cumsum(x, axis=axis)
    if x.ndim == 1 and axis == 0:
        return cumsum_flat(x)
    if x.ndim == 2 and axis == 0:
        return cumsum_rows(x)
    return jnp.cumsum(x, axis=axis)
