"""Blocked (M,16) prefix-sum Pallas kernel for the gather-VJP reduction.

The renderer's entry-gradient reduction (ops/rasterize._gather_entries_bwd)
needs inclusive prefix sums over the presort-ordered (M,16) gradient rows,
reset every L=4096 rows (two-level blocking bounds the f32 running-sum
error — round-1 advisory). XLA's cumsum lowers this to a multi-pass
log-step chain costing ~9.4 ms at M=2M; a width-16 Pallas scan also loses
(wastes 7/8 of every 128-lane register — measured round 2,
tools/experiments/pallas_scan.py).

This kernel wins by changing LAYOUT, not algorithm: (M,16) row-major is
bit-identical to (M/8,128) — a free reshape — so eight consecutive rows
fold into one full 128-lane vector row. Per L-block (F=512 folded rows),
three MXU matmuls produce the inclusive prefix:

    cs = tri_strict(F) @ (X @ B1)  +  X @ B2
         └ prefix of whole folds ┘    └ intra-fold prefix ┘

where B1[j,i] = [j≡i mod 16] sums each fold's 8 sub-rows per lane, and
B2[j,i] = [j≡i mod 16][j//16 ≤ i//16] forms the inclusive sub-row prefix
— both 0/1 lane-mixing matrices applied from the right. One grid step per
L-block; all operands full-width; ~0.1 GFLOP/Mrow total.

Returns (intra, block_tot): the per-block inclusive prefixes in (M,16)
layout and the (B,16) per-block totals — exactly the quantities the
XLA path computed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_mix_mats(dtype=jnp.float32):
    """B1 (fold sum per lane) and B2 (inclusive sub-row prefix per lane),
    both (128,128), built from iota inside the kernel."""
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    same_lane = (j % 16) == (i % 16)
    b1 = same_lane.astype(dtype)
    b2 = (same_lane & ((j // 16) <= (i // 16))).astype(dtype)
    return b1, b2


def _scan_kernel(x_ref, out_ref, *, F: int):
    x = x_ref[:]                                           # (F,128)
    b1, b2 = _lane_mix_mats()
    r = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
    tri = (c < r).astype(jnp.float32)
    # precision=HIGHEST: the default lowers the f32 GRADIENT operand to
    # one-pass bf16 on the MXU (~2^-9 relative truncation per element) —
    # exactly the repo's documented bf16 trap, and far worse than the
    # blocked-cumsum error this kernel exists to bound. The 0/1 mixing
    # matrices are bf16-exact; the data is not.
    hi = jax.lax.Precision.HIGHEST
    fold_tot = jnp.dot(x, b1, preferred_element_type=jnp.float32,
                       precision=hi)
    cs = jnp.dot(tri, fold_tot, preferred_element_type=jnp.float32,
                 precision=hi) \
        + jnp.dot(x, b2, preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = cs


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def blocked_cumsum_16(x: jnp.ndarray, *, L: int = 4096,
                      interpret: bool = False):
    """x: (M,16) f32, M % L == 0, L % 8 == 0. Returns
    (intra (M,16): inclusive prefix sums resetting every L rows,
     block_tot (M//L,16): per-block totals)."""
    M, W = x.shape
    assert W == 16 and M % L == 0 and L % 8 == 0, (x.shape, L)
    F = L // 8
    n_blocks = M // L
    xf = x.reshape(M // 8, 128)                            # free reshape

    out = pl.pallas_call(
        functools.partial(_scan_kernel, F=F),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((F, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf)
    # Per-block totals = each block's last folded row, lanes 112..127
    # (sub-row 7). Sliced outside the kernel: a (1,128)-block second
    # output would violate the TPU tiling contract (second-minor block
    # dim must be 8-divisible or equal the array dim — real-lowering
    # failure caught on-chip in round 4; interpret mode doesn't check).
    tot = out[F - 1::F, 112:128]                           # (n_blocks,16)
    return out.reshape(M, 16), tot
