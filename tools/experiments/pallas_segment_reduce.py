"""Pallas segment-sum: per-gaussian reduction of per-entry gradients with a
VMEM-resident accumulator.

The XLA forms of ``d_packed[g] = Σ_{gidx[e]=g} d[e]`` — duplicate-index
scatter-add, or inverse-permutation gather + cumsum — both sit at the HBM
random-row-access latency floor (~16-23 ns/row measured). This kernel
STREAMS the entries sequentially and does the random accesses inside VMEM:
the (rows, 16) accumulator lives entirely on-chip; gaussian sets larger
than the VMEM budget split into groups, one streaming pass each.

STATUS — experimental, NOT wired into the render path: measured on-chip at
3.28M entries / 200k gaussians it runs 120 ms vs 54 ms for XLA scatter-add;
Mosaic's per-iteration cost for the serial dynamic-index RMW loop (~35 ns)
exceeds the HBM latency it avoids. Correctness verified against scatter-add
(max err 6e-6). A vectorized in-VMEM accumulation scheme (e.g. conflict-free
banking or full loop unrolling) is the round-2 follow-up.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gidx_ref, d_ref, out_ref, *, G: int, rows: int, width: int,
            n_groups: int):
    grp = pl.program_id(0)
    i = pl.program_id(1)
    base = grp * rows

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros((rows, width), jnp.float32)

    def body(j, _):
        g = gidx_ref[0, j] - base
        @pl.when(jnp.logical_and(g >= 0, g < rows))
        def _():
            out_ref[pl.ds(g, 1), :] += d_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, G, body, 0)


def segment_sum_pallas(d: jnp.ndarray,        # (M, width) f32
                       gidx: jnp.ndarray,     # (M,) int32 in [0, n_rows)
                       n_rows: int, *,
                       chunk: int = 512,
                       vmem_budget: int = 10 * 2 ** 20,
                       interpret: bool = False) -> jnp.ndarray:
    """Σ d rows per gidx → (n_rows, width). Out-of-range gidx are dropped."""
    M, width = d.shape
    Mp = -(-M // chunk) * chunk
    if Mp != M:
        d = jnp.pad(d, ((0, Mp - M), (0, 0)))
        gidx = jnp.pad(gidx, (0, Mp - M), constant_values=n_rows)
    n_chunks = Mp // chunk

    rows_per_group = max(vmem_budget // (width * 4), 1)
    n_groups = -(-n_rows // rows_per_group)
    rows = -(-n_rows // n_groups)
    rows = -(-rows // 8) * 8                   # sublane-align the block

    kernel = functools.partial(_kernel, G=chunk, rows=rows, width=width,
                               n_groups=n_groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_groups, n_chunks),
        in_specs=[
            # SMEM: the kernel reads gidx one scalar at a time with a
            # dynamic index — a VMEM lane access Mosaic cannot lower
            pl.BlockSpec((1, chunk), lambda g, i: (0, i),
                         memory_space=pltpu.SMEM),            # gidx
            pl.BlockSpec((chunk, width), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),            # d rows
        ],
        out_specs=pl.BlockSpec((rows, width), lambda g, i: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * rows, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gidx.reshape(1, Mp), d)
    return out[:n_rows]
