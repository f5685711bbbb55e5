"""Exact k-nearest-neighbor distances as chunked MXU matmuls.

TPU-native replacement for the reference's simple-knn CUDA submodule
(``distCUDA2``, call site /root/reference/scene/gaussian_model.py:21,159):
returns the mean **squared** distance from each point to its 3 nearest
neighbors. The CUDA version is an approximate Morton-sorted KNN; on TPU the
pairwise-distance matrix IS a matmul (‖x−y‖² = ‖x‖²+‖y‖²−2x·y), so an exact
chunked top-k over distance blocks runs at MXU speed and needs no spatial
data structure. O(N²) flops ≈ 6·N² — ~1s for N=300k on one chip, init-only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def mean_sq_dist_to_knn(points: jnp.ndarray, k: int = 3, block: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the k nearest neighbors (self excluded).

    Args:
      points: (N, 3) float32.
      k: neighbors (reference uses 3).
      block: row-chunk size (bounds the (block, N) distance slab in HBM/VMEM).
    Returns:
      (N,) mean of the k smallest squared distances per point.
    """
    n = points.shape[0]
    if n <= k:
        # Degenerate tiny clouds: pad with large distances like "no neighbor".
        d2 = _pairwise_sq(points, points)
        d2 = d2 + jnp.eye(n) * jnp.inf
        kk = max(min(k, n - 1), 1)
        neg_top, _ = jax.lax.top_k(-d2, kk)
        return jnp.mean(-neg_top, axis=-1)

    n_pad = ((n + block - 1) // block) * block
    pts_pad = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    sq_all = jnp.sum(points * points, axis=-1)  # (N,)

    def row_block(i):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block)  # (B,3)
        d2 = (jnp.sum(rows * rows, -1)[:, None] + sq_all[None, :]
              - 2.0 * jnp.dot(rows, points.T,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        # mask self-distance: global row index == col index
        r_idx = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        d2 = jnp.where(r_idx == c_idx, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)  # (B, k)
        return jnp.mean(-neg_top, axis=-1)

    out = jax.lax.map(row_block, jnp.arange(n_pad // block))  # (nb, B)
    return out.reshape(-1)[:n]


def mean_sq_dist_to_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 semantics (reference scene/gaussian_model.py:159)."""
    return mean_sq_dist_to_knn(points, k=3)
