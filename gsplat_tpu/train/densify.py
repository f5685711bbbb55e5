"""Adaptive density control (clone / split / prune / opacity reset) under jit.

TPU-native re-design of the reference's densification
(/root/reference/scene/gaussian_model.py:349-473 + train.py:164-174). The
reference freely resizes tensors and performs optimizer-state surgery
(cat/prune on Adam moments, gaussian_model.py:316-386) — dynamic shapes that
would retrace XLA every 100 iterations. Here all arrays stay at a fixed
capacity with an ``active`` mask:

- clone/split = masked scatter of new rows into free (inactive) slots with
  zeroed Adam moments (same end state as the reference's torch.cat with
  zero-moment extensions);
- prune = clearing ``active`` (the reference's boolean-index compaction only
  changes *where* rows live, not training semantics — slot-stable storage
  preserves surviving rows' moments exactly like the reference does);
- running out of free slots sets an overflow count; the host doubles
  capacity (models.pad_to_capacity) and re-jits — a rare O(log N) event.

Faithful quirk (kept deliberately): densification_postfix zeroes
max_radii2D (reference gaussian_model.py:407) before the prune step reads it
(:462), so the max_screen_size prune never fires in the reference snapshot;
we replicate by zeroing the stats before pruning.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core.transforms import inverse_sigmoid, quat_to_rotmat
from gsplat_tpu.models.gaussian_model import GaussianParams, TRAINABLE_FIELDS
from gsplat_tpu.train.optim import AdamState


@jax.tree_util.register_dataclass
@dataclass
class DensifyStats:
    """Per-slot accumulators (reference gaussian_model.py:60-62,471-473)."""
    xyz_gradient_accum: jnp.ndarray  # (CAP,)
    denom: jnp.ndarray               # (CAP,)
    max_radii2d: jnp.ndarray         # (CAP,)


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(xyz_gradient_accum=z, denom=z, max_radii2d=z)


def add_densification_stats(stats: DensifyStats, radii: jnp.ndarray,
                            mean2d_grad: jnp.ndarray) -> DensifyStats:
    """Per-step accumulation (reference train.py:166-167 +
    gaussian_model.py:471-473). mean2d_grad is the NDC-unit tap gradient;
    radii > 0 is the visibility filter."""
    vis = radii > 0
    gnorm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(stats.max_radii2d, radii),
                              stats.max_radii2d))


def _scatter_rows(leaf: jnp.ndarray, dest: jnp.ndarray, rows: jnp.ndarray):
    """Write rows at dest indices; dest == capacity drops the write."""
    return leaf.at[dest].set(rows, mode="drop")


def densify_and_prune(g: GaussianParams, adam: AdamState, stats: DensifyStats,
                      key: jax.Array, *, max_grad: float, min_opacity: float,
                      extent: float, percent_dense: float,
                      use_screen_size_prune: bool,
                      max_screen_size: float = 20.0,
                      ) -> Tuple[GaussianParams, AdamState, DensifyStats,
                                 jnp.ndarray]:
    """One densify+prune event (reference densify_and_prune,
    gaussian_model.py:452-469). Returns (params, adam, stats, overflow)."""
    cap = g.capacity
    active = g.active
    grads = jnp.where(stats.denom > 0,
                      stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1.0),
                      0.0)
    scaling_act = g.get_scaling()
    max_scale = jnp.max(scaling_act, axis=1)

    hit = active & (grads >= max_grad)
    mask_c = hit & (max_scale <= percent_dense * extent)   # clone (:435-439)
    mask_s = hit & (max_scale > percent_dense * extent)    # split (:409-416)

    # --- slot allocation: clones first, then split pairs (reference append
    # order: clone rows, then 2N split rows) ---
    free = ~active
    n_free = jnp.sum(free.astype(jnp.int32))
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1        # (CAP,)
    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    # free_slot[r] = index of the r-th free slot
    free_slot = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)].set(slot_ids, mode="drop")

    n_clone = jnp.sum(mask_c.astype(jnp.int32))
    clone_rank = jnp.cumsum(mask_c.astype(jnp.int32)) - 1
    split_rank = jnp.cumsum(mask_s.astype(jnp.int32)) - 1
    n_split = jnp.sum(mask_s.astype(jnp.int32))

    def take_free(r, m):
        r = jnp.where(m & (r < n_free), r, cap - 1)
        out = jnp.where(m & (r < n_free), free_slot[r], cap)
        return out.astype(jnp.int32)

    dest_c = take_free(clone_rank, mask_c)
    dest_s1 = take_free(n_clone + 2 * split_rank, mask_s)
    dest_s2 = take_free(n_clone + 2 * split_rank + 1, mask_s)
    wanted = n_clone + 2 * n_split
    overflow = jnp.maximum(wanted - n_free, 0)
    # a split is atomic: if the free list ran out for EITHER child, route
    # both to the sentinel so neither row is written/activated — otherwise
    # the boundary candidate would place child 1 (reduced scale) while the
    # original stays active, a half-split hybrid the reference never
    # produces (the host grows capacity and the next event redoes it)
    placed_s = mask_s & (dest_s1 < cap) & (dest_s2 < cap)
    dest_s1 = jnp.where(placed_s, dest_s1, cap)
    dest_s2 = jnp.where(placed_s, dest_s2, cap)

    # --- split samples: x_new = R·ε + x, ε ~ N(0, scale) (ref :418-422) ---
    R = quat_to_rotmat(g.get_rotation())                      # (CAP,3,3)
    eps1 = jax.random.normal(key, (cap, 3)) * scaling_act
    eps2 = jax.random.normal(jax.random.fold_in(key, 1), (cap, 3)) * scaling_act
    xyz_s1 = g.xyz + jnp.einsum("nij,nj->ni", R, eps1)
    xyz_s2 = g.xyz + jnp.einsum("nij,nj->ni", R, eps2)
    scaling_new = jnp.log(scaling_act / (0.8 * 2))            # ref :423, N=2

    new_g = dict(
        xyz=g.xyz, f_dc=g.f_dc, f_rest=g.f_rest, scaling=g.scaling,
        rotation=g.rotation, opacity=g.opacity)
    mu, nu = dict(adam.mu), dict(adam.nu)

    for name in TRAINABLE_FIELDS:
        leaf = new_g[name]
        src = leaf
        if name == "xyz":
            rows_s1, rows_s2 = xyz_s1, xyz_s2
        elif name == "scaling":
            rows_s1 = rows_s2 = scaling_new
        else:
            rows_s1 = rows_s2 = src
        leaf = _scatter_rows(leaf, dest_c, src)
        leaf = _scatter_rows(leaf, dest_s1, rows_s1)
        leaf = _scatter_rows(leaf, dest_s2, rows_s2)
        new_g[name] = leaf
        zero = jnp.zeros_like(mu[name])
        for d in (dest_c, dest_s1, dest_s2):
            mu[name] = _scatter_rows(mu[name], d, zero)
            nu[name] = _scatter_rows(nu[name], d, zero)

    # activate new rows, deactivate split originals (ref :432-433)
    active = active.at[dest_c].set(True, mode="drop")
    active = active.at[dest_s1].set(True, mode="drop")
    active = active.at[dest_s2].set(True, mode="drop")
    active = jnp.where(placed_s, False, active)

    # --- stats zeroed (postfix, ref :405-407) then prune (ref :460-465) ---
    stats = init_stats(cap)
    opacity_act = jax.nn.sigmoid(new_g["opacity"])
    prune = opacity_act < min_opacity
    if use_screen_size_prune:
        big_vs = stats.max_radii2d > max_screen_size  # zeros → never fires,
        # replicating the reference quirk (see module docstring)
        big_ws = jnp.max(jnp.exp(new_g["scaling"]), axis=1) > 0.1 * extent
        prune = prune | big_vs | big_ws
    active = active & ~prune

    g2 = dataclasses.replace(g, active=active, **new_g)
    adam2 = AdamState(mu=mu, nu=nu, count=adam.count)
    return g2, adam2, stats, overflow


def reset_opacity(g: GaussianParams, adam: AdamState):
    """Clamp opacity to ≤0.01 and zero its Adam moments (reference
    gaussian_model.py:258-261 + replace_tensor_to_optimizer :316-329 —
    the moment reset is required behavior)."""
    new_op = inverse_sigmoid(jnp.minimum(g.get_opacity(), 0.01))
    g2 = dataclasses.replace(g, opacity=jnp.where(g.active, new_op, g.opacity))
    mu = dict(adam.mu)
    nu = dict(adam.nu)
    mu["opacity"] = jnp.zeros_like(mu["opacity"])
    nu["opacity"] = jnp.zeros_like(nu["opacity"])
    return g2, AdamState(mu=mu, nu=nu, count=adam.count)
