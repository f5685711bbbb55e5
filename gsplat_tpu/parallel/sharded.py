"""Gaussian-sharded storage + tile-row-sharded rendering and training.

BASELINE config 5 (>HBM scenes: 10M+ Gaussians across a pod slice) — the
axis the single-GPU reference fundamentally cannot have (its ceiling is one
card's 24 GB, /root/reference/README.md:88). Design:

- **Storage shards.** Every per-gaussian array — parameters, Adam moments,
  densification stats, the preprocess outputs — lives row-sharded over the
  ``prim`` mesh axis (CAP/D rows per chip). Only a transient ~22-float/row
  render buffer (packed entries + binning geometry) is materialized
  replicated per frame: at 10M gaussians that is ~880 MB vs ~7 GB for
  params+optimizer, which is what sharding must (and does) eliminate.
- **Compute shards.** The image's tile-grid rows are partitioned over the
  same axis. Each chip preprocesses its OWN rows, all_gathers the packed
  rows + binning geometry (one (N,·) collective over ICI), then bins and
  composites ONLY its tile rows — the M-proportional stages (expansion,
  sort, gather, composite, backward) all run at ~1/D size. Shifting
  ``mean2d.y`` by the chip's tile-row origin lets the standard
  ``bin_gaussians`` run unmodified on a local window.
- **Exactness.** Tiles are independent in the compositor, so per-tile
  results — including the early-termination cut — are bit-identical to the
  single-chip renderer (unlike depth-slab sharding, whose cut semantics
  diverge; parallel/prim_shard.py documents that trade). The equivalence
  test asserts near-bitwise agreement.
- **Backward.** ``jax.grad`` differentiates straight through the
  shard_map: the all_gather transposes to a psum_scatter that returns each
  chip exactly the gradient rows it owns; Adam then updates locally. One
  (N,16) reduce-scatter per step is the entire gradient communication —
  camera-DP economics, riding ICI.

Densification runs per shard (clone/split/prune allocate within the local
row range); the free-slot layout therefore differs from the single-chip
run, but the set of live gaussians and all statistics match.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu.config import OptimizationConfig, RasterizerConfig
from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.core.schedules import expon_lr
from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import losses
from gsplat_tpu.ops import preprocess as preprocess_lib
from gsplat_tpu.ops.rasterize import (_gather_entries, masked_presort_prefix,
                                      masked_presort_prefix_slabs,
                                      _prefix_at, _tiles_to_image,
                                      composite_dispatch, pack_rows)
from gsplat_tpu.train import densify as densify_lib
from gsplat_tpu.train import trainer


def shard_state(state: "trainer.TrainState", mesh: Mesh,
                axis: str = "prim") -> "trainer.TrainState":
    """Place a TrainState with every per-gaussian array row-sharded over
    ``mesh[axis]`` (capacity must divide the axis size). Exposure, schedules
    and scalars stay replicated."""
    cap = state.gaussians.capacity
    d = mesh.shape[axis]
    assert cap % d == 0, f"capacity {cap} not divisible by mesh axis {d}"
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return jax.device_put(x, row)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ring_gather_entries(packed_loc, idx, inv_src, g_offsets, g_counts,
                         rank_inv, static):
    """entries[e] = packed_global[idx[e]] where packed_global is the
    row-sharded (N,16) parameter-derived table and ``packed_loc`` is this
    chip's (N/D,16) slab — WITHOUT ever materializing the replicated (N,16)
    buffer (the round-2 SCALING.md wall: 0.88 GB/chip at N=10M). The slab
    streams around the ring in D ppermute steps; each chip accumulates the
    rows it needs as the slab passes through. Per-chip transient: O(N/D)
    floats + the local entry list.

    idx: (m_loc_out,) global STORAGE-order row ids (idx = perm_ext[gidx] —
    binning's depth permutation composed in); out-of-range ids (sentinels)
    contribute zero. rank_inv: (N,) storage→depth-position inverse of the
    binning permutation.

    Backward: the transpose is a ring reduce-scatter — per step each chip
    evaluates the per-gaussian boundary differences (the _gather_entries
    cumsum trick) for ONE slab's rows and the partial sums travel the ring
    in reverse, so each owner ends with exactly its rows' gradients summed
    over all chips. Total gathered rows match the replicated path; only
    the peak memory changes (D gathers of N/D rows instead of one of N).
    """
    return _ring_gather_impl(packed_loc, idx, static)


# Ring loops unroll up to this D: unrolled steps let XLA double-buffer the
# ppermute sends against the per-step gather/compute. Past it (pod-scale)
# the unrolled graph's compile time grows linearly with D, so the loops
# switch to fori_loop (one body; strictly serialized send/compute — the
# overlap loss is bounded by one slab hop per step).
_RING_UNROLL_MAX = 16


def _ring_gather_impl(packed_loc, idx, static):
    axis, n_dev, m_cap = static
    rows = packed_loc.shape[0]
    k = jax.lax.axis_index(axis)
    fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(s, ent, slab):
        owner = (k - s) % n_dev
        rel = idx - owner * rows
        inb = (rel >= 0) & (rel < rows)
        return ent + jnp.where(inb[:, None],
                               slab[jnp.where(inb, rel, 0)], 0.0)

    ent = jnp.zeros((idx.shape[0], packed_loc.shape[1]), packed_loc.dtype)
    slab = packed_loc
    if n_dev <= _RING_UNROLL_MAX:
        for s in range(n_dev):
            ent = step(s, ent, slab)
            if s < n_dev - 1:
                slab = jax.lax.ppermute(slab, axis, fwd_perm)
        return ent

    def body(s, carry):
        ent, slab = carry
        ent = step(s, ent, slab)
        # one extra hop after the last step — (N/D,16) once per frame,
        # cheaper than a lax.cond around the collective
        return ent, jax.lax.ppermute(slab, axis, fwd_perm)

    ent, _ = jax.lax.fori_loop(0, n_dev, body, (ent, slab))
    return ent


def _ring_gather_fwd(packed_loc, idx, inv_src, g_offsets, g_counts,
                     rank_inv, static):
    out = _ring_gather_impl(packed_loc, idx, static)
    return out, (idx.shape[0], packed_loc.shape[0], inv_src, g_offsets,
                 g_counts, rank_inv)


def _ring_gather_bwd(static, res, d_aligned):
    axis, n_dev, m_cap = static
    _, rows, inv_src, g_offsets, g_counts, rank_inv = res
    total = jnp.clip(g_offsets[-1] + g_counts[-1], 0, m_cap)
    # shared helper: zeroes the unwritten presort tail before the MXU
    # scan (same 0·garbage hazard as the single-chip gather-VJP)
    intra, block_pre, L = masked_presort_prefix(d_aligned, inv_src, total,
                                                m_cap)
    bnd = jnp.clip(jnp.concatenate([g_offsets, total[None]]), 0, m_cap)
    k = jax.lax.axis_index(axis)

    def partial_for(owner):
        # this chip's gradient contribution to slab ``owner``'s rows
        sid = owner * rows + jnp.arange(rows, dtype=jnp.int32)
        dpos = rank_inv[sid]                             # depth positions
        lo = _prefix_at(intra, block_pre, L, bnd[dpos])
        hi = _prefix_at(intra, block_pre, L, bnd[dpos + 1])
        return hi - lo                                   # (rows, 16)

    buf = _ring_reduce_scatter(partial_for, k, axis, n_dev)
    return buf, None, None, None, None, None


def _ring_reduce_scatter(partial_for, k, axis, n_dev):
    """buf ← Σ_chips partial_for(owner), delivered to each owner via the
    reverse ring. Unrolled at small D (XLA overlaps send/compute),
    fori_loop past _RING_UNROLL_MAX (bounded compile at pod-scale D)."""
    rev_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def body(s, buf):
        buf = jax.lax.ppermute(buf, axis, rev_perm)
        return buf + partial_for((k + 1 + s) % n_dev)

    buf = partial_for((k + 1) % n_dev)
    if n_dev <= _RING_UNROLL_MAX:
        for s in range(1, n_dev):
            buf = body(s, buf)
        return buf
    return jax.lax.fori_loop(1, n_dev, body, buf)


_ring_gather_entries.defvjp(_ring_gather_fwd, _ring_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ring_gather_entries_slab(packed_loc, idx, inv_src, g_offsets, g_counts,
                              slab_totals, static):
    """``_ring_gather_entries`` for the SLAB-STREAMED binning layout
    (ops/binning.py expand_slab/merge_slab_binning): no N-sized depth
    permutation exists, so the per-gaussian tables arrive as per-slab
    stacks in ring-ARRIVAL order — g_offsets/g_counts are (D·rows,) with
    slab s (owner (k−s) mod D) at rows [s·rows, (s+1)·rows), offsets
    ABSOLUTE into the concatenated presort layout, and ``slab_totals``
    (D,) masking each slab's dead tail. static = (axis, n_dev, m_slab)."""
    axis, n_dev, m_slab = static
    return _ring_gather_impl(packed_loc, idx, (axis, n_dev, 0))


def _ring_gather_slab_fwd(packed_loc, idx, inv_src, g_offsets, g_counts,
                          slab_totals, static):
    axis, n_dev, m_slab = static
    out = _ring_gather_impl(packed_loc, idx, (axis, n_dev, 0))
    return out, (packed_loc.shape[0], inv_src, g_offsets, g_counts,
                 slab_totals)


def _ring_gather_slab_bwd(static, res, d_aligned):
    axis, n_dev, m_slab = static
    rows, inv_src, g_offsets, g_counts, slab_totals = res
    m_cap = n_dev * m_slab
    intra, block_pre, L = masked_presort_prefix_slabs(
        d_aligned, inv_src, slab_totals, m_slab, m_cap)
    k = jax.lax.axis_index(axis)
    off2 = g_offsets.reshape(n_dev, rows)
    cnt2 = g_counts.reshape(n_dev, rows)

    def partial_for(owner):
        # owner o's table sits at arrival slot (k − o) mod D
        slot = (k - owner) % n_dev
        start = jax.lax.dynamic_index_in_dim(off2, slot, 0, keepdims=False)
        cnt = jax.lax.dynamic_index_in_dim(cnt2, slot, 0, keepdims=False)
        lo = _prefix_at(intra, block_pre, L, jnp.clip(start, 0, m_cap))
        hi = _prefix_at(intra, block_pre, L,
                        jnp.clip(start + cnt, 0, m_cap))
        return hi - lo                                   # (rows, 16)

    buf = _ring_reduce_scatter(partial_for, k, axis, n_dev)
    return buf, None, None, None, None, None


_ring_gather_entries_slab.defvjp(_ring_gather_slab_fwd,
                                 _ring_gather_slab_bwd)


def _render_shard_slab(packed_loc, geom_loc, pre, *, axis, n_dev, W, H,
                       rows_loc, cfg, m_cap_loc, interpret):
    """The fully-streamed tail of ``_render_shard_fn`` (transient="slab"):
    geometry ppermutes around the ring and each arriving slab is expanded
    into (tile, raw-depth-key) entries at m_cap_loc/D; one merged sort
    (ops/binning.py merge_slab_binning) reproduces the global order, and
    the packed render rows stream through a second ring
    (``_ring_gather_entries_slab``). NOTHING N-sized materializes: the
    peak per-chip transient is O(N/D) geometry + the (N,) int32
    offset/count presort tables — the post-250M-ceiling mode of
    SCALING.md. Per-slab caps overflow independently (surfaced in
    ``overflow``; the host grows capacity exactly like a pair overflow)."""
    th, tw = cfg.tile_h, cfg.tile_w
    n_tiles_x = -(-W // tw)
    k = jax.lax.axis_index(axis)
    rows = packed_loc.shape[0]
    cap_total = n_dev * rows
    m_slab = max(-(-(m_cap_loc // n_dev) // cfg.chunk) * cfg.chunk,
                 cfg.chunk)
    y_shift = (k * rows_loc * th).astype(jnp.float32)

    fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    geom = jax.lax.stop_gradient(geom_loc)
    slabs = []
    for s in range(n_dev):
        owner = (k - s) % n_dev                          # traced: math only
        mean2d_s = jnp.stack([geom[:, 0], geom[:, 1] - y_shift], axis=-1)
        cull = dict(conic=geom[:, 6:9], t_cut=geom[:, 9],
                    row_slots=cfg.row_slots) if cfg.row_cull else {}
        slabs.append(binning_lib.expand_slab(
            mean2d_s, geom[:, 2], geom[:, 3], geom[:, 4], geom[:, 5],
            row_base=owner * rows, slab_base_entry=s * m_slab,
            sentinel_row=cap_total, image_width=W,
            image_height=rows_loc * th, tile_h=th, tile_w=tw,
            m_slab=m_slab, **cull))
        if s < n_dev - 1:
            geom = jax.lax.ppermute(geom, axis, fwd_perm)
    b = binning_lib.merge_slab_binning(
        slabs, sentinel_row=cap_total, image_width=W,
        image_height=rows_loc * th, tile_h=th, tile_w=tw, align=cfg.chunk)
    slab_totals = jnp.stack([jnp.minimum(sl.total, m_slab) for sl in slabs])
    entries = _ring_gather_entries_slab(
        packed_loc, b.gidx_sorted, b.inv_src, b.g_offsets, b.g_counts,
        slab_totals, (axis, n_dev, m_slab))

    out = composite_dispatch(entries, b.tile_start, b.tile_count, cfg,
                             n_tiles_x=n_tiles_x, n_tiles_y=rows_loc,
                             tile_id_base=k * rows_loc * n_tiles_x,
                             interpret=interpret)
    slab_img = jnp.concatenate([out.accum, out.t_final[:, None, :]], axis=1)
    slab_img = _tiles_to_image(slab_img, rows_loc, n_tiles_x, th, tw,
                               rows_loc * th, W)              # (5,h_loc,W)
    full = jax.lax.all_gather(slab_img, axis, tiled=True, axis=1)
    return (full[:, :H, :], pre.radius,
            jax.lax.psum(b.num_pairs, axis),
            jax.lax.pmax(b.overflow, axis))


def _render_shard_fn(trainables_loc, active_loc, sh_degree, tap_loc, cam,
                     *, axis, n_dev, W, H, n_tiles_y_pad, cfg,
                     m_cap_loc, antialiasing, scaling_modifier=1.0,
                     interpret=False, transient="replicated"):
    """Runs per chip under shard_map: local preprocess → all_gather packed →
    local-tile-window binning + compositing → gathered image. Returns
    (image(3,H,W), invdepth(1,H,W), radius_loc, num_pairs, overflow)."""
    th, tw = cfg.tile_h, cfg.tile_w
    n_tiles_x = -(-W // tw)
    rows_loc = n_tiles_y_pad // n_dev
    k = jax.lax.axis_index(axis)

    g_loc = gm.GaussianParams(active_sh_degree=sh_degree,
                              active=active_loc, **trainables_loc)
    pre = preprocess_lib.preprocess(
        g_loc.xyz, g_loc.get_scaling(), g_loc.get_rotation(),
        g_loc.get_opacity(), g_loc.get_features(), sh_degree, cam, W, H,
        active_mask=active_loc, scaling_modifier=scaling_modifier,
        antialiasing=antialiasing, dilation=cfg.dilation,
        alpha_min=cfg.alpha_min)
    if tap_loc is not None:
        tap_px = tap_loc * jnp.array([[0.5 * W, 0.5 * H]], jnp.float32)
        pre = pre._replace(mean2d=pre.mean2d + tap_px)

    packed_loc = pack_rows(pre)                              # (cap/D, 16)
    geom_cols = [pre.mean2d[:, 0], pre.mean2d[:, 1], pre.depth,
                 pre.radius, pre.rx, pre.ry]
    if cfg.row_cull:                      # +4: conic + level-set threshold
        geom_cols += [pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
                      pre.t_cut]
    geom_loc = jnp.stack(geom_cols, axis=-1)
    # ---- forward collectives over ICI ----
    # binning GEOMETRY is gathered on the "replicated"/"ring" paths:
    # 6 f32/row (240 MB at N=10M; 10 with row_cull — repaid by the
    # pair-count shrink) — the rect/key construction needs a global view.
    # The 16-f32 packed render rows are gathered only on "replicated";
    # "ring" streams them slab-by-slab instead (O(N/D) peak), removing the
    # dominant replicated term of the round-2 memory model (SCALING.md).
    # "slab" streams BOTH: binning itself goes slab-streamed (per-slab
    # expansion with raw-depth keys + one merged sort, ops/binning.py), so
    # no N-sized array of any kind materializes — peak O(N/D) geometry +
    # 8 B/gaussian of presort tables (the new SCALING.md ceiling term).
    if transient == "slab":
        return _render_shard_slab(
            packed_loc, geom_loc, pre, axis=axis, n_dev=n_dev, W=W, H=H,
            rows_loc=rows_loc, cfg=cfg, m_cap_loc=m_cap_loc,
            interpret=interpret)
    geom = jax.lax.all_gather(jax.lax.stop_gradient(geom_loc), axis,
                              tiled=True)                       # (N,6)
    if transient == "replicated":
        packed = jax.lax.all_gather(packed_loc, axis, tiled=True)  # (N,16)

    # ---- local tile-row window: shift y so the standard binning runs on
    # a [0, rows_loc·th) window at per-chip m_cap ----
    mean2d_w = jnp.stack(
        [geom[:, 0], geom[:, 1] - (k * rows_loc * th).astype(jnp.float32)],
        axis=-1)
    cull_kw = {}
    if cfg.row_cull:
        cull_kw = dict(conic=geom[:, 6:9], t_cut=geom[:, 9],
                       row_slots=cfg.row_slots)
    b = binning_lib.bin_gaussians(
        mean2d_w, geom[:, 2], geom[:, 3], rx=geom[:, 4], ry=geom[:, 5],
        image_width=W, image_height=rows_loc * th, tile_h=th, tile_w=tw,
        m_cap=m_cap_loc, align=cfg.chunk, sort_gaussians=True, **cull_kw)
    cap_total = n_dev * packed_loc.shape[0]
    perm_ext = jnp.concatenate(
        [b.perm, jnp.full((1,), cap_total, jnp.int32)])
    if transient == "replicated":
        packed_ext = jnp.concatenate(
            [packed, jnp.zeros((1, 16), packed.dtype)], axis=0)[perm_ext]
        entries = _gather_entries(packed_ext, b.gidx_sorted, b.inv_src,
                                  b.g_offsets, b.g_counts, m_cap_loc)
    else:
        # depth permutation folds into the (stop-grad) global row ids; the
        # sentinel id cap_total is out of every slab's range → zero row
        rank_inv = jnp.zeros((cap_total,), jnp.int32).at[b.perm].set(
            jnp.arange(cap_total, dtype=jnp.int32), unique_indices=True)
        idx = perm_ext[b.gidx_sorted]
        entries = _ring_gather_entries(packed_loc, idx, b.inv_src,
                                       b.g_offsets, b.g_counts, rank_inv,
                                       (axis, n_dev, m_cap_loc))
    # packed entries carry GLOBAL mean2d — give the compositor the global
    # tile-id origin so its pixel coordinates match (binning alone used the
    # shifted frame)
    out = composite_dispatch(entries, b.tile_start, b.tile_count, cfg,
                             n_tiles_x=n_tiles_x, n_tiles_y=rows_loc,
                             tile_id_base=k * rows_loc * n_tiles_x,
                             interpret=interpret)

    # local (5, rows_loc·th, W) slab: rgb+invdepth accum and transmittance
    slab = jnp.concatenate([out.accum, out.t_final[:, None, :]], axis=1)
    slab = _tiles_to_image(slab, rows_loc, n_tiles_x, th, tw,
                           rows_loc * th, W)                  # (5,h_loc,W)
    full = jax.lax.all_gather(slab, axis, tiled=True, axis=1)  # (5,Hpad,W)
    return (full[:, :H, :], pre.radius,
            jax.lax.psum(b.num_pairs, axis),
            jax.lax.pmax(b.overflow, axis))


class ShardedRenderOut(NamedTuple):
    image: jnp.ndarray       # (3,H,W)
    invdepth: jnp.ndarray    # (1,H,W)
    radii: jnp.ndarray       # (CAP,) row-sharded
    num_pairs: jnp.ndarray   # () total over chips
    overflow: jnp.ndarray    # () pmax over chips


def make_sharded_render(mesh: Mesh, *, image_width: int, image_height: int,
                        cfg: RasterizerConfig, axis: str = "prim",
                        antialiasing: bool = False,
                        m_cap_total: Optional[int] = None,
                        interpret: bool = False,
                        transient: str = "replicated"):
    """Build fn(gaussians_sharded, cam, bg) → ShardedRenderOut. Capacity
    must divide mesh[axis]."""
    n_dev = mesh.shape[axis]
    W, H = image_width, image_height
    th = cfg.tile_h
    n_tiles_y = -(-H // th)
    n_tiles_y_pad = -(-n_tiles_y // n_dev) * n_dev

    def fn(gaussians: gm.GaussianParams, cam: CameraView, bg):
        cap = gaussians.capacity
        m_total = m_cap_total
        if m_total is None:
            m_total = int(cap * cfg.pairs_per_gaussian)
        # per-chip capacity: 1/D of the total with a 1.5x imbalance margin
        m_loc = -(-int(m_total * 1.5 / n_dev) // cfg.chunk) * cfg.chunk

        shard_fn = functools.partial(
            _render_shard_fn, axis=axis, n_dev=n_dev, W=W, H=H,
            n_tiles_y_pad=n_tiles_y_pad, cfg=cfg, m_cap_loc=m_loc,
            antialiasing=antialiasing, interpret=interpret,
            transient=transient)

        def wrapped(trainables_loc, active_loc, sh_degree, cam):
            return shard_fn(trainables_loc, active_loc, sh_degree, None, cam)

        slab, radii, num_pairs, overflow = jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P(axis), P(), P()),
            check_vma=False,
        )(gm.trainables(gaussians), gaussians.active,
          gaussians.active_sh_degree, cam)
        image = jnp.clip(slab[:3] + slab[4:5] * bg[:, None, None], 0.0, 1.0)
        return ShardedRenderOut(image=image, invdepth=slab[3:4],
                                radii=radii, num_pairs=num_pairs,
                                overflow=overflow)

    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_grad(x, axis):
    """Identity whose backward psums the cotangent over ``axis``. Applied to
    inputs that are replicated over a mesh axis but receive DIFFERENT
    cotangents per shard (camera-DP over the sharded step): without the
    explicit reduction the shard_map transpose would pick an arbitrary
    copy."""
    return x


def _psum_grad_fwd(x, axis):
    return x, None


def _psum_grad_bwd(axis, _, g):
    return (jax.lax.psum(g, axis),)


_psum_grad.defvjp(_psum_grad_fwd, _psum_grad_bwd)


def make_sharded_dp_train_step(mesh: Mesh, *, image_width: int,
                               image_height: int, opt: OptimizationConfig,
                               rcfg: RasterizerConfig,
                               spatial_lr_scale: float,
                               antialiasing: bool = False,
                               use_sparse_adam: bool = False,
                               train_test_exp: bool = False,
                               use_depth: bool = False,
                               axis: str = "prim", data_axis: str = "data",
                               interpret: bool = False,
                               transient: str = "replicated"):
    """The 2D-mesh step: camera data-parallelism COMPOSED with gaussian-
    sharded storage. Each (data, prim) device renders its camera's tile
    rows from its parameter rows; gradients reduce over BOTH axes (psum
    over ``data``, reduce-scatter over ``prim``). Densification statistics
    follow the camera-DP semantics (per-view grad norms summed, visit
    counts summed, radii maxed — parallel/dp.py).

    Signature matches make_sharded_train_step but camera/image inputs carry
    a leading batch dim of mesh.shape[data_axis]."""
    n_prim = mesh.shape[axis]
    n_data = mesh.shape[data_axis]
    W, H = image_width, image_height
    th = rcfg.tile_h
    n_tiles_y = -(-H // th)
    n_tiles_y_pad = -(-n_tiles_y // n_prim) * n_prim

    def step(state: "trainer.TrainState", cam: CameraView, gt_image,
             alpha_mask, invdepth_gt, depth_mask, bg):
        g = state.gaussians
        cap = g.capacity
        stepc = state.step + 1
        m_loc = -(-int(cap * rcfg.pairs_per_gaussian * 1.5 / n_prim)
                  // rcfg.chunk) * rcfg.chunk
        depth_w = expon_lr(stepc, opt.depth_l1_weight_init,
                           opt.depth_l1_weight_final, max_steps=opt.iterations)

        base_fn = functools.partial(
            _render_shard_fn, axis=axis, n_dev=n_prim, W=W, H=H,
            n_tiles_y_pad=n_tiles_y_pad, cfg=rcfg, m_cap_loc=m_loc,
            antialiasing=antialiasing, interpret=interpret,
            transient=transient)

        def shard_fn(trainables_loc, active_loc, sh_degree, tap_slice, cam):
            # replicated over data, but per-camera cotangents differ →
            # explicit data-psum in the backward
            trainables_loc = jax.tree_util.tree_map(
                lambda v: _psum_grad(v, data_axis), trainables_loc)
            cam1 = jax.tree_util.tree_map(lambda x: x[0], cam)
            slab, radius_loc, num_pairs, overflow = base_fn(
                trainables_loc, active_loc, sh_degree, tap_slice[0], cam1)
            # per-frame num_pairs (already psum'd over the prim axis) →
            # MAX over cameras, matching dp.py: the host's capacity policy
            # reads this as a per-frame count; a batch SUM would inflate
            # the overflow grow (and its hysteresis floor) by ~B forever
            return (slab[None], radius_loc[None],
                    jax.lax.pmax(num_pairs, data_axis),
                    jax.lax.pmax(overflow, data_axis))

        render_fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(data_axis, axis),
                      P(data_axis)),
            out_specs=(P(data_axis), P(data_axis, axis), P(), P()),
            check_vma=False)

        def loss_fn(trainables, exposure_all, tap):
            slabs, radii_b, num_pairs, overflow = render_fn(
                trainables, g.active, g.active_sh_degree, tap, cam)
            image = slabs[:, :3] + slabs[:, 4:5] * bg[None, :, None, None]
            if train_test_exp:
                idx = cam.exposure_idx                      # (B,)
                exp_b = jnp.where(
                    (idx >= 0)[:, None, None],
                    exposure_all[jnp.maximum(idx, 0)],
                    jnp.eye(3, 4, dtype=exposure_all.dtype)[None])
                image = jnp.einsum("bchw,bck->bkhw", image, exp_b[:, :3, :3],
                                   precision=jax.lax.Precision.HIGHEST) \
                    + exp_b[:, :3, 3, None, None]
            image = jnp.clip(image, 0.0, 1.0) * alpha_mask
            l1 = jnp.mean(jnp.abs(image - gt_image))
            ssim_v = jnp.mean(jax.vmap(losses.ssim)(image, gt_image))
            loss = (1.0 - opt.lambda_dssim) * l1 \
                + opt.lambda_dssim * (1.0 - ssim_v)
            dl1 = jnp.abs((slabs[:, 3:4] - invdepth_gt) * depth_mask).mean()
            loss = loss + jnp.where(depth_w > 0, depth_w * dl1, 0.0) * use_depth
            return loss, (l1, dl1, radii_b, num_pairs, overflow)

        tap0 = jnp.zeros((n_data, cap, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                     has_aux=True)
        (loss, (l1, dl1, radii_b, num_pairs, overflow)), \
            (grads, exp_grads, tap_grad) = grad_fn(
                gm.trainables(g), state.exposure, tap0)

        # camera-DP densification statistics (parallel/dp.py semantics):
        # per-view screen-space grad norms and visit counts sum over the
        # batch, radii take the max. The mean-loss 1/B scale on tap_grad is
        # undone so each view contributes its full-gradient norm, matching
        # the reference's one-view-per-step accumulation.
        vis_b = radii_b > 0                                   # (B, CAP)
        gnorm_b = jnp.linalg.norm(tap_grad, axis=-1) * n_data  # (B, CAP)
        accum_inc = jnp.sum(jnp.where(vis_b, gnorm_b, 0.0), axis=0)
        denom_inc = jnp.sum(vis_b.astype(jnp.float32), axis=0)
        radii_max = jnp.max(radii_b, axis=0)
        in_densify = stepc < opt.densify_until_iter
        stats = jax.lax.cond(
            in_densify,
            lambda s: densify_lib.DensifyStats(
                xyz_gradient_accum=s.xyz_gradient_accum + accum_inc,
                denom=s.denom + denom_inc,
                max_radii2d=jnp.maximum(s.max_radii2d, radii_max)),
            lambda s: s, state.stats)

        vis = (denom_inc > 0) if use_sparse_adam else None
        new_state = trainer.finish_train_step(
            state, grads, exp_grads, stats, stepc, vis, opt=opt,
            spatial_lr_scale=spatial_lr_scale)
        aux = trainer.StepAux(loss=loss, l1=l1, depth_l1=dl1,
                              num_pairs=num_pairs, overflow=overflow,
                              radii=radii_max)
        return new_state, aux

    return jax.jit(step)


def make_sharded_train_step(mesh: Mesh, *, image_width: int,
                            image_height: int, opt: OptimizationConfig,
                            rcfg: RasterizerConfig,
                            spatial_lr_scale: float,
                            antialiasing: bool = False,
                            use_sparse_adam: bool = False,
                            train_test_exp: bool = False,
                            use_depth: bool = False, axis: str = "prim",
                            interpret: bool = False,
                            transient: str = "replicated"):
    """Build the jitted sharded train step: (state_sharded, cam, gt, amask,
    invdepth_gt, depth_mask, bg) → (state_sharded, StepAux). Semantics match
    trainer.train_step with every per-gaussian quantity row-sharded."""
    n_dev = mesh.shape[axis]
    W, H = image_width, image_height
    th = rcfg.tile_h
    n_tiles_y = -(-H // th)
    n_tiles_y_pad = -(-n_tiles_y // n_dev) * n_dev

    def step(state: "trainer.TrainState", cam: CameraView, gt_image,
             alpha_mask, invdepth_gt, depth_mask, bg):
        g = state.gaussians
        cap = g.capacity
        stepc = state.step + 1
        m_loc = -(-int(cap * rcfg.pairs_per_gaussian * 1.5 / n_dev)
                  // rcfg.chunk) * rcfg.chunk
        depth_w = expon_lr(stepc, opt.depth_l1_weight_init,
                           opt.depth_l1_weight_final, max_steps=opt.iterations)

        shard_fn = functools.partial(
            _render_shard_fn, axis=axis, n_dev=n_dev, W=W, H=H,
            n_tiles_y_pad=n_tiles_y_pad, cfg=rcfg, m_cap_loc=m_loc,
            antialiasing=antialiasing, interpret=interpret,
            transient=transient)

        render_fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis), P()),
            out_specs=(P(), P(axis), P(), P()),
            check_vma=False)

        def loss_fn(trainables, exposure_all, tap):
            slab, radii, num_pairs, overflow = render_fn(
                trainables, g.active, g.active_sh_degree, tap, cam)
            image = slab[:3] + slab[4:5] * bg[:, None, None]
            if train_test_exp:
                exposure = jnp.where(
                    cam.exposure_idx >= 0,
                    exposure_all[jnp.maximum(cam.exposure_idx, 0)],
                    jnp.eye(3, 4, dtype=exposure_all.dtype))
                image = jnp.einsum("chw,ck->khw", image, exposure[:3, :3],
                                   precision=jax.lax.Precision.HIGHEST) \
                    + exposure[:3, 3, None, None]
            image = jnp.clip(image, 0.0, 1.0) * alpha_mask
            l1 = losses.l1_loss(image, gt_image)
            ssim_v = losses.ssim(image, gt_image)
            loss = (1.0 - opt.lambda_dssim) * l1 \
                + opt.lambda_dssim * (1.0 - ssim_v)
            dl1 = jnp.abs((slab[3:4] - invdepth_gt) * depth_mask).mean()
            loss = loss + jnp.where(depth_w > 0, depth_w * dl1, 0.0) * use_depth
            return loss, (l1, dl1, radii, num_pairs, overflow)

        tap0 = jnp.zeros((cap, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                     has_aux=True)
        (loss, (l1, dl1, radii, num_pairs, overflow)), \
            (grads, exp_grads, tap_grad) = grad_fn(
                gm.trainables(g), state.exposure, tap0)

        in_densify = stepc < opt.densify_until_iter
        stats = jax.lax.cond(
            in_densify,
            lambda s: densify_lib.add_densification_stats(s, radii, tap_grad),
            lambda s: s, state.stats)

        vis = (radii > 0) if use_sparse_adam else None
        new_state = trainer.finish_train_step(
            state, grads, exp_grads, stats, stepc, vis, opt=opt,
            spatial_lr_scale=spatial_lr_scale)
        aux = trainer.StepAux(loss=loss, l1=l1, depth_l1=dl1,
                              num_pairs=num_pairs, overflow=overflow,
                              radii=radii)
        return new_state, aux

    return jax.jit(step)
