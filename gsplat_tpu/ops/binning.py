"""Tile binning: exact key duplication + global (tile, depth) sort, all XLA.

TPU-native replacement for the reference rasterizer's cub pipeline
(InclusiveSum → key duplication → 64-bit radix sort → tile ranges; SURVEY.md
§2.2). The construction is shaped by two measured TPU facts:

- ``jnp.searchsorted`` and random gathers over the multi-million-entry list
  cost 40–70 ms per call (the scalar-gather path); scatters at N size and
  cumsums at M size cost ~5 ms.
- every per-entry quantity we need is piecewise constant along the
  gaussian-major (and later tile-major) order, so each "gather by monotone
  index" is replaced by a **scatter of value-diffs at the run starts + one
  cumsum** — exact in int arithmetic even under int32 wraparound (telescoping
  sums), with f32 depth carried through its monotone int32 bit pattern.

Pipeline:
1. per-gaussian rects → counts/offsets (N-sized). With ``sort_gaussians``
   the gaussians are first depth-sorted (an N-sized sort, ~100× smaller
   than the entry list), so the per-entry depth key IS the gaussian index —
   one whole M-sized expansion disappears and the entry sort runs on a
   single packed (tile‖gidx) key instead of two keys + two payloads.
2. expansion: marker-scatter + cumsum yields the entry→gaussian map and the
   per-entry rect parameters; tile id (and depth key, when not pre-sorted)
   are computed pointwise,
3. per-tile counts via an interval-indicator matmul on the MXU (rect
   coverage is separable: count = ind_yᵀ @ ind_x, exact 0/1 arithmetic),
4. one ``lax.sort`` — exact depth ordering,
5. align: sorted entry p moves to padded_start[tile] + rank, where the shift
   is itself expanded by a diff-scatter + cumsum — one collision-free
   permutation scatter lands the chunk-aligned layout the Pallas kernels
   require (per-tile ranges start and end on chunk boundaries).

Rect extents: callers may pass tight per-axis half-widths (rx, ry) from
preprocess — the AABB of the {alpha ≥ alpha_min} level set — instead of the
reference's circumscribed 3σ radius. Every pair dropped that way is zeroed
by the compositor's own alpha_min cut, so the rendered image is unchanged
while anisotropic / low-opacity splats generate far fewer pairs.

Overflow beyond m_cap is counted and surfaced so the host can double
capacity and re-jit. An overflowing frame's per-tile ranges are clamped to
stay in-bounds (memory-safe) but its content is garbage — callers must treat
``overflow > 0`` frames as invalid, grow, and re-render.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gidx_sorted: jnp.ndarray   # (M_out,) int32 gaussian index per entry (N = pad)
    tile_sorted: Optional[jnp.ndarray]  # (M_cap,) int32 per entry; None if align>1
    tile_start: jnp.ndarray    # (T,) int32 first entry per tile
    tile_count: jnp.ndarray    # (T,) int32 entries per tile
    num_pairs: jnp.ndarray     # () int32 total real entries (pre-truncation)
    overflow: jnp.ndarray      # () int32 dropped entries (0 if m_cap sufficed)
    num_padded: jnp.ndarray = None  # () int32 chunk-padded layout extent
    #   (align>1 only) — the host right-sizes pad_cap from this
    # align>1 extras for the efficient gather-VJP (ops/rasterize.py):
    inv_src: Optional[jnp.ndarray] = None     # (M_cap,) presort → aligned idx
    g_offsets: Optional[jnp.ndarray] = None   # (N,) presort start per gaussian
    g_counts: Optional[jnp.ndarray] = None    # (N,) entries per gaussian
    # sort_gaussians extra: depth order of the gaussians. gidx_sorted,
    # g_offsets and g_counts index THIS order — callers address per-gaussian
    # tables as table[perm] (rasterize.py does packed[perm]).
    perm: Optional[jnp.ndarray] = None        # (N,) int32


def tile_rect(mean2d: jnp.ndarray, rx: jnp.ndarray, ry: jnp.ndarray,
              n_tiles_x: int, n_tiles_y: int, tile_h: int, tile_w: int):
    """Inclusive-exclusive tile rectangle [x0,x1)×[y0,y1) covered by each
    Gaussian's per-axis extents. CUDA getRect parity (with rx = ry = radius
    it reproduces the reference's square rect). floor() handles negative
    coordinates (int cast truncates toward 0)."""
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / tile_w),
                  0, n_tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / tile_h),
                  0, n_tiles_y).astype(jnp.int32)
    x1 = jnp.clip((mean2d[:, 0] + rx + tile_w - 1) // tile_w,
                  0, n_tiles_x).astype(jnp.int32)
    y1 = jnp.clip((mean2d[:, 1] + ry + tile_h - 1) // tile_h,
                  0, n_tiles_y).astype(jnp.int32)
    return x0, y0, x1, y1


def _expand(values: jnp.ndarray, offsets: jnp.ndarray, m: int) -> jnp.ndarray:
    """values[gidx[e]] for the monotone entry→gaussian map implied by
    ``offsets`` — computed as diff-scatter + cumsum (no gather). int32 only;
    exact under wraparound. Entries past the last start keep the final
    value; callers mask invalid tails. (A Pallas O(n) scan kernel was
    measured at 2.9 vs XLA's 2.6 ms here — XLA's 1D cumsum is fine at this
    size; see tools/experiments/pallas_scan.py.)"""
    dv = jnp.concatenate([values[:1], values[1:] - values[:-1]])
    buf = jnp.zeros((m,), jnp.int32).at[offsets].add(
        dv, mode="drop", indices_are_sorted=True)
    return jnp.cumsum(buf)


def _expand_multi(values_list, offsets, m: int, *, force: bool = False,
                  interpret: bool = False):
    """K fused ``_expand`` passes sharing ONE scan (K ≤ 5).

    Each of XLA's 1D int32 cumsums costs ~2.6 ms at the 1080p entry count
    (measured, tools/experiments/pallas_scan.py) and the expansion stage
    runs three of them back to back — the largest single cost left in
    binning after pads-in-sort (r5 bisect: 8.45 ms of ~14). On TPU the K
    diff-scattered int32 buffers are instead split into base-2^11 limbs
    (3 per value, so K ≤ 5 fits the 16-wide scan), run through the one
    MXU-blocked (M,16) prefix kernel (ops/pallas/scan.py, ~1 ms at 2M),
    and recombined with WRAPPING int32 shift-adds.

    Exactness: within an L=4096 block each limb column's partial sums are
    ≤ 4096·2047 < 2^24, exact in f32; the inter-block carry is added in
    int32 where wraparound matches the mod-2^32 arithmetic the telescoping
    diff construction already relies on; the final shift-add recombine is
    mod-2^32 linear in the limbs, so it equals the true int32 cumsum
    bit-for-bit (tested against _expand in test_binning_expand_multi).

    STATUS — measured SLOWER end-to-end on-chip (r5): the fused form
    regressed the 1080p bench step 114 → 164 ms. The (N,K)-row scatter
    and the (B,16)→(M,16) block-prefix broadcast both lower poorly next
    to XLA's plain 1D int32 scatter+cumsum. Kept (with its exactness
    test) as the measured-and-rejected record; the hot path uses three
    plain ``_expand`` calls. Only ``force=True`` reaches the limb path.
    """
    K = len(values_list)
    assert 1 <= K <= 5, K
    if not force:
        return [_expand(v, offsets, m) for v in values_list]
    from gsplat_tpu.ops.pallas.scan import blocked_cumsum_16
    L = 4096
    m_pad = -(-m // L) * L
    dvs = []
    for v in values_list:
        dvs.append(jnp.concatenate([v[:1], v[1:] - v[:-1]]))
    dv = jnp.stack(dvs, axis=1)                          # (N, K) int32
    buf = jnp.zeros((m_pad, K), jnp.int32).at[offsets].add(
        dv, mode="drop", indices_are_sorted=True)
    ubuf = jax.lax.bitcast_convert_type(buf, jnp.uint32)
    limbs = jnp.concatenate(
        [(ubuf & jnp.uint32(0x7FF)).astype(jnp.float32),
         ((ubuf >> 11) & jnp.uint32(0x7FF)).astype(jnp.float32),
         (ubuf >> 22).astype(jnp.float32)], axis=1)      # (m_pad, 3K)
    if 3 * K < 16:
        limbs = jnp.pad(limbs, ((0, 0), (0, 16 - 3 * K)))
    intra, block_tot = blocked_cumsum_16(limbs, L=L,
                                         interpret=interpret)  # f32 exact
    intra_i = intra.astype(jnp.int32)                    # < 2^24: exact
    tot_i = block_tot.astype(jnp.int32)                  # (B, 16)
    pre_i = jnp.cumsum(tot_i, axis=0) - tot_i            # wrapping int32
    full = intra_i + jnp.repeat(pre_i, L, axis=0)        # (m_pad, 16)
    outs = []
    for k in range(K):
        v = (full[:, k]
             + (full[:, K + k] << 11)
             + (full[:, 2 * K + k] << 22))               # wraps: mod 2^32
        outs.append(v[:m])
    return outs


def _slot_x_interval(mu_x, mu_y, ca, cb, cc, t, y_top, n_px):
    """Exact x-interval [u_lo, u_hi] (relative to mu_x, in pixels) where the
    level-set ellipse {d : dᵀ·conic·d ≤ t} meets the pixel-row span
    y ∈ [y_top, y_top + n_px - 1] (one tile row, or a whole tail block).

    q(u,v) = ca·u² + 2cb·uv + cc·v² is convex (conic of a PD covariance), so
    {u : min_{v∈[v0,v1]} q ≤ t} is an interval. Its right end is either the
    ellipse's global x-extreme u_g = sqrt(t·cc/Δ) (Δ = ca·cc − cb², attained
    at v = −cb·u_g/cc) when that v lies in the span, or the larger root of
    q(u, v_edge) = t over the two edges; mirrored for the left end. Using
    the span's CONTINUOUS v-range (⊇ the integer pixel centers) and a ±0.5px
    inflation keeps the interval conservative: every culled (entry, pixel)
    is provably alpha < alpha_min, already zeroed by the compositor.

    Returns (u_lo, u_hi, nonempty). Callers must mask out n_px ≤ 0 slots
    themselves (the inverted v-range yields garbage there)."""
    v0 = y_top.astype(jnp.float32) - mu_y
    v1 = v0 + (n_px.astype(jnp.float32) - 1.0)
    det2 = jnp.maximum(ca * cc - cb * cb, 1e-12)
    safe_ca = jnp.maximum(ca, 1e-12)
    safe_cc = jnp.maximum(cc, 1e-12)
    u_g = jnp.sqrt(jnp.maximum(t * safe_cc / det2, 0.0))
    v_at_right = -cb * u_g / safe_cc       # v of the +x extreme point
    disc0 = t * safe_ca - det2 * v0 * v0
    disc1 = t * safe_ca - det2 * v1 * v1
    s0 = jnp.sqrt(jnp.maximum(disc0, 0.0))
    s1 = jnp.sqrt(jnp.maximum(disc1, 0.0))
    big = jnp.float32(3.0e38)
    hi0 = jnp.where(disc0 >= 0, (-cb * v0 + s0) / safe_ca, -big)
    hi1 = jnp.where(disc1 >= 0, (-cb * v1 + s1) / safe_ca, -big)
    lo0 = jnp.where(disc0 >= 0, (-cb * v0 - s0) / safe_ca, big)
    lo1 = jnp.where(disc1 >= 0, (-cb * v1 - s1) / safe_ca, big)
    right_interior = (v_at_right >= v0) & (v_at_right <= v1)
    left_interior = (-v_at_right >= v0) & (-v_at_right <= v1)
    u_hi = jnp.where(right_interior, u_g, jnp.maximum(hi0, hi1))
    u_lo = jnp.where(left_interior, -u_g, jnp.minimum(lo0, lo1))
    nonempty = (u_lo <= u_hi) & (t > 0.0)
    return u_lo - 0.5, u_hi + 0.5, nonempty


class UnitExpansion(NamedTuple):
    """Per-entry arrays + per-gaussian tables from one expansion pass
    (``_expand_units``): the sort- and layout-independent first half of
    binning, shared by the single-list path (``bin_gaussians``) and the
    slab-streamed path (``expand_slab``/``merge_slab_binning``)."""
    tile: jnp.ndarray          # (m_cap,) int32; sentinel n_tiles past total
    gidx: jnp.ndarray          # (m_cap,) int32; sentinel n past total
    counts: jnp.ndarray        # (N,) entries per gaussian
    offsets: jnp.ndarray       # (N,) exclusive per-gaussian entry starts
    uoffsets: jnp.ndarray      # (N·R,) per-UNIT exclusive starts
    total: jnp.ndarray         # () int32 real entries (pre-truncation)
    count_grid: jnp.ndarray    # (ty, tx) per-tile entry counts
    #   (additive across slabs)


def _expand_units(mean2d, radius, rx, ry, *, n_tiles_x, n_tiles_y,
                  tile_h, tile_w, m_cap, conic=None, t_cut=None,
                  row_slots: int = 4) -> UnitExpansion:
    """Rects → (tile, gaussian) entry expansion, gather-free.

    Expansion UNITS: one rect per unit, decoded 2D (k//w, k%w).
    Plain binning: unit == gaussian, rect == the rx×ry bounding rect.
    Row culling (``conic``+``t_cut``): unit == slot, R static slots per
    gaussian — slots 0..R-2 are single tile rows carrying the level-set
    ellipse's exact x-interval for that row (``_slot_x_interval``), slot
    R-1 is the TAIL BLOCK covering all remaining rows at the interval of
    their union's span (still culled, just jointly). Everything downstream
    (counts → offsets → the 3 shared M-sized expansions → histogram →
    sort) is identical; only the unit arrays differ. Dense (N,R) slot
    math costs no scatter/cumsum passes and cannot overflow (unlike a
    dynamically-sized gaussian→row expansion), and pairs the compositor
    would zero anyway (rect corners outside the ellipse — ~π/4 of an
    axis-aligned rect, far less for diagonal anisotropic splats) never
    enter the entry list, shrinking every M-sized pass."""
    n = mean2d.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    x0, y0, x1, y1 = tile_rect(mean2d, rx, ry, n_tiles_x, n_tiles_y,
                               tile_h, tile_w)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    valid_g = (radius > 0) & (rx > 0) & (ry > 0)
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)

    if conic is not None:
        R = row_slots
        rvec = jnp.arange(R, dtype=jnp.int32)[None, :]       # (1,R)
        h_u = jnp.where(rvec < R - 1,
                        (rvec < rect_h[:, None]).astype(jnp.int32),
                        jnp.maximum(rect_h[:, None] - (R - 1), 0))
        ty0_u = y0[:, None] + rvec
        u_lo, u_hi, nonempty = _slot_x_interval(
            mean2d[:, 0:1], mean2d[:, 1:2], conic[:, 0:1], conic[:, 1:2],
            conic[:, 2:3], t_cut[:, None], ty0_u * tile_h, h_u * tile_h)
        # pre-cast clip (the empty-slot ±3e38 would wrap int32), then
        # clamp to the rect's own x tile range: the ±0.5px inflation can
        # otherwise spill one tile past it, ADDING pairs rect binning
        # never had (the subset property is what makes culling exact).
        f0 = jnp.clip(jnp.floor((mean2d[:, 0:1] + u_lo) / tile_w),
                      0.0, jnp.float32(n_tiles_x))
        f1 = jnp.clip(jnp.floor((mean2d[:, 0:1] + u_hi) / tile_w),
                      -1.0, jnp.float32(n_tiles_x))
        tx0_u = jnp.maximum(f0.astype(jnp.int32), x0[:, None])
        tx1_u = jnp.minimum(f1.astype(jnp.int32) + 1, x1[:, None])
        w_u = jnp.where(valid_g[:, None] & nonempty & (h_u > 0),
                        jnp.maximum(tx1_u - tx0_u, 0), 0)
        h_u = jnp.where(w_u > 0, h_u, 0)
        counts = (w_u * h_u).sum(axis=1).astype(jnp.int32)   # per-gaussian
        gv = jnp.repeat(jnp.arange(n, dtype=jnp.int32), R)
        u_y0, u_x0 = ty0_u.reshape(-1), tx0_u.reshape(-1)
        u_w, u_h = w_u.reshape(-1), h_u.reshape(-1)
    else:
        gv = jnp.arange(n, dtype=jnp.int32)
        u_y0, u_x0 = y0, x0
        u_w = jnp.where(valid_g, rect_w, 0)
        u_h = jnp.where(valid_g, rect_h, 0)
        counts = None       # == ucounts below (unit == gaussian here)

    ucounts = (u_w * u_h).astype(jnp.int32)
    if counts is None:
        counts = ucounts
    uoffsets = (jnp.cumsum(ucounts) - ucounts).astype(jnp.int32)  # excl.
    total = uoffsets[-1] + ucounts[-1]
    # per-gaussian entry offsets (gather-VJP tables): a gaussian's slots
    # are contiguous in unit order, so its range starts at its first slot
    offsets = uoffsets if conic is None \
        else uoffsets.reshape(n, row_slots)[:, 0]

    # --- expansion (gather-free; see module docstring) ---
    # rect base (corner tile id) and width share one cumsum — wraparound-
    # exact packing saves an M-sized pass. The width field must hold
    # u_w ∈ [1, n_tiles_x]: size it from the grid (a hardcoded 2^7 would
    # silently corrupt tile ids for n_tiles_x ≥ 128, e.g. 16px tiles at
    # ≥2K wide). Packing fits int32 comfortably up to ~8K renders; beyond
    # that fall back to a second unpacked expansion pass. All the M-sized
    # cumsums fuse into ONE MXU-blocked limb scan on TPU (_expand_multi).
    wmult = 1 << int(n_tiles_x).bit_length()           # wmult > n_tiles_x
    if (n_tiles - 1) * wmult + n_tiles_x < 2 ** 31:
        bw = (u_y0 * n_tiles_x + u_x0) * wmult + jnp.maximum(u_w, 1)
        gidx = _expand(gv, uoffsets, m_cap)
        off_e = _expand(uoffsets, uoffsets, m_cap)
        bw_e = _expand(bw, uoffsets, m_cap)
        base_e = bw_e // wmult
        w_e = bw_e - base_e * wmult
    else:
        gidx = _expand(gv, uoffsets, m_cap)
        off_e = _expand(uoffsets, uoffsets, m_cap)
        base_e = _expand(u_y0 * n_tiles_x + u_x0, uoffsets, m_cap)
        w_e = _expand(jnp.maximum(u_w, 1), uoffsets, m_cap)

    valid = e_idx < total
    k = e_idx - off_e                                  # rank inside rect
    tile = base_e + (k // w_e) * n_tiles_x + k % w_e
    tile = jnp.where(valid, tile, n_tiles)
    gidx = jnp.where(valid, gidx, n)                   # sentinel gaussian

    # --- per-tile histogram: 0/1 interval-indicator matmul on the MXU ---
    # count[ty,tx] = Σ_u [unit u covers (ty,tx)]; rect coverage is
    # separable, so the whole histogram is ind_yᵀ @ ind_x with 0/1
    # indicators — exact at any matmul precision (0/1 is exact in bf16,
    # counts accumulate exactly in f32 below 2^24). Replaces the 4-corner
    # ±1 summed-area scatter + 2D cumsum: duplicate-index scatters at unit
    # size measured 8.2 ms on-chip (r4 bisect) vs MXU-trivial FLOPs here
    # (U·(TY+TX) indicator build is the only bandwidth). Empty units
    # (w or h = 0) have empty indicator intervals — no mask needed.
    tyv = jnp.arange(n_tiles_y, dtype=jnp.int32)[None, :]
    txv = jnp.arange(n_tiles_x, dtype=jnp.int32)[None, :]
    ind_y = ((tyv >= u_y0[:, None]) & (tyv < (u_y0 + u_h)[:, None])
             ).astype(jnp.float32)                     # (U, TY)
    ind_x = ((txv >= u_x0[:, None]) & (txv < (u_x0 + u_w)[:, None])
             ).astype(jnp.float32)                     # (U, TX)
    count_grid = jax.lax.dot_general(
        ind_y, ind_x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return UnitExpansion(tile=tile, gidx=gidx, counts=counts,
                         offsets=offsets, uoffsets=uoffsets, total=total,
                         count_grid=count_grid)


def bin_gaussians(mean2d: jnp.ndarray, depth: jnp.ndarray, radius: jnp.ndarray,
                  *, image_width: int, image_height: int,
                  tile_h: int, tile_w: int, m_cap: int,
                  align: int = 1,
                  rx: jnp.ndarray | None = None,
                  ry: jnp.ndarray | None = None,
                  sort_gaussians: bool = False,
                  pad_cap: int | None = None,
                  conic: jnp.ndarray | None = None,
                  t_cut: jnp.ndarray | None = None,
                  row_slots: int = 4) -> Binning:
    """Build the sorted (tile ‖ depth)-ordered entry list.

    All inputs should be stop-gradiented by the caller — ordering is not
    differentiated (CUDA reference likewise treats the sort as constant).

    With ``align > 1`` every tile's entry range starts at a multiple of
    ``align`` and is padded (sentinel entries) to a multiple of ``align``.
    The Pallas kernels require align == chunk: per-chunk DMAs then always
    start 128-lane-aligned and per-tile gradient writes never touch another
    tile's rows. Output arrays have static length m_cap + pad_cap, where
    ``pad_cap`` defaults to the worst case align·n_tiles; the expected
    padding is only ~align/2 per non-empty tile, so hosts right-size it
    from the reported ``num_padded`` (every kernel grid step and M-sized
    gather pass scales with this static extent). A frame whose padded
    layout outgrows pad_cap reports ``overflow`` like a pair overflow —
    content is garbage by contract, the host grows and re-renders.

    With ``sort_gaussians`` the per-entry depth key is replaced by the
    gaussian's depth rank (see module docstring); the returned ``perm``
    defines the gaussian order every per-gaussian output refers to.

    With ``conic`` (N,3) + ``t_cut`` (N,) rect expansion is replaced by
    per-tile-row ellipse culling (works with either depth-key mode): each
    gaussian
    becomes ``row_slots`` static sub-rects — single tile rows carrying the
    level-set ellipse's exact x-interval, plus one tail block for any
    remaining rows (see the expansion-units comment below). Conservative
    by construction: a strict subset of the rect pairs, every drop
    provably below the compositor's alpha floor, so the rendered image is
    unchanged while every M-sized pass shrinks with the pair count.
    """
    n = mean2d.shape[0]
    n_tiles_x = -(-image_width // tile_w)
    n_tiles_y = -(-image_height // tile_h)
    n_tiles = n_tiles_x * n_tiles_y

    if rx is None:
        rx = radius
    if ry is None:
        ry = radius

    perm = None
    if sort_gaussians:
        # N-sized depth sort; every per-gaussian array below is then in
        # depth order and gidx doubles as the depth key.
        _, perm = jax.lax.sort(
            (depth, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        mean2d = mean2d[perm]
        radius = radius[perm]
        rx = rx[perm]
        ry = ry[perm]
        if conic is not None:
            conic = conic[perm]
            t_cut = t_cut[perm]

    ex = _expand_units(mean2d, radius, rx, ry, conic=conic, t_cut=t_cut,
                       row_slots=row_slots, n_tiles_x=n_tiles_x,
                       n_tiles_y=n_tiles_y, tile_h=tile_h, tile_w=tile_w,
                       m_cap=m_cap)
    tile, gidx = ex.tile, ex.gidx
    counts, offsets = ex.counts, ex.offsets
    uoffsets, total = ex.uoffsets, ex.total
    overflow = jnp.maximum(total - m_cap, 0)
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)
    valid = e_idx < total

    tile_count = ex.count_grid.reshape(-1)
    # With overflow, truncation invalidates the histogram; clamp so
    # ranges stay memory-safe (overflow frames are garbage by contract).
    tile_count = jnp.minimum(tile_count, m_cap)
    tile_start = (jnp.cumsum(tile_count) - tile_count).astype(jnp.int32)

    # --- the entry sort (+ pads-in-sort aligned layout, align > 1) ---
    # (An alignment-free compositor — per-visit tables instead of padded
    # per-tile ranges — was scoped out: its static visit grid needs
    # m_cap/G + 2T steps vs the aligned m_cap/G + T, and the extra T steps'
    # fixed cost cancels the padding savings. The chunk-aligned layout
    # stays.)
    dkey = None
    if not sort_gaussians:
        # positive f32 ordering == int32 bit-pattern ordering (depth > 0);
        # per-UNIT values (slots repeat their gaussian's depth)
        dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
        if conic is not None:
            dbits = jnp.repeat(dbits, row_slots)
        dkey_e = _expand(dbits, uoffsets, m_cap)
        dkey = jnp.where(valid, dkey_e, jnp.iinfo(jnp.int32).max)

    if align > 1:
        if pad_cap is None:
            pad_cap = align * n_tiles
        pad_cap = min(-(-pad_cap // align) * align, align * n_tiles)
        padded_count = -(-tile_count // align) * align
        ends = jnp.cumsum(padded_count).astype(jnp.int32)
        padded_start = (ends - padded_count).astype(jnp.int32)
        m_out = m_cap + pad_cap
        num_padded = ends[-1]
        # Aligned layout via PADS-IN-SORT: synthesize pad_needed[t] sentinel
        # entries for tile t (sentinel sort keys place them after the
        # tile's real entries) and sort them WITH the real entries — the
        # sorted output IS the chunk-aligned layout. Replaces the
        # construction permutation scatter (measured 10.1 ms at the 1080p
        # bench, the largest single binning cost; tools/experiments/
        # align_ab.py) + the shift expansion with ~30% more sort rows.
        pad_needed = padded_count - tile_count               # (T,)
        total_pad = num_padded - jnp.sum(tile_count)
        # every pad must materialize or per-tile starts shift — exact
        # validity condition for this construction
        overflow = jnp.maximum(overflow, total_pad - pad_cap)
        pad_starts = (jnp.cumsum(pad_needed) - pad_needed).astype(jnp.int32)
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
        pad_tile = _expand(tids, pad_starts, pad_cap)
        pad_valid = jnp.arange(pad_cap, dtype=jnp.int32) < total_pad
        pad_tile = jnp.where(pad_valid, pad_tile, n_tiles)
        src_idx = jnp.arange(m_out, dtype=jnp.int32)
        tile_all = jnp.concatenate([tile, pad_tile])
        gidx_all = jnp.concatenate([gidx, jnp.full((pad_cap,), n, jnp.int32)])
        gbits = int(n).bit_length()                    # holds sentinel n too
        if sort_gaussians and ((n_tiles << gbits) | n) < 2 ** 31:
            # single packed key (tile ‖ depth-rank): 2 arrays instead of 4
            key_s, es2 = jax.lax.sort(
                ((tile_all << gbits) | gidx_all, src_idx), num_keys=1)
            gidx_aligned = key_s & ((1 << gbits) - 1)
        elif sort_gaussians:
            _, gidx_aligned, es2 = jax.lax.sort(
                (tile_all, gidx_all, src_idx), num_keys=2)
        else:
            dkey_all = jnp.concatenate(
                [dkey, jnp.full((pad_cap,), jnp.iinfo(jnp.int32).max,
                                jnp.int32)])
            _, _, gidx_aligned, es2 = jax.lax.sort(
                (tile_all, dkey_all, gidx_all, src_idx), num_keys=2)
        # presort entry → aligned slot (the renderer's gather-VJP map):
        # scatter aligned positions back through the sort's source payload;
        # pad sources (es2 ≥ m_cap) drop out of the m_cap-sized buffer
        inv_src = jnp.zeros((m_cap,), jnp.int32).at[es2].set(
            src_idx, mode="drop", unique_indices=True)
        # memory-safety clamp for overflow frames (see docstring)
        padded_start = jnp.minimum(padded_start, m_out - align)
        tile_count = jnp.minimum(tile_count, m_out - padded_start)
        return Binning(gidx_sorted=gidx_aligned, tile_sorted=None,
                       tile_start=padded_start, tile_count=tile_count,
                       num_pairs=total, overflow=overflow,
                       num_padded=num_padded,
                       inv_src=inv_src, g_offsets=offsets,
                       g_counts=counts, perm=perm)

    if sort_gaussians:
        gbits = int(n).bit_length()                    # holds sentinel n too
        if ((n_tiles << gbits) | n) < 2 ** 31:
            key_s, e_s = jax.lax.sort(((tile << gbits) | gidx, e_idx),
                                      num_keys=1)
            tile_s = key_s >> gbits
            gidx_s = key_s & ((1 << gbits) - 1)
        else:
            tile_s, gidx_s, e_s = jax.lax.sort((tile, gidx, e_idx),
                                               num_keys=2)
    else:
        tile_s, _, gidx_s, e_s = jax.lax.sort((tile, dkey, gidx, e_idx),
                                              num_keys=2)
    return Binning(gidx_sorted=gidx_s, tile_sorted=tile_s,
                   tile_start=tile_start, tile_count=tile_count,
                   num_pairs=total, overflow=overflow,
                   perm=perm)


# --------------------------------------------------- slab-streamed binning
#
# For N past what per-chip N-proportional arrays allow (SCALING.md: the
# geometry all_gather + int expansion columns set a ~250M-gaussian ceiling
# on 16 GB chips), binning itself streams: the caller (parallel/sharded.py)
# ppermutes each chip's (N/D)-row geometry slab around the ring, expands
# each slab into (tile, raw-depth-key) entries at a per-slab cap, then ONE
# merged sort of the concatenated lists reproduces the global
# (tile ‖ depth) order — raw f32 depth bits order identically to the
# global depth rank, so no N-sized sort (and no N-sized perm/rank_inv)
# ever materializes. Peak geometry per chip: O(N/D).
#
# Entries of equal (tile, depth-bits) keep concatenation order, which is
# ring-ARRIVAL order (chip-dependent). Each pixel is composited by exactly
# one chip, so images stay self-consistent; exact-tie ordering vs the
# single-list path may differ (ties have measure zero for real depths).


class SlabExpansion(NamedTuple):
    """One geometry slab's expansion (``expand_slab``): the per-slab half
    of slab-streamed binning. Concatenate D of these (``merge_slab_
    binning``) to get the global entry list."""
    tile: jnp.ndarray         # (m_slab,) int32; sentinel n_tiles past total
    dkey: jnp.ndarray         # (m_slab,) int32 f32-depth bits; sentinel MAX
    gidx: jnp.ndarray         # (m_slab,) int32 GLOBAL storage row id;
    #   sentinel = the caller's sentinel_row (zero packed row)
    counts: jnp.ndarray       # (n_loc,) entries per slab gaussian
    offsets: jnp.ndarray      # (n_loc,) ABSOLUTE presort starts
    #   (slab_base_entry + local exclusive offsets)
    count_grid: jnp.ndarray   # (ty, tx) per-tile counts (additive)
    total: jnp.ndarray        # () int32 real entries of this slab
    overflow: jnp.ndarray     # () int32 entries dropped past m_slab


def expand_slab(mean2d, depth, radius, rx, ry, *, row_base, slab_base_entry,
                sentinel_row, image_width: int, image_height: int,
                tile_h: int, tile_w: int, m_slab: int,
                conic=None, t_cut=None, row_slots: int = 4) -> SlabExpansion:
    """Expand ONE (n_loc)-row geometry slab into at most ``m_slab``
    (tile, depth-key, storage-row) entries. ``row_base`` is the slab
    owner's first global storage row (may be traced — it only enters
    arithmetic); ``slab_base_entry`` positions this slab's presort range
    [slab_base_entry, slab_base_entry + m_slab) in the concatenated
    layout. Depth must be > 0 (positive-f32 bit ordering)."""
    n_tiles_x = -(-image_width // tile_w)
    n_tiles_y = -(-image_height // tile_h)
    ex = _expand_units(mean2d, radius, rx, ry, conic=conic, t_cut=t_cut,
                       row_slots=row_slots, n_tiles_x=n_tiles_x,
                       n_tiles_y=n_tiles_y, tile_h=tile_h, tile_w=tile_w,
                       m_cap=m_slab)
    valid = jnp.arange(m_slab, dtype=jnp.int32) < ex.total
    dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    if conic is not None:
        dbits = jnp.repeat(dbits, row_slots)
    dkey = jnp.where(valid, _expand(dbits, ex.uoffsets, m_slab),
                     jnp.iinfo(jnp.int32).max)
    gidx = jnp.where(valid, row_base + ex.gidx, sentinel_row)
    return SlabExpansion(
        tile=ex.tile, dkey=dkey, gidx=gidx, counts=ex.counts,
        offsets=slab_base_entry + ex.offsets, count_grid=ex.count_grid,
        total=ex.total, overflow=jnp.maximum(ex.total - m_slab, 0))


def merge_slab_binning(slabs, *, sentinel_row: int, image_width: int,
                       image_height: int, tile_h: int, tile_w: int,
                       align: int, pad_cap: int | None = None) -> Binning:
    """One merged sort + chunk-aligned layout over D concatenated slab
    expansions — the global half of slab-streamed binning. Returned
    ``g_offsets``/``g_counts`` are the slabs' tables concatenated in the
    SAME order as ``slabs`` (the ring-gather backward indexes them
    per-slab); ``perm`` is None (storage ids are already global)."""
    n_tiles_x = -(-image_width // tile_w)
    n_tiles_y = -(-image_height // tile_h)
    n_tiles = n_tiles_x * n_tiles_y
    m_slab = slabs[0].tile.shape[0]
    m_cap = m_slab * len(slabs)
    e_idx = jnp.arange(m_cap, dtype=jnp.int32)

    tile = jnp.concatenate([s.tile for s in slabs])
    dkey = jnp.concatenate([s.dkey for s in slabs])
    gidx = jnp.concatenate([s.gidx for s in slabs])
    total = sum(s.total for s in slabs)
    overflow = sum(s.overflow for s in slabs)
    grid = sum(s.count_grid for s in slabs)
    g_offsets = jnp.concatenate([s.offsets for s in slabs])
    g_counts = jnp.concatenate([s.counts for s in slabs])

    tile_count = jnp.minimum(grid.reshape(-1), m_cap)
    tile_start = (jnp.cumsum(tile_count) - tile_count).astype(jnp.int32)

    tile_s, _, gidx_s, e_s = jax.lax.sort((tile, dkey, gidx, e_idx),
                                          num_keys=2)

    assert align > 1, "slab-streamed binning always feeds aligned kernels"
    if pad_cap is None:
        pad_cap = align * n_tiles
    pad_cap = min(-(-pad_cap // align) * align, align * n_tiles)
    padded_count = -(-tile_count // align) * align
    ends = jnp.cumsum(padded_count).astype(jnp.int32)
    padded_start = (ends - padded_count).astype(jnp.int32)
    m_out = m_cap + pad_cap
    num_padded = ends[-1]
    shift_raw = padded_start - tile_start
    overflow = jnp.maximum(overflow, jnp.max(shift_raw) - pad_cap)
    shift = jnp.minimum(shift_raw, pad_cap)
    shift_e = _expand(shift, tile_start, m_cap)
    dest = e_idx + shift_e
    # unfilled aligned slots (inter-tile padding) point at the zero packed
    # row, same contract as bin_gaussians' sentinel fill
    gidx_aligned = jnp.full((m_out,), sentinel_row, jnp.int32).at[dest].set(
        gidx_s, mode="drop", unique_indices=True, indices_are_sorted=True)
    inv_src = jnp.zeros((m_cap,), jnp.int32).at[e_s].set(
        dest, mode="drop", unique_indices=True)
    padded_start = jnp.minimum(padded_start, m_out - align)
    tile_count = jnp.minimum(tile_count, m_out - padded_start)
    return Binning(gidx_sorted=gidx_aligned, tile_sorted=None,
                   tile_start=padded_start, tile_count=tile_count,
                   num_pairs=total, overflow=overflow,
                   num_padded=num_padded, inv_src=inv_src,
                   g_offsets=g_offsets, g_counts=g_counts, perm=None)


def chunk_tables(tile_start, tile_count, *, n_tiles: int, chunk: int,
                 n_chunks: int, count_clamp=None, with_dma: bool = False):
    """Per-chunk (tile, rank0, count) tables from the aligned per-tile
    ranges, via diff-scatter + cumsum (no gathers — TPU-measured: M-sized
    gathers cost ~70 ms, cumsums ~5 ms). Shared by the Pallas compositor
    (scalar-prefetch tables) and the XLA oracle compositor (scan xs).

    The chunk→tile layout always follows ``tile_count`` (it determined the
    aligned buffer layout); ``count_clamp`` (T,) only lowers the per-chunk
    effective count (used by the backward to skip past-last-contributor
    chunks) without disturbing the layout.

    With ``with_dma`` two extras are returned: ``dma`` (n_chunks,) — the
    last *live* chunk index ≤ i (live = has entries under the effective
    count) — and the scalar ``end`` (first tail chunk). Dead chunks never
    read their entry block, so pointing their input index_map at ``dma[i]``
    makes Mosaic's revisit logic skip the block DMA entirely (consecutive
    equal indices → no re-fetch); measured, the per-chunk DMA machinery is
    about half the kernel's fixed cost."""
    start_chunk = tile_start // chunk                       # (T,)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ct = _expand(tids, start_chunk, n_chunks)               # chunk → tile
    first = _expand(start_chunk, start_chunk, n_chunks)
    ci = jnp.arange(n_chunks, dtype=jnp.int32)
    rank0 = (ci - first) * chunk                            # chunk → rank0
    eff = tile_count if count_clamp is None else \
        jnp.minimum(tile_count, count_clamp)
    cc = _expand(eff, start_chunk, n_chunks)
    # Chunks outside the layout's real extent → sentinel tile n_tiles.
    # ``tile_start`` may be a slice of a larger global layout with a nonzero
    # origin (tile-sharded rendering passes each shard's slice of the global
    # aligned buffer), so the live region is [begin, begin + total), not
    # [0, total): chunks before ``begin`` belong to other shards' tiles and
    # must be skipped too, or they'd overwrite tile ct[i]'s (=0's) output.
    used = -(-tile_count // chunk) * chunk
    begin = start_chunk[0]
    end = begin + (jnp.sum(used) // chunk).astype(jnp.int32)
    is_tail = (ci < begin) | (ci >= end)
    ct = jnp.where(is_tail, n_tiles, ct)
    cc = jnp.where(is_tail, 0, cc)
    if not with_dma:
        return (ct.astype(jnp.int32), rank0.astype(jnp.int32),
                cc.astype(jnp.int32))
    live = rank0 < cc                       # tails have cc == 0
    dma = jax.lax.cummax(jnp.where(live, ci, 0))
    return (ct.astype(jnp.int32), rank0.astype(jnp.int32),
            cc.astype(jnp.int32), dma.astype(jnp.int32), end)
