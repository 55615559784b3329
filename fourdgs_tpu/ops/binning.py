"""Tile binning: duplicate Gaussians per overlapped tile, sort, compute ranges.

TPU-native equivalent of the CUDA binning stage (reference
rasterizer_impl.cu:33-138, 276-319: InclusiveSum → duplicateWithKeys →
RadixSort → identifyTileRanges). Differences by design:

- **Fixed shapes.** CUDA reads back the data-dependent ``num_rendered`` to size
  its key buffers (rasterizer_impl.cu:281-286) — a host sync and a dynamic
  allocation. Here the instance list has a static budget ``K`` (padded with
  sentinel keys); overflow is reported so the driver can grow the budget and
  recompile between steps, never inside one.
- **No 64-bit key packing.** ``jax.lax.sort`` sorts lexicographically on
  (tile_id, depth, instance-order) operand triples — same order as the CUDA
  radix sort on [tile<<32 | depth-bits] keys for positive depths, and stable
  on ties like CUB.
- The per-instance "which Gaussian does slot k belong to" inversion is a
  ``searchsorted`` over the tiles_touched prefix sum — the classic vectorized
  inverse of the CUDA thread-per-Gaussian duplication loop.

Everything here is integer bookkeeping — non-differentiable by construction;
gradients flow through the gathered per-instance payloads instead (see
fourdgs_tpu.ops.rasterize).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def fast_cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D int32 array via MXU triangular matmuls.

    XLA lowers jnp.cumsum over a few-hundred-k element axis to a serial
    log-pass chain (~1 ms at K=393k on v5e); two levels of [·,128] @
    [128,128] triangular matmuls do it in ~0.1 ms.

    PRECONDITION: exact only while the RUNNING TOTAL stays below 2^24
    (inputs are split losslessly by the f32 HIGHEST-precision bf16x6
    matmul and products against the 0/1 triangle accumulate in f32,
    integer-exact to 2^24 — covered by
    tests/test_pallas_raster.py::test_fast_cumsum_exact). Callers whose
    totals can exceed ~16.7M must compute grand totals with an exact
    int32 reduction (jnp.sum) instead of reading the last element.
    """
    n = x.shape[0]
    B = 128
    nb = -(-n // B)
    xf = jnp.pad(x.astype(jnp.float32), (0, nb * B - n)).reshape(nb, B)
    i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri_incl = (i <= j).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    within = jax.lax.dot_general(
        xf, tri_incl, (((1,), (0,)), ((), ())), precision=hi
    )                                           # [nb, B] within-row inclusive
    row_tot = within[:, -1]                     # [nb]
    if nb > B:
        row_pref = fast_cumsum_i32(row_tot.astype(jnp.int32)).astype(
            jnp.float32
        )
    else:
        pad = jnp.pad(row_tot, (0, B - nb)).reshape(1, B)
        row_pref = jax.lax.dot_general(
            pad, tri_incl, (((1,), (0,)), ((), ())), precision=hi
        )[0, :nb]
    shift = row_pref - row_tot                  # exclusive row prefix
    out = (within + shift[:, None]).reshape(nb * B)[:n]
    return out.astype(jnp.int32)


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray     # [K] int32 Gaussian index per sorted instance
    tile_id: jnp.ndarray      # [K] int32 sorted tile id (= sentinel for padding)
    tile_start: jnp.ndarray   # [T] int32 first instance index of each tile
    tile_stop: jnp.ndarray    # [T] int32 one-past-last instance index
    num_rendered: jnp.ndarray # [] int32 true instance count (may exceed K!)
    valid: jnp.ndarray        # [K] bool instance is real (not padding/overflow)
    # segment bookkeeping for the scatter-free gradient reduction
    # (ops.rasterize._gathered_payload): pre-sort slot id per sorted
    # instance, per-DEPTH-RANK slot segment starts/counts, and the
    # depth-sort permutation (rank -> original gaussian). None in the
    # reference bin_gaussians path.
    slot: jnp.ndarray | None = None        # [K] int32
    seg_starts: jnp.ndarray | None = None  # [P] int32 (depth-rank order)
    seg_counts: jnp.ndarray | None = None  # [P] int32
    order: jnp.ndarray | None = None       # [P] int32 rank -> gaussian


def bin_gaussians(
    tile_min: jnp.ndarray,       # [P,2] int32 inclusive rect min (x,y)
    tile_max: jnp.ndarray,       # [P,2] int32 exclusive rect max
    tiles_touched: jnp.ndarray,  # [P] int32
    depths: jnp.ndarray,         # [P] f32 view-space z (sort key)
    grid_x: int,
    grid_y: int,
    budget: int,
) -> BinningOut:
    """Build the depth-sorted per-tile instance list with a static budget.

    Instances beyond ``budget`` are dropped (check ``num_rendered`` against
    ``budget`` to detect). Padding instances carry tile_id == grid_x*grid_y
    (one past the last real tile) so they sort to the end and fall outside
    every tile's [start, stop) range.
    """
    P = tiles_touched.shape[0]
    T = grid_x * grid_y
    sentinel_tile = jnp.int32(T)

    depths = jax.lax.stop_gradient(depths)
    offsets = jnp.cumsum(tiles_touched)            # inclusive prefix sum
    num_rendered = offsets[-1] if P > 0 else jnp.int32(0)
    starts = offsets - tiles_touched               # exclusive prefix sum

    k = jnp.arange(budget, dtype=jnp.int32)
    # slot k belongs to the Gaussian whose [start, offset) interval contains k
    g = jnp.searchsorted(offsets, k, side="right").astype(jnp.int32)
    in_range = k < num_rendered
    g_safe = jnp.where(in_range, g, 0)

    local = k - jnp.take(starts, g_safe)
    tmin = jnp.take(tile_min, g_safe, axis=0)
    tmax = jnp.take(tile_max, g_safe, axis=0)
    rect_w = jnp.maximum(tmax[:, 0] - tmin[:, 0], 1)
    # Row-major enumeration of the rect (y outer) matches duplicateWithKeys'
    # double loop (rasterizer_impl.cu:84-101).
    tx = tmin[:, 0] + local % rect_w
    ty = tmin[:, 1] + local // rect_w
    tile = ty * grid_x + tx

    tile = jnp.where(in_range, tile, sentinel_tile).astype(jnp.int32)
    depth_k = jnp.where(in_range, jnp.take(depths, g_safe), jnp.inf)

    # Lexicographic (tile, depth, slot-order) sort — slot order preserves the
    # duplication order so ties behave like CUB's stable radix sort.
    tile_s, _, _, g_s, valid_s = jax.lax.sort(
        (tile, depth_k.astype(jnp.float32), k, g_safe, in_range), num_keys=3
    )

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)

    return BinningOut(
        gauss_id=g_s,
        tile_id=tile_s,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_rendered=num_rendered.astype(jnp.int32),
        valid=valid_s,
    )


def _select_bit(mask: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Position of the ``rank``-th (0-based) set bit of each uint32 mask.

    5-step binary reduction (no data-dependent loop): at each step, if the
    low ``w`` bits hold ≤ rank set bits, skip past them. Undefined (but
    in-range) when rank ≥ popcount(mask) — callers gate on validity.
    ``mask`` may be uint32 or a bit-pattern-carrying int32.
    """
    m = (mask if mask.dtype == jnp.uint32
         else jax.lax.bitcast_convert_type(mask, jnp.uint32))
    r = rank.astype(jnp.uint32)
    pos = jnp.zeros_like(m)
    for w in (16, 8, 4, 2, 1):
        low = m & jnp.uint32((1 << w) - 1)
        c = jax.lax.population_count(low)
        go_hi = c <= r
        r = r - jnp.where(go_hi, c, 0)
        pos = pos + jnp.where(go_hi, jnp.uint32(w), 0)
        m = jnp.where(go_hi, m >> w, low)
    return pos.astype(jnp.int32)


_MASK_CELLS = 32  # rect cells representable in the per-Gaussian cull bitmask


def _rect_cull_mask(tile_min, tile_max, tiles_touched, means2d, lam_min,
                    cull_c, tile_row_offset, tile_row_stride=1):
    """Per-Gaussian bitmask of rect cells that survive the ellipse-vs-tile
    test, and the resulting exact tiles_touched.

    The test (exact-safe): ½·dᵀ·conic·d ≥ ½·λmin·‖d‖², so if the
    1-pixel-dilated tile box is farther from the mean than √(2c/λmin), no
    pixel of the tile reaches α = 1/255 and the blend kernel's own α-floor
    gate (forward.cu:346-349) would zero the instance — culling only removes
    dead work. The dilation absorbs bf16 payload rounding of mean/conic.

    Culling BEFORE slot allocation (vs the previous post-sort marking) means
    dead corner tiles consume no instance budget at all: every downstream
    K-length op (sort, payload gather, blend DMA, gradient scatter) shrinks
    to true post-cull demand. Rects larger than 32 cells (rare: >3-tile
    radius) fall back to the uncalled full rect (mask unused, exact too).

    Returns (mask u32 [P], big bool [P], tiles i32 [P]).
    """
    from fourdgs_tpu.ops import constants as _C

    area = tiles_touched
    rect_w = jnp.maximum(tile_max[:, 0] - tile_min[:, 0], 1)
    mx = jax.lax.stop_gradient(means2d[:, 0])
    my = jax.lax.stop_gradient(means2d[:, 1])
    lam = jax.lax.stop_gradient(lam_min)
    cc = jax.lax.stop_gradient(cull_c)
    row_off = jnp.asarray(tile_row_offset, jnp.int32)
    row_stride = jnp.int32(tile_row_stride)

    mask = jnp.zeros(area.shape, jnp.uint32)
    for j in range(_MASK_CELLS):
        jy = j // rect_w
        jx = j - jy * rect_w
        tx = tile_min[:, 0] + jx
        ty = tile_min[:, 1] + jy
        px0 = (tx * _C.TILE_X).astype(jnp.float32) - 1.0
        py0 = ((ty * row_stride + row_off) * _C.TILE_Y).astype(
            jnp.float32) - 1.0
        dx = mx - jnp.clip(mx, px0, px0 + (_C.TILE_X + 1.0))
        dy = my - jnp.clip(my, py0, py0 + (_C.TILE_Y + 1.0))
        live = (j < area) & ~(0.5 * lam * (dx * dx + dy * dy) > cc)
        mask = mask | (live.astype(jnp.uint32) << j)
    big = area > _MASK_CELLS
    tiles = jnp.where(
        big, area, jax.lax.population_count(mask).astype(jnp.int32)
    )
    return mask, big, tiles


def bin_gaussians_fast(
    tile_min: jnp.ndarray,
    tile_max: jnp.ndarray,
    tiles_touched: jnp.ndarray,
    depths: jnp.ndarray,
    grid_x: int,
    grid_y: int,
    budget: int,
    means2d: jnp.ndarray | None = None,   # [P,2] pixel centers (pre-slot cull)
    lam_min: jnp.ndarray | None = None,   # [P] conic min eigenvalue
    cull_c: jnp.ndarray | None = None,    # [P] ln(255·op)
    tile_row_offset=0,
    tile_row_stride: int = 1,
) -> BinningOut:
    """Single-key binning: pre-sort Gaussians by depth, then stable-sort
    instances by tile id only.

    The lexicographic (tile, depth) sort in ``bin_gaussians`` is the TPU
    bottleneck (XLA's comparator sort scales with operand count). Observation:
    if Gaussians are depth-sorted *before* duplication, the instance stream is
    already depth-ordered, so a **stable** sort on the tile id alone yields
    exactly the CUDA (tile, depth)-sorted order — one int32 key + one int32
    payload instead of three keys + two payloads. Ties in depth resolve by
    original index, matching CUB's stable radix sort.

    Per-instance op count is the TPU cost model here: every K-length gather/
    scatter/cumsum costs milliseconds at production budgets regardless of row
    width, so the slot bookkeeping is fused into ONE packed [P,6] table
    gathered once per slot, and the sort carries the final gauss_id directly
    (profiled on v5e: 9 separate K-ops ≈ 28 ms → 4 K-ops ≈ 10 ms).

    When (means2d, lam_min, cull_c) are given, the exact ellipse-vs-tile
    cull runs BEFORE slot allocation (see :func:`_rect_cull_mask`): dead
    corner cells of each rect consume no budget, ``num_rendered`` reports
    post-cull demand, and every K-length op downstream shrinks with it.
    """
    P = tiles_touched.shape[0]
    T = grid_x * grid_y
    sentinel_tile = jnp.int32(T)

    do_cull = means2d is not None and lam_min is not None
    if do_cull:
        cmask, cbig, tiles_touched = _rect_cull_mask(
            tile_min, tile_max, tiles_touched, means2d, lam_min, cull_c,
            tile_row_offset, tile_row_stride,
        )

    depths = jax.lax.stop_gradient(depths)
    order = jnp.argsort(
        jnp.where(tiles_touched > 0, depths, jnp.inf), stable=True
    ).astype(jnp.int32)
    tt_s = jnp.take(tiles_touched, order)
    tmin_s = jnp.take(tile_min, order, axis=0)
    tmax_s = jnp.take(tile_max, order, axis=0)

    offsets = fast_cumsum_i32(tt_s)
    # exact to 2^31 (int32 reduction) even when the duplicated-instance
    # demand exceeds fast_cumsum_i32's 2^24 envelope; only `starts` used
    # below the (≪2^24) budget needs the prefix values themselves
    num_rendered = jnp.sum(tt_s) if P > 0 else jnp.int32(0)
    starts = offsets - tt_s

    # Segment ids via scatter + cumsum instead of searchsorted: XLA's
    # searchsorted is a serial binary-search loop (~60ms at this size on
    # v5e); marking each nonempty Gaussian's first slot and prefix-summing
    # is bandwidth-bound (<2ms). Empty Gaussians sorted to the end (inf
    # depth) keep the nonempty starts strictly increasing and unique.
    k = jnp.arange(budget, dtype=jnp.int32)
    nonempty = tt_s > 0
    head = jnp.zeros((budget,), jnp.int32).at[
        jnp.where(nonempty, starts, budget)
    ].add(1, mode="drop")
    rank = fast_cumsum_i32(head) - 1
    in_range = k < num_rendered
    rank_safe = jnp.where(in_range, rank, 0)

    # one fused per-slot gather: (start, tmin_x, tmin_y, rect_w, gauss_id)
    # (+ the cull bitmask and big-rect flag when culling)
    cols = [
        starts,
        tmin_s[:, 0],
        tmin_s[:, 1],
        jnp.maximum(tmax_s[:, 0] - tmin_s[:, 0], 1),
        order,
    ]
    if do_cull:
        cols += [
            jax.lax.bitcast_convert_type(jnp.take(cmask, order), jnp.int32),
            jnp.take(cbig, order).astype(jnp.int32),
        ]
    packed = jnp.stack(cols, axis=1)               # [P, 5 or 7] int32
    row = jnp.take(packed, rank_safe, axis=0)      # [K, 5 or 7]
    local = k - row[:, 0]
    rect_w = row[:, 3]
    if do_cull:
        # slot-local rank → surviving cell index: the local-th set bit of
        # the cull mask (identity for >32-cell rects, which keep full rects)
        cell = jnp.where(
            row[:, 6] != 0, local, _select_bit(row[:, 5], local)
        )
    else:
        cell = local
    tx = row[:, 1] + cell % rect_w
    ty = row[:, 2] + cell // rect_w
    tile = jnp.where(in_range, ty * grid_x + tx, sentinel_tile).astype(
        jnp.int32
    )

    # slot order is depth order (rank is non-decreasing in k), so a stable
    # single-key sort on tile yields the CUDA (tile, depth) order; the sort
    # carries the gauss id so no post-sort gather is needed
    gid_slot = jnp.where(in_range, row[:, 4], 0)
    tile_s, g_s, slot_s = jax.lax.sort(
        (tile, gid_slot, k), num_keys=1, is_stable=True
    )

    # ONE searchsorted over T+1 boundaries: start[t] = first slot with
    # tile ≥ t, and stop[t] = start[t+1] (integer keys make side='right' at
    # t equal side='left' at t+1) — halves the binary-search whiles.
    bounds = jnp.searchsorted(
        tile_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return BinningOut(
        gauss_id=g_s,
        tile_id=tile_s,
        tile_start=bounds[:T],
        tile_stop=bounds[1:],
        num_rendered=num_rendered.astype(jnp.int32),
        valid=tile_s < sentinel_tile,
        slot=slot_s,
        seg_starts=starts,
        seg_counts=tt_s,
        order=order,
    )
