"""Production rasterizer: preprocess → fast binning → Pallas tile blend.

The TPU-native counterpart of the full CUDA pipeline
(rasterizer_impl.cu:198-437) with the same public contract as
fourdgs_tpu.ops.tiled.rasterize_tiled, but:

- binning uses the single-key depth-presorted sort (ops.binning.bin_gaussians_fast)
- per-tile instance ranges are padded to CHUNK alignment so the Pallas
  kernels' DMA slices are lane-aligned and no two tiles share a chunk
- the blend runs as Pallas kernels over a flat attribute-major [16, K_pad]
  payload (ops.pallas_blend) — work ∝ actual instance count, custom VJP,
  no padded per-tile gathers
- gradients flow: blend VJP → per-instance dfeat → (select-gated) payload
  construction autodiff → deterministic segment-sum scatter to per-Gaussian
  arrays → preprocess autodiff. This replaces CUDA's atomicAdd accumulation
  (backward.cu:523-554) with a reproducible reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops import pallas_blend as PB
from fourdgs_tpu.ops.binning import bin_gaussians_fast
from fourdgs_tpu.ops.preprocess import preprocess
from fourdgs_tpu.ops.tiled import TiledRasterOut


def _seg_sums_compensated(ordered, starts, counts):
    """[K, C] rows in segment-contiguous order → [P, C] per-segment sums,
    at f32-scatter-level accuracy, with NO scatter.

    Within each 128-row block an inclusive prefix via an exact triangular
    MXU matmul; across blocks a COMPENSATED (hi, lo TwoSum) running sum;
    each segment's value is the difference of boundary prefixes taken
    piecewise — (hi_r − hi_{r−1}) + (lo_r − lo_{r−1}) + (w_r − w_{r−1}) —
    so the error carries only block-local magnitudes, not the global
    running total (a plain f32 cumsum difference was measured at ~13× the
    scatter's rounding noise; this form matches it within 1.5×).
    """
    K, Cc = ordered.shape
    B = 128
    nb = K // B
    xt = ordered.T.reshape(Cc, nb, B).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = (i <= j).astype(jnp.float32)
    hi_p = jax.lax.Precision.HIGHEST
    within = jax.lax.dot_general(
        xt, tri, (((2,), (0,)), ((), ())), precision=hi_p
    )                                               # [C, nb, B]
    tot = within[:, :, -1]                          # [C, nb]

    def dd_add(a, b):                               # Knuth TwoSum carry
        ah, al = a
        bh, bl = b
        s = ah + bh
        v = s - ah
        e = (ah - (s - v)) + (bh - v)
        return s, al + bl + e

    hi, lo = jax.lax.associative_scan(
        dd_add, (tot, jnp.zeros_like(tot)), axis=1
    )
    z = jnp.zeros_like(hi[:, :1])
    sh = jnp.concatenate([z, hi[:, :-1]], axis=1)   # exclusive block prefix
    sl = jnp.concatenate([z, lo[:, :-1]], axis=1)

    b = starts + counts - 1                         # last row per segment
    bb = jnp.clip(b, 0, K - 1)
    live = (b >= 0)[:, None]
    cw = jnp.where(live, jnp.take(within.reshape(Cc, K).T, bb, axis=0), 0.0)
    ch = jnp.where(live, jnp.take(sh.T, bb // B, axis=0), 0.0)
    cl = jnp.where(live, jnp.take(sl.T, bb // B, axis=0), 0.0)
    zrow = jnp.zeros((1, Cc), jnp.float32)
    return ((ch - jnp.concatenate([zrow, ch[:-1]]))
            + (cl - jnp.concatenate([zrow, cl[:-1]]))
            + (cw - jnp.concatenate([zrow, cw[:-1]])))


@jax.custom_vjp
def _gathered_payload(table, gid, slot, seg_starts, seg_counts, order):
    """feat [FEAT_ROWS, K] = table[gid].T with a SCATTER-FREE backward.

    The plain autodiff of this gather is a K-row scatter-add with duplicate
    indices into [P, FEAT_ROWS] — read-modify-write per random row,
    measured 4.6 ms at K=384k on v5e (the most expensive XLA op of the
    train step). This VJP exploits the binning structure instead: pre-sort
    SLOTS are contiguous per depth-ranked Gaussian, so

      d_table = permute(d_feat rows to slot order)   (one K-sort + gather)
                → compensated blockwise segment sums (_seg_sums_compensated)
                → un-permute depth rank → gaussian   (one P-sort + gather)

    — every step a sort/gather/matmul/scan with known cost, no scatter.
    """
    return jnp.take(table, gid, axis=0).T


def _gathered_payload_fwd(table, gid, slot, seg_starts, seg_counts, order):
    out = _gathered_payload(table, gid, slot, seg_starts, seg_counts, order)
    return out, (slot, seg_starts, seg_counts, order)


def _gathered_payload_bwd(res, d_feat):
    slot, seg_starts, seg_counts, order = res
    K = slot.shape[0]
    P = order.shape[0]
    d_rows = d_feat.T.astype(jnp.float32)           # [K, FEAT_ROWS]
    # CONTAINMENT: the compensated reduction carries a running prefix over
    # the whole K, so a single non-finite instance gradient (a degenerate
    # near-singular splat overflowing its conic/EWA gradient chain — the
    # same overflow the reference's f32 CUDA math has) would poison every
    # later segment and mass-NaN the training state in one step. CUDA's
    # atomicAdd confines such a value to its own Gaussian's slot; sanitize
    # rows to restore exactly that containment — finite values (every sane
    # gradient by ~45 orders of magnitude) pass through unchanged, the
    # offending Gaussian self-destructs and is culled. The clamp must
    # survive squaring AND summation into shared-parameter gradients
    # (Adam's second moment squares the deformation-MLP weight grads,
    # which SUM all P rows: (P·clamp)² must stay finite — at P=65536,
    # clamp 1e12 sums to 6.5e16, squares to 4e33; a 1e15 clamp overflowed
    # exactly there in a mass-overflow step).
    d_rows = jnp.clip(
        jnp.nan_to_num(d_rows, nan=0.0, posinf=1e12, neginf=-1e12),
        -1e12, 1e12,
    )
    # position of slot s in the tile-sorted order: argsort of the
    # (permutation) slot array — one K-sort instead of a scatter
    _, pos = jax.lax.sort(
        (slot, jnp.arange(K, dtype=jnp.int32)), num_keys=1
    )
    ordered = jnp.take(d_rows, pos, axis=0)         # slot-ordered rows
    seg = _seg_sums_compensated(ordered, seg_starts, seg_counts)
    # depth rank → original gaussian index (invert the order permutation)
    _, inv_order = jax.lax.sort(
        (order, jnp.arange(P, dtype=jnp.int32)), num_keys=1
    )
    d_table = jnp.take(seg, inv_order, axis=0).astype(d_feat.dtype)
    zero_of = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (d_table, zero_of(slot), zero_of(slot), zero_of(seg_starts),
            zero_of(seg_counts), zero_of(order))


_gathered_payload.defvjp(_gathered_payload_fwd, _gathered_payload_bwd)


def rasterize_pallas(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    camera_center: jnp.ndarray,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    bg: jnp.ndarray,
    instance_budget: int,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    interpret: bool = False,
    tile_row_offset=0,
    tile_rows: int | None = None,
    tile_row_stride: int = 1,
    payload_dtype=jnp.float32,
    tile_space: bool = False,
    ellipse_tile_cull: bool = False,
) -> TiledRasterOut:
    """Render one camera through the Pallas pipeline (differentiable).

    ``interpret=True`` runs the kernels under the Pallas interpreter (CPU CI).

    ``tile_space=True`` returns color/depth/alpha as per-tile pixel blocks
    [T, 256, C] instead of [C, H, W] images, skipping the tile→image
    transpose. The training loss runs entirely in tile space (the GT is
    tiled once, outside the gradient), which removes the transpose AND its
    backward re-tile from the hot path (~3 ms/step at 800×800 on v5e).
    """
    opac = opacities.reshape(-1)
    pre = preprocess(
        means3d, scales, rotations, shs,
        camera_center, world_view, full_proj,
        tanfovx, tanfovy, width, height, sh_degree,
        cov3d_precomp=cov3d_precomp, colors_precomp=colors_precomp,
        alive=alive, opacities=opac,
    )
    means2d = pre.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    table = build_table(pre, opac, means2d, payload_dtype)
    cull_kw = {}
    if ellipse_tile_cull:
        cull_kw = dict(
            means2d=jax.lax.stop_gradient(means2d),
            lam_min=pre.lam_min,
            cull_c=pre.cull_c,
        )
    return rasterize_from_table(
        table, pre.tile_min, pre.tile_max, pre.tiles_touched,
        jax.lax.stop_gradient(pre.depths), pre.radii, pre.means2d,
        width, height, bg, instance_budget,
        interpret=interpret,
        tile_row_offset=tile_row_offset,
        tile_rows=tile_rows,
        tile_row_stride=tile_row_stride,
        tile_space=tile_space,
        **cull_kw,
    )


def build_table(pre, opac, means2d, payload_dtype=jnp.float32):
    """Pack the per-Gaussian screen attributes into the [P, FEAT_ROWS]
    payload table (rows: x, y, conic a/b/c, opacity, r, g, b, depth, pad).

    This is the boundary the 'model'-sharded preprocess communicates across
    (parallel.trainer): each shard builds the table for its [P/N] slice and
    all-gathers it — 16 columns per Gaussian instead of the raw parameter +
    SH set — so deformation + preprocess compute scales 1/N while binning
    and blend stay local to the shard's tile rows.
    """
    P_n = means2d.shape[0]
    table = jnp.concatenate(
        [
            means2d,
            pre.conic,
            opac[:, None],
            pre.rgb,
            pre.depths[:, None],
            jnp.zeros((P_n, PB.FEAT_ROWS - 10), jnp.float32),
        ],
        axis=1,
    )  # [P, FEAT_ROWS]
    assert table.shape[1] == PB.FEAT_ROWS, (
        f"payload table width {table.shape[1]} != FEAT_ROWS {PB.FEAT_ROWS} "
        "(malformed shs/colors input?)"
    )
    return table.astype(payload_dtype)  # optional bf16: halves gather+DMA


def rasterize_from_table(
    table: jnp.ndarray,          # [P, FEAT_ROWS] payload (f32 or bf16)
    tile_min: jnp.ndarray,       # [P, 2] int32
    tile_max: jnp.ndarray,       # [P, 2] int32
    tiles_touched: jnp.ndarray,  # [P] int32
    depths: jnp.ndarray,         # [P] f32 (sort key; non-differentiable)
    radii: jnp.ndarray,          # [P] int32
    means2d_out: jnp.ndarray,    # [P, 2] reported means2d (differentiable)
    width: int,
    height: int,
    bg: jnp.ndarray,
    instance_budget: int,
    interpret: bool = False,
    tile_row_offset=0,
    tile_rows: int | None = None,
    tile_row_stride: int = 1,
    tile_space: bool = False,
    means2d=None,
    lam_min=None,
    cull_c=None,
) -> TiledRasterOut:
    """Binning + payload gather + Pallas blend from a packed table.

    The second half of :func:`rasterize_pallas`; gradients flow into
    ``table`` (and ``means2d_out`` passes through for the caller's carrier
    harvest). Under the sharded trainer the table arrives all-gathered over
    'model' and everything here is local to the shard's tile rows.
    """
    grid_x = (width + C.TILE_X - 1) // C.TILE_X
    grid_y = (height + C.TILE_Y - 1) // C.TILE_Y
    CH = PB.CHUNK
    # COMPACT layout: the budget covers true instance demand only (no
    # per-tile alignment padding — the kernels DMA CHUNK-aligned windows and
    # mask stray lanes). K must be a CHUNK multiple so window DMA never runs
    # past the buffer.
    K = -(-instance_budget // CH) * CH

    tile_min = jax.lax.stop_gradient(tile_min)
    tile_max = jax.lax.stop_gradient(tile_max)
    tiles_touched = jax.lax.stop_gradient(tiles_touched)
    if tile_rows is not None:
        # Tile-row-sharded path (the SP/CP analog, SURVEY.md §2.7): this
        # shard owns tile rows {offset + j·stride | j ∈ [0, tile_rows)}.
        # stride == 1 is a contiguous slab; stride == n_shards is the
        # INTERLEAVED assignment (shard s owns rows s, s+N, ...), which
        # load-balances the strong center-of-image skew of real scenes
        # (measured: the middle 1/2-slab of the bench scene holds 76% of
        # instances — a contiguous split runs at ~62% efficiency, the
        # interleaved one near-balanced). Rects are clipped to the owned
        # row set in local-j coordinates; everything downstream (binning,
        # blend, output) is purely local — the only cross-device
        # communication in the sharded train step is the parameter
        # gradient psum.
        off = jnp.asarray(tile_row_offset, jnp.int32)
        s = int(tile_row_stride)
        # local j covers global rows y = off + j·s intersecting
        # [tmin_y, tmax_y): j ∈ [ceil((tmin_y−off)/s), ceil((tmax_y−off)/s))
        tmin_y = jnp.clip(
            (tile_min[:, 1] - off + s - 1) // s, 0, tile_rows
        )
        tmax_y = jnp.clip(
            (tile_max[:, 1] - off + s - 1) // s, 0, tile_rows
        )
        tile_min = jnp.stack([tile_min[:, 0], tmin_y], axis=-1)
        tile_max = jnp.stack([tile_max[:, 0], tmax_y], axis=-1)
        tiles_touched = jnp.where(
            tmax_y > tmin_y,
            (tile_max[:, 0] - tile_min[:, 0]) * (tmax_y - tmin_y),
            0,
        ).astype(jnp.int32)
        grid_y = tile_rows
    T = grid_x * grid_y

    cull_kw = {}
    if means2d is not None and lam_min is not None:
        cull_kw = dict(
            means2d=jax.lax.stop_gradient(means2d),
            lam_min=lam_min,
            cull_c=cull_c,
            tile_row_offset=tile_row_offset,
            tile_row_stride=tile_row_stride,
        )
    bins = bin_gaussians_fast(
        tile_min, tile_max, tiles_touched,
        depths,
        grid_x, grid_y, K,
        **cull_kw,
    )
    tile_len = bins.tile_stop - bins.tile_start           # [T]

    # ONE row gather from the packed [P, 16] attribute table into the
    # attribute-major compact payload [16, K]. Padding slots carry
    # Gaussian 0's (finite) row; the kernels' [start, stop) lane gates make
    # them inert in the forward, and the backward's masked RMW accumulation
    # leaves their gradient rows exactly zero, so no per-slot select is
    # needed on either side.
    feat = _gathered_payload(
        table, bins.gauss_id, bins.slot, bins.seg_starts,
        bins.seg_counts, bins.order,
    )                                                    # [16, K]

    out5 = PB.blend_pallas(
        feat, bins.tile_start, bins.tile_stop,
        jnp.asarray([tile_row_offset, tile_row_stride], jnp.int32),
        bg.astype(jnp.float32),
        grid_x, T, K, interpret,
    )  # packed channel-major [T,5,256] = (r,g,b,depth,t_fin), bg composited

    if tile_space:
        # PACKED tile-space contract: color carries the full CHANNEL-MAJOR
        # [T, 5, 256] block (r, g, b, depth, t_fin) — lanes hold pixels, so
        # the block is dense in HBM (a [T,256,5] layout pads 5 → 128 lanes:
        # 25× physical inflation through the whole loss chain). The
        # training loss consumes it directly (channel-masked against a
        # 5-wide tiled GT) so no slice/pad pair ever materializes around
        # the custom VJP. depth and alpha are sliced views — DCE'd unless
        # actually used.
        return TiledRasterOut(
            color=out5,
            depth=out5[:, 3:4, :],
            alpha=1.0 - out5[:, 4:5, :],
            radii=radii,
            means2d=means2d_out,
            num_rendered=bins.num_rendered,
            max_tile_len=jnp.max(tile_len).astype(jnp.int32),
        )

    col = out5[:, 0:3, :]
    dep = out5[:, 3:4, :]
    t_fin = out5[:, 4:5, :]

    def untile(x, ch):  # x [T, ch, 256] → [ch, H, W]
        img = x.reshape(grid_y, grid_x, ch, C.TILE_Y, C.TILE_X)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            ch, grid_y * C.TILE_Y, grid_x * C.TILE_X
        )
        return img[:, :height, :width]

    return TiledRasterOut(
        color=untile(col, 3),
        depth=untile(dep, 1),
        alpha=untile(1.0 - t_fin, 1),
        radii=radii,
        means2d=means2d_out,
        num_rendered=bins.num_rendered,
        max_tile_len=jnp.max(tile_len).astype(jnp.int32),
    )
