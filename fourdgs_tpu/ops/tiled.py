"""Tiled rasterizer: fixed-budget binning + per-tile front-to-back blending.

The production TPU pipeline (equivalent of the CUDA tile pipeline,
rasterizer_impl.cu:198-339 forward / :343-437 backward), expressed with
jit-stable shapes:

  preprocess (ops.preprocess)  → per-Gaussian screen quantities     [P]
  bin_gaussians (ops.binning)  → depth-sorted per-tile instance list [K budget]
  payload gather               → per-instance xy/conic/color/depth   [K]
  per-tile gather              → [T, L] padded slices of the sorted list
  blend (this module)          → scan over L-chunks, vectorized over all
                                 tiles × 256 pixels; transmittance via
                                 in-chunk cumprod (no per-pixel serial loop)

The blend math is identical to the oracle (ops.reference): α cap/floor,
T-stop, background composite, depth accumulation. Autodiff through this module
reproduces the reference backward kernels (backward.cu:398-657) because every
instance payload is a differentiable gather and binning integers are
stop-gradiented: d-payload flows back through ``jnp.take`` as a deterministic
segment-sum scatter-add — the TPU-native replacement for CUDA's atomicAdd
accumulation (backward.cu:523-554).

Shapes are static given (width, height, instance_budget, tile_budget); the
trainer grows budgets (with recompilation) only when ``num_rendered`` or
``max_tile_len`` report overflow — the TPU answer to the CUDA side's dynamic
``num_rendered`` readback (rasterizer_impl.cu:281-286).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops.binning import BinningOut, bin_gaussians
from fourdgs_tpu.ops.preprocess import PreprocessOut, preprocess


class TiledRasterOut(NamedTuple):
    color: jnp.ndarray         # [3,H,W]
    depth: jnp.ndarray         # [1,H,W]
    alpha: jnp.ndarray         # [1,H,W]
    radii: jnp.ndarray         # [P] int32
    means2d: jnp.ndarray       # [P,2]
    num_rendered: jnp.ndarray  # [] int32 — compare against instance budget
    max_tile_len: jnp.ndarray  # [] int32 — compare against tile budget


def _cap_alpha(x):
    # min(0.99, x) value, identity gradient — see ops.reference._cap_alpha.
    return x + jax.lax.stop_gradient(jnp.minimum(x, C.ALPHA_CAP) - x)


def _tile_pixel_grid(grid_x: int, grid_y: int):
    """Pixel centers for every tile: [T, 256, 2] float32, row-major pixels."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tx = (t % grid_x).astype(jnp.float32) * C.TILE_X
    ty = (t // grid_x).astype(jnp.float32) * C.TILE_Y
    dy, dx = jnp.meshgrid(
        jnp.arange(C.TILE_Y, dtype=jnp.float32),
        jnp.arange(C.TILE_X, dtype=jnp.float32),
        indexing="ij",
    )
    off = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # [256,2]
    base = jnp.stack([tx, ty], axis=-1)                 # [T,2]
    return base[:, None, :] + off[None, :, :]


def blend_tiles(
    tile_xy: jnp.ndarray,     # [T, L, 2] per-tile padded instance centers
    tile_conic: jnp.ndarray,  # [T, L, 3]
    tile_rgb: jnp.ndarray,    # [T, L, 3]
    tile_depth: jnp.ndarray,  # [T, L]
    tile_opac: jnp.ndarray,   # [T, L]
    tile_mask: jnp.ndarray,   # [T, L] bool
    pix: jnp.ndarray,         # [T, 256, 2]
    bg: jnp.ndarray,          # [3]
    chunk: int = 256,
):
    """Front-to-back blend over padded per-tile lists. Returns per-tile images.

    Vectorized over (tiles × pixels); the only scan axis is the instance-list
    chunk dimension, with the per-chunk transmittance composed via cumprod —
    the associative-scan formulation of forward.cu:300-379's serial loop.
    """
    T, L = tile_mask.shape
    n_px = pix.shape[1]
    n_chunks = max(L // chunk, 1)
    assert L % chunk == 0, "tile budget must be a multiple of chunk"

    # Rematerialized per-chunk step: without this, autodiff saves every
    # [T, chunk, 256] intermediate (alpha, cumprods, weights) for backward —
    # tens of GB at production scale. With remat, backward recomputes the
    # chunk forward from the (small) payload slices + carry, the same
    # recompute-from-saved-state strategy as the reference CUDA backward
    # (backward.cu:398-557 re-walks the tile list from final_T).
    @jax.checkpoint
    def step(carry, xs):
        T_carry, col, dep = carry
        xy, conic, rgb, z, op, m = xs
        d = pix[:, None, :, :] - xy[:, :, None, :]          # [T,G,256,2]
        dx, dy = d[..., 0], d[..., 1]
        a = conic[..., 0:1]
        b = conic[..., 1:2]
        c = conic[..., 2:3]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = _cap_alpha(op[..., None] * jnp.exp(power))
        keep = (power <= 0.0) & (alpha >= C.ALPHA_FLOOR) & m[..., None]
        alpha = jnp.where(keep, alpha, 0.0)

        one_minus = 1.0 - alpha
        t_incl = T_carry[:, None, :] * jnp.cumprod(one_minus, axis=1)
        contrib = t_incl >= C.T_STOP
        t_excl = jnp.concatenate(
            [T_carry[:, None, :], t_incl[:, :-1, :]], axis=1
        )
        w = jnp.where(contrib, alpha * t_excl, 0.0)         # [T,G,256]
        col = col + jnp.einsum("tgc,tgn->tcn", rgb, w)
        dep = dep + jnp.einsum("tg,tgn->tn", z, w)
        T_new = T_carry * jnp.prod(
            jnp.where(contrib, one_minus, 1.0), axis=1
        )
        return (T_new, col, dep), None

    init = (
        jnp.ones((T, n_px), jnp.float32),
        jnp.zeros((T, 3, n_px), jnp.float32),
        jnp.zeros((T, n_px), jnp.float32),
    )
    xs = (
        tile_xy.reshape(T, n_chunks, chunk, 2).swapaxes(0, 1),
        tile_conic.reshape(T, n_chunks, chunk, 3).swapaxes(0, 1),
        tile_rgb.reshape(T, n_chunks, chunk, 3).swapaxes(0, 1),
        tile_depth.reshape(T, n_chunks, chunk).swapaxes(0, 1),
        tile_opac.reshape(T, n_chunks, chunk).swapaxes(0, 1),
        tile_mask.reshape(T, n_chunks, chunk).swapaxes(0, 1),
    )
    (T_fin, col, dep), _ = jax.lax.scan(step, init, xs)
    col = col + T_fin[:, None, :] * bg[None, :, None]
    return col, dep, 1.0 - T_fin


def rasterize_tiled(
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
    tile_budget: int,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    chunk: int = 256,
) -> TiledRasterOut:
    """Render one camera through the tiled pipeline (differentiable).

    ``instance_budget``: static cap K on duplicated (Gaussian, tile) pairs.
    ``tile_budget``: static cap L on instances per tile (multiple of chunk).
    """
    opac = opacities.reshape(-1)
    pre: PreprocessOut = preprocess(
        means3d, scales, rotations, shs,
        camera_center, world_view, full_proj,
        tanfovx, tanfovy, width, height, sh_degree,
        cov3d_precomp=cov3d_precomp, colors_precomp=colors_precomp,
        alive=alive,
    )
    means2d = pre.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    grid_x = (width + C.TILE_X - 1) // C.TILE_X
    grid_y = (height + C.TILE_Y - 1) // C.TILE_Y
    T = grid_x * grid_y

    bins: BinningOut = bin_gaussians(
        jax.lax.stop_gradient(pre.tile_min),
        jax.lax.stop_gradient(pre.tile_max),
        jax.lax.stop_gradient(pre.tiles_touched),
        pre.depths,
        grid_x, grid_y, instance_budget,
    )

    # Differentiable payload gather into sorted-instance order.
    gid = bins.gauss_id
    inst_xy = jnp.take(means2d, gid, axis=0)
    inst_conic = jnp.take(pre.conic, gid, axis=0)
    inst_rgb = jnp.take(pre.rgb, gid, axis=0)
    inst_depth = jnp.take(pre.depths, gid, axis=0)
    inst_opac = jnp.take(opac, gid, axis=0)

    # Per-tile padded slices of the sorted instance list.
    L = tile_budget
    idx = bins.tile_start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    tile_len = bins.tile_stop - bins.tile_start
    mask = idx < bins.tile_stop[:, None]
    idx_c = jnp.minimum(idx, instance_budget - 1)
    tile_xy = jnp.take(inst_xy, idx_c, axis=0)
    tile_conic = jnp.take(inst_conic, idx_c, axis=0)
    tile_rgb = jnp.take(inst_rgb, idx_c, axis=0)
    tile_depth = jnp.take(inst_depth, idx_c, axis=0)
    tile_opac = jnp.take(inst_opac, idx_c, axis=0)
    mask = mask & jnp.take(bins.valid, idx_c, axis=0)

    pix = _tile_pixel_grid(grid_x, grid_y)
    col, dep, acc = blend_tiles(
        tile_xy, tile_conic, tile_rgb, tile_depth, tile_opac, mask,
        pix, bg, chunk=min(chunk, L),
    )

    # Tile images → full image, crop any padding to (height, width).
    def untile(x, ch):
        img = x.reshape(grid_y, grid_x, ch, C.TILE_Y, C.TILE_X)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            ch, grid_y * C.TILE_Y, grid_x * C.TILE_X
        )
        return img[:, :height, :width]

    return TiledRasterOut(
        color=untile(col, 3),
        depth=untile(dep[:, None, :], 1),
        alpha=untile(acc[:, None, :], 1),
        radii=pre.radii,
        means2d=pre.means2d,
        num_rendered=bins.num_rendered,
        max_tile_len=jnp.max(tile_len).astype(jnp.int32),
    )
