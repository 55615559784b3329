"""Reference-exact differentiable rasterizer (pure JAX, whole-image).

This is the **oracle**: a direct, vectorized transcription of the reference
CUDA pipeline's math (forward.cu renderCUDA at :261-409 composed with the
preprocess at :156-256), written as ordinary differentiable JAX so that
``jax.grad`` reproduces the hand-written CUDA backward (backward.cu). It is
O(P · H · W) — used for golden tests and small scenes; the production path is
the tiled/Pallas rasterizer in ``fourdgs_tpu.ops.rasterize``, which must be
allclose to this.

Blending semantics transcribed exactly (forward.cu:300-379):
  - per pixel, Gaussians processed in (tile, depth, index) sort order
  - power = −½(A·dx² + C·dy²) − B·dx·dy; skip if power > 0
  - α = min(0.99, opacity·exp(power)); skip if α < 1/255
  - stop (and skip the stopping Gaussian) once T·(1−α) < 1e-4
  - out = Σ c·α·T  + T_final·bg;   depth = Σ z·α·T
  - a Gaussian only contributes to pixels inside its tile rect

The T-stop is expressed through the inclusive transmittance product
T̃_i = Π_{j≤i}(1−α_j) (monotone non-increasing): contribution i is kept iff
T̃_i ≥ 1e-4, which is exactly the CUDA early-exit condition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops.preprocess import PreprocessOut, preprocess


def _cap_alpha(x: jnp.ndarray) -> jnp.ndarray:
    """α = min(0.99, x) in value, identity in gradient.

    The CUDA backward does not gate gradients on the 0.99 cap
    (backward.cu:478-487 recomputes G=exp(power) and uses dα/dopacity = G
    unconditionally), so the straight-through estimator here makes autodiff
    match the reference backward bit-for-bit in the capped case.
    """
    return x + jax.lax.stop_gradient(jnp.minimum(x, C.ALPHA_CAP) - x)


def _pixel_alpha(
    means2d: jnp.ndarray,  # [G,2]
    conic: jnp.ndarray,    # [G,3]
    opacity: jnp.ndarray,  # [G]
    pix: jnp.ndarray,      # [N,2] pixel centers
) -> jnp.ndarray:
    """α for every (gaussian, pixel) pair → [G, N]; zero where skipped."""
    d = pix[None, :, :] - means2d[:, None, :]          # [G,N,2]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = _cap_alpha(opacity[:, None] * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= C.ALPHA_FLOOR)
    return jnp.where(keep, alpha, 0.0)


class RasterOut(NamedTuple):
    color: jnp.ndarray    # [3,H,W]
    depth: jnp.ndarray    # [1,H,W]
    alpha: jnp.ndarray    # [1,H,W] accumulated opacity (1 − final_T)
    radii: jnp.ndarray    # [P] int32
    means2d: jnp.ndarray  # [P,2] pixel-space centers (for densify stats)


def rasterize_reference(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,   # [P] or [P,1], post-sigmoid
    shs: jnp.ndarray,         # [P,K,3]
    camera_center: jnp.ndarray,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    bg: jnp.ndarray,                       # [3]
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    alive_mask: jnp.ndarray | None = None,
    chunk: int = 128,
) -> RasterOut:
    """Render one camera. Differentiable w.r.t. all Gaussian inputs.

    ``means2d_offset`` is an optional all-zeros [P,2] carrier whose gradient
    equals dL/d(pixel-space means2D) — the analog of the reference's
    ``screenspace_points`` retain_grad trick
    (gaussian_renderer/__init__.py:26-30) used for densification stats.
    """
    opac = opacities.reshape(-1)
    pre: PreprocessOut = preprocess(
        means3d, scales, rotations, shs,
        camera_center, world_view, full_proj,
        tanfovx, tanfovy, width, height, sh_degree,
        cov3d_precomp=cov3d_precomp, colors_precomp=colors_precomp,
        alive=alive_mask,
    )
    means2d = pre.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    P = means3d.shape[0]
    n_pad = (-P) % chunk
    total = P + n_pad

    # Depth-sort with culled Gaussians pushed to the end. Stable sort keeps
    # the reference's tie order (CUB radix sort is stable on equal keys).
    alive = pre.radii > 0
    sort_key = jnp.where(alive, pre.depths, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)

    def gather(x, fill=0.0):
        g = jnp.take(x, order, axis=0)
        if n_pad:
            pad_width = [(0, n_pad)] + [(0, 0)] * (g.ndim - 1)
            g = jnp.pad(g, pad_width, constant_values=fill)
        return g

    s_xy = gather(means2d)
    s_conic = gather(pre.conic)
    s_rgb = gather(pre.rgb)
    s_depth = gather(pre.depths)
    s_opac = gather(jnp.where(alive, opac, 0.0))
    s_tmin = gather(pre.tile_min, fill=0)
    s_tmax = gather(pre.tile_max, fill=0)

    # Pixel grid; pixel center convention pixf = (x, y) as floats
    # (forward.cu:286: pixf = {x, y}).
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    pix = jnp.stack(
        [jnp.tile(xs, height), jnp.repeat(ys, width)], axis=-1
    )  # [N,2] row-major
    pix_tile = jnp.stack(
        [(pix[:, 0] // C.TILE_X).astype(jnp.int32),
         (pix[:, 1] // C.TILE_Y).astype(jnp.int32)],
        axis=-1,
    )
    N = width * height

    def step(carry, xs_chunk):
        T, col, dep = carry
        xy, conic, rgb, z, op, tmin, tmax = xs_chunk
        alpha = _pixel_alpha(xy, conic, op, pix)  # [G,N]
        # Tile-rect membership: CUDA only blends a Gaussian into tiles of its
        # rect (duplicateWithKeys, rasterizer_impl.cu:70-111).
        in_rect = (
            (pix_tile[None, :, 0] >= tmin[:, None, 0])
            & (pix_tile[None, :, 0] < tmax[:, None, 0])
            & (pix_tile[None, :, 1] >= tmin[:, None, 1])
            & (pix_tile[None, :, 1] < tmax[:, None, 1])
        )
        alpha = jnp.where(in_rect, alpha, 0.0)

        one_minus = 1.0 - alpha
        t_incl = T[None, :] * jnp.cumprod(one_minus, axis=0)      # T̃ after i
        contrib = t_incl >= C.T_STOP
        t_excl = jnp.concatenate([T[None, :], t_incl[:-1]], axis=0)
        w = jnp.where(contrib, alpha * t_excl, 0.0)               # [G,N]
        col = col + jnp.einsum("gc,gn->cn", rgb, w)
        dep = dep + jnp.einsum("g,gn->n", z, w)
        # T advances only over contributing factors (stop freezes it).
        T_new = T * jnp.prod(jnp.where(contrib, one_minus, 1.0), axis=0)
        return (T_new, col, dep), None

    init = (
        jnp.ones((N,), jnp.float32),
        jnp.zeros((3, N), jnp.float32),
        jnp.zeros((N,), jnp.float32),
    )
    xs_seq = (
        s_xy.reshape(-1, chunk, 2),
        s_conic.reshape(-1, chunk, 3),
        s_rgb.reshape(-1, chunk, 3),
        s_depth.reshape(-1, chunk),
        s_opac.reshape(-1, chunk),
        s_tmin.reshape(-1, chunk, 2),
        s_tmax.reshape(-1, chunk, 2),
    )
    (T_fin, col, dep), _ = jax.lax.scan(step, init, xs_seq)

    color = (col + T_fin[None, :] * bg[:, None]).reshape(3, height, width)
    return RasterOut(
        color=color,
        depth=dep.reshape(1, height, width),
        alpha=(1.0 - T_fin).reshape(1, height, width),
        radii=pre.radii,
        means2d=pre.means2d,
    )
