"""Per-Gaussian forward preprocess: project, EWA 2D covariance, conic, radius, color.

TPU-native equivalent of the CUDA preprocess kernel
(reference cuda_rasterizer/forward.cu:156-256 ``preprocessCUDA``): a fully
vectorized, differentiable function over [P] Gaussians. XLA fuses this into a
handful of elementwise VPU passes — no custom kernel needed. The backward pass
is plain autodiff, which reproduces the reference's hand-written backward
(backward.cu:20-396) because every clamp is expressed with
``jnp.maximum/clip`` whose subgradients match the CUDA clamp-gating masks
(e.g. x_grad_mul/y_grad_mul at backward.cu:175-176, SH clamp at
backward.cu:127-133).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.utils import quaternion as quat
from fourdgs_tpu.utils import sh as sh_lib


class PreprocessOut(NamedTuple):
    """Per-Gaussian screen-space quantities (all [P, ...])."""

    means2d: jnp.ndarray      # [P,2] pixel-space centers (differentiable)
    depths: jnp.ndarray       # [P] view-space z
    conic: jnp.ndarray        # [P,3] inverse 2D covariance (a, b, c)
    rgb: jnp.ndarray          # [P,3] view-dependent color (clamped >= 0)
    radii: jnp.ndarray        # [P] int32 screen radius in pixels (0 = culled)
    tile_min: jnp.ndarray     # [P,2] int32 inclusive tile rect min (x, y)
    tile_max: jnp.ndarray     # [P,2] int32 exclusive tile rect max (x, y)
    tiles_touched: jnp.ndarray  # [P] int32 number of tiles overlapped
    lam_min: jnp.ndarray | None = None  # [P] conic min eigenvalue (slot cull)
    cull_c: jnp.ndarray | None = None   # [P] ln(255·op) contribution bound


def project_points(means3d, world_view, full_proj):
    """World → (view-space point, pixel-space NDC point w/o pixel scaling).

    Returns p_view [P,3] and p_proj (NDC) [P,3]. Row-vector convention:
    p_hom = [p,1] @ M (matches transformPoint4x3/4x4, auxiliary.h:83-104).
    """
    ones = jnp.ones_like(means3d[..., :1])
    p_hom4 = jnp.concatenate([means3d, ones], axis=-1)
    p_view = p_hom4 @ world_view[:3 + 1, :3]  # [P,3]
    p_clip = p_hom4 @ full_proj               # [P,4]
    p_w = 1.0 / (p_clip[..., 3:4] + C.W_EPS)  # forward.cu:199
    p_proj = p_clip[..., :3] * p_w
    return p_view, p_proj


def compute_cov2d(p_view, cov6, world_view, tanfovx, tanfovy, focal_x, focal_y):
    """EWA splatting: 3D covariance → 2D screen covariance (forward.cu:74-113).

    ``jnp.clip`` on the x/z, y/z ratios reproduces the reference's clamp
    (forward.cu:84-87) and autodiff through it reproduces the clamp-gated
    backward (backward.cu:175-176). Adds the +0.3 low-pass dilation.

    ``cov6`` is the symmetric Σ as [P,6] components (xx, xy, xz, yy, yz, zz
    — quaternion.covariance_vec6); the whole contraction M Σ Mᵀ is written
    component-wise over [P]-vectors so XLA keeps everything in flat
    full-lane-utilization tiles (a [P,3,3] einsum tiles as T(4,128) — 9
    useful values per 512-slot tile — and was ~3 ms of the train step).

    Returns [P,3] packed (cov_xx, cov_xy, cov_yy).
    """
    tx, ty, tz = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    limx = C.EWA_CLAMP_FACTOR * tanfovx
    limy = C.EWA_CLAMP_FACTOR * tanfovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J: 2x3 Jacobian of the perspective projection at the (clamped) point.
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # R_w2c: world→view rotation. world_view is transposed (row-vector), so
    # the actual rotation matrix is its upper-left block transposed.
    R = world_view[:3, :3].T  # [3,3]

    # M = J @ R : two [P]-component row vectors (m0, m1)
    m00 = j00 * R[0, 0] + j02 * R[2, 0]
    m01 = j00 * R[0, 1] + j02 * R[2, 1]
    m02 = j00 * R[0, 2] + j02 * R[2, 2]
    m10 = j11 * R[1, 0] + j12 * R[2, 0]
    m11 = j11 * R[1, 1] + j12 * R[2, 1]
    m12 = j11 * R[1, 2] + j12 * R[2, 2]

    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    # s_r = m_r Σ ; cov2d_rc = s_r · m_c
    s00 = m00 * xx + m01 * xy + m02 * xz
    s01 = m00 * xy + m01 * yy + m02 * yz
    s02 = m00 * xz + m01 * yz + m02 * zz
    s10 = m10 * xx + m11 * xy + m12 * xz
    s11 = m10 * xy + m11 * yy + m12 * yz
    s12 = m10 * xz + m11 * yz + m12 * zz
    c_xx = s00 * m00 + s01 * m01 + s02 * m02 + C.COV2D_DILATION
    c_xy = s00 * m10 + s01 * m11 + s02 * m12
    c_yy = s10 * m10 + s11 * m11 + s12 * m12 + C.COV2D_DILATION
    return jnp.stack([c_xx, c_xy, c_yy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    camera_center: jnp.ndarray,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    scale_modifier: float = 1.0,
    cov3d_precomp: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> PreprocessOut:
    """Vectorized forward preprocess over all P Gaussians.

    Equivalent of preprocessCUDA (forward.cu:156-256): frustum cull, project,
    3D→2D covariance, conic inversion, screen radius + tile rect, SH→RGB.

    ``width``/``height`` must be static Python ints (they fix tile-grid
    shapes); matrices/fov are traced arrays so one compiled program serves all
    cameras of a given resolution.

    ``opacities`` (activated, [P]) enables **exact-safe tight tile rects**: a
    pixel contributes only if α = op·exp(-½ dᵀ·conic·d) ≥ 1/255
    (forward.cu:346-349), so every contributing pixel lies inside the ellipse
    {d : ½·dᵀ·conic·d ≤ ln(255·op)} whose axis-aligned extents are
    eₓ = √(2·ln(255·op)·cov_xx), e_y = √(2·ln(255·op)·cov_yy). Binning rects
    from this box are strictly tighter than the CUDA 3σ square
    (forward.cu:229-237) yet drop only zero-contribution instances, so the
    rendered image and all gradients are unchanged while the duplicated
    instance count (and thus sort/gather/blend work) shrinks ~2-4×.
    ``radii`` and the alive/visibility semantics still follow the reference's
    3σ square so densification statistics count the same Gaussians.
    """
    focal_y = height / (2.0 * tanfovy)
    focal_x = width / (2.0 * tanfovx)

    p_view, p_proj = project_points(means3d, world_view, full_proj)
    depths = p_view[..., 2]
    # Near-plane cull (auxiliary.h:139-164: in_frustum only tests view z).
    in_front = depths > C.NEAR_PLANE_Z

    if cov3d_precomp is not None:
        cov6 = (cov3d_precomp if cov3d_precomp.shape[-1] == 6
                else quat.sym_cov3d_to_vec(cov3d_precomp))
    else:
        cov6 = quat.covariance_vec6(scales, rotations, scale_modifier)
    cov2d = compute_cov2d(
        p_view, cov6, world_view, tanfovx, tanfovy, focal_x, focal_y
    )

    # Invert to conic (forward.cu:219-226). det==0 ⇒ culled.
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    # Screen radius from max eigenvalue (forward.cu:229-232).
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(C.DET_FLOOR, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(C.RADIUS_SIGMA * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Pixel-space center (differentiable — densification stats read its grad).
    means2d = jnp.stack(
        [
            ((p_proj[..., 0] + 1.0) * width - 1.0) * 0.5,
            ((p_proj[..., 1] + 1.0) * height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # Tile rect (auxiliary.h getRect): inclusive min, exclusive max, clamped.
    grid_x = (width + C.TILE_X - 1) // C.TILE_X
    grid_y = (height + C.TILE_Y - 1) // C.TILE_Y
    r = radius_f
    tmin_x = jnp.clip(
        jnp.floor((means2d[..., 0] - r) / C.TILE_X), 0, grid_x
    ).astype(jnp.int32)
    tmin_y = jnp.clip(
        jnp.floor((means2d[..., 1] - r) / C.TILE_Y), 0, grid_y
    ).astype(jnp.int32)
    tmax_x = jnp.clip(
        jnp.floor((means2d[..., 0] + r + C.TILE_X - 1) / C.TILE_X), 0, grid_x
    ).astype(jnp.int32)
    tmax_y = jnp.clip(
        jnp.floor((means2d[..., 1] + r + C.TILE_Y - 1) / C.TILE_Y), 0, grid_y
    ).astype(jnp.int32)

    valid = in_front & det_ok
    if alive is not None:
        # Fixed-capacity model: dead slots are culled before binning so they
        # consume no instance-budget (fourdgs_tpu.models.gaussians design).
        valid = valid & alive
    tiles_sq = jnp.where(
        valid, (tmax_x - tmin_x) * (tmax_y - tmin_y), 0
    ).astype(jnp.int32)
    # A Gaussian touching zero tiles is dead (rasterizer_impl.cu:207-209).
    alive = valid & (tiles_sq > 0)
    radii = jnp.where(alive, radius_f, 0.0).astype(jnp.int32)

    if opacities is not None:
        # Tight rect (see docstring): the per-axis extents of the α ≥ 1/255
        # ellipse, +0.5 px to absorb the rounding of the sqrt/log chain so
        # edge pixels are never shaved. The exclusive tile max is
        # ⌊(mean+ext)/TILE⌋+1 — a true cover of the fractional-coordinate box
        # (the reference's ⌊(v+TILE−1)/TILE⌋ under-covers fractional v, which
        # is part of its 3σ truncation). The ellipse rect is then
        # INTERSECTED with the reference's square rect so the instance set is
        # a subset of the CUDA one with only α<1/255 members removed: exact
        # output parity in both directions.
        op = jax.lax.stop_gradient(opacities.reshape(-1))
        c2 = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * (1.0 / C.ALPHA_FLOOR))
        c2 = jnp.maximum(c2, 0.0)
        ext_x = jnp.sqrt(c2 * jnp.maximum(a, 0.0)) + 0.5
        ext_y = jnp.sqrt(c2 * jnp.maximum(c, 0.0)) + 0.5
        mx = jax.lax.stop_gradient(means2d[..., 0])
        my = jax.lax.stop_gradient(means2d[..., 1])
        emin_x = jnp.clip(
            jnp.floor((mx - ext_x) / C.TILE_X), 0, grid_x
        ).astype(jnp.int32)
        emin_y = jnp.clip(
            jnp.floor((my - ext_y) / C.TILE_Y), 0, grid_y
        ).astype(jnp.int32)
        emax_x = jnp.clip(
            jnp.floor((mx + ext_x) / C.TILE_X) + 1, 0, grid_x
        ).astype(jnp.int32)
        emax_y = jnp.clip(
            jnp.floor((my + ext_y) / C.TILE_Y) + 1, 0, grid_y
        ).astype(jnp.int32)
        tmin_x = jnp.maximum(tmin_x, emin_x)
        tmin_y = jnp.maximum(tmin_y, emin_y)
        tmax_x = jnp.minimum(tmax_x, emax_x)
        tmax_y = jnp.minimum(tmax_y, emax_y)
        vis = alive & (op > C.ALPHA_FLOOR)
        tiles = jnp.where(
            vis & (tmax_x > tmin_x) & (tmax_y > tmin_y),
            (tmax_x - tmin_x) * (tmax_y - tmin_y),
            0,
        ).astype(jnp.int32)
    else:
        tiles = jnp.where(alive, tiles_sq, 0)

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        dirs = means3d - camera_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        rgb = sh_lib.sh_to_rgb(sh_degree, shs, dirs)

    lam_min = None
    cull_c = None
    if opacities is not None:
        # Per-instance ellipse-vs-tile cull support (ops.binning): the
        # quadratic satisfies ½·dᵀ·conic·d ≥ ½·λmin(conic)·‖d‖², so a tile
        # whose closest point to the mean is farther than √(2c/λmin)
        # contains no pixel with α ≥ 1/255 — the blend kernel's own
        # α-floor gate (forward.cu:346-349) would zero every one of its
        # pixels, so dropping the instance is output-exact.
        ca2, cb2, cc2 = conic[..., 0], conic[..., 1], conic[..., 2]
        half_tr = 0.5 * (ca2 + cc2)
        lam_min = jnp.maximum(
            half_tr - jnp.sqrt(
                jnp.maximum((0.5 * (ca2 - cc2)) ** 2 + cb2 * cb2, 0.0)
            ),
            0.0,
        )
        cull_c = jnp.log(
            jnp.maximum(
                jax.lax.stop_gradient(opacities.reshape(-1)), 1e-12
            ) * (1.0 / C.ALPHA_FLOOR)
        )

    return PreprocessOut(
        means2d=means2d,
        depths=depths,
        conic=conic,
        rgb=rgb,
        radii=radii,
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
        tiles_touched=tiles,
        lam_min=lam_min,
        cull_c=cull_c,
    )
