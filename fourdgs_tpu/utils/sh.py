"""Real spherical-harmonics evaluation (degrees 0..3).

Parity target: the reference's SH basis constants and evaluation order
(reference utils/sh_utils.py:26-113 ≡ cuda_rasterizer/auxiliary.h:22-39 and the
CUDA ``computeColorFromSH`` at forward.cu:20-71). The constants are the standard
real-SH normalization coefficients.

Convention: ``sh`` carries coefficients laid out [..., K, 3] with
K = (deg+1)^2 ≤ 16, ordered (l,m) = (0,0), (1,-1), (1,0), (1,1), (2,-2), ...
exactly as the reference stores features_dc ++ features_rest.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      deg: active degree, 0..3 (static Python int; the reference anneals this
        via oneupSHdegree, train.py:149-150).
      sh: [..., K, C] coefficients with K >= (deg+1)^2.
      dirs: [..., 3] unit directions.

    Returns:
      [..., C] the band-limited function value (no +0.5 shift, no clamp —
      see ``sh_to_rgb`` for the rasterizer's color path).
    """
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH → RGB exactly as the rasterizer's forward does (forward.cu:20-71).

    Adds the +0.5 shift and clamps at 0 from below. ``jnp.maximum`` gives the
    clamp-gated gradient the CUDA backward implements via its saved ``clamped``
    mask (backward.cu:127-133): zero gradient where the clamp was active.
    """
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band mapping (reference utils/sh_utils.py:115-116)."""
    return (rgb - 0.5) / C0


def sh_to_rgb_dc(sh_dc: jnp.ndarray) -> jnp.ndarray:
    """DC-only SH → RGB (reference utils/sh_utils.py:118-119)."""
    return sh_dc * C0 + 0.5
