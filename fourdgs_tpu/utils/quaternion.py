"""Quaternion math (wxyz convention, matching the reference).

Parity targets: utils/general_utils.py:87-113 (build_rotation,
build_scaling_rotation) and utils/graphics_utils.py:82-130 (batch_quaternion_multiply)
in the reference. All functions are batched over leading dims and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize quaternions [..., 4]."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (w,x,y,z) → rotation matrix [..., 3, 3].

    Matches the reference build_rotation (utils/general_utils.py:87-104) /
    computeCov3D (forward.cu:118-152). Note: applied to whatever quaternion is
    passed in — callers that require a rotation must normalize first (the
    reference normalizes via the rotation activation before rasterizing, and
    the CUDA kernel uses the quaternion as-is, forward.cu:127).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] (w,x,y,z).

    Parity: reference batch_quaternion_multiply (utils/graphics_utils.py:82-130),
    which also normalizes the result.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return normalize(jnp.stack([w, x, y, z], axis=-1))


def covariance_vec6(
    scale: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Σ = (R S)(R S)ᵀ upper triangle → [..., 6] (xx, xy, xz, yy, yz, zz).

    Same math as :func:`covariance_from_scaling_rotation` (CUDA
    computeCov3D, forward.cu:118-152) written in structure-of-arrays form:
    every intermediate is a [...]-shaped vector, never a [..., 3, 3]
    matrix. On TPU a [P, 3, 3] tensor tiles as T(4, 128) — 9 useful values
    in a 512-slot tile — and drags transposes into both passes; the
    component form runs at full lane utilization and fuses into the
    surrounding preprocess elementwise chain.
    """
    s = scale * scaling_modifier
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = s[..., 0] * s[..., 0]
    s1 = s[..., 1] * s[..., 1]
    s2 = s[..., 2] * s[..., 2]
    # Σ_ij = Σ_k s_k² R_ik R_jk
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def build_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R · diag(scale): [..., 3, 3].

    Parity: utils/general_utils.py:106-113. Covariance Σ = L Lᵀ.
    """
    R = to_rotation_matrix(q)
    return R * scale[..., None, :]


def covariance_from_scaling_rotation(
    scale: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """3D covariance Σ = (R S)(R S)ᵀ, [..., 3, 3].

    Parity: gaussian_model.py:29-37 build_covariance_from_scaling_rotation and
    the CUDA computeCov3D (forward.cu:118-152).
    """
    L = build_scaling_rotation(scale * scaling_modifier, q)
    return L @ jnp.swapaxes(L, -1, -2)


def sym_cov3d_to_vec(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric 3×3 covariance → 6-vector (upper triangle, row-major).

    Order (xx, xy, xz, yy, yz, zz) matches the CUDA cov3D buffer layout
    (forward.cu:145-151).
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def vec_to_sym_cov3d(v: jnp.ndarray) -> jnp.ndarray:
    """Unpack 6-vector → symmetric 3×3 covariance."""
    xx, xy, xz, yy, yz, zz = (v[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )
