"""DenseGrid: trilinearly-sampled dense 3D voxel grid.

Parity target: scene/grid.py:14-54 in the reference — a [1-channel]
dense grid over an AABB, trilinear interpolation, used as the optional
``empty_voxel`` occupancy mask in the deformation net (deformation.py:30-31,
101-102; off by default, arguments/__init__.py:104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_dense_grid(
    key: jax.Array, channels: int = 1,
    world_size: tuple[int, int, int] = (64, 64, 64),
) -> jnp.ndarray:
    """Grid parameter [X, Y, Z, C], zero-init (reference uses zeros)."""
    del key
    return jnp.zeros((*world_size, channels), jnp.float32)


def sample_dense_grid(
    grid: jnp.ndarray, aabb: jnp.ndarray, xyz: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear sample at world points → [N, C].

    aabb is [2,3] = [max, min] (the project-wide convention); points are
    normalized to [0, R−1] per axis with border clamping.
    """
    X, Y, Z, Cc = grid.shape
    # map world → [0, R-1]; aabb[0]=max → index R-1, aabb[1]=min → 0
    span = aabb[0] - aabb[1]
    u = (xyz - aabb[1]) / jnp.where(span == 0, 1.0, span)
    coords = u * jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    coords = jnp.clip(coords, 0.0, jnp.array([X - 1, Y - 1, Z - 1], jnp.float32))
    c0 = jnp.floor(coords).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, jnp.array([X - 1, Y - 1, Z - 1]))
    w = coords - c0.astype(jnp.float32)

    flat = grid.reshape(-1, Cc)

    def g(ix, iy, iz):
        return jnp.take(flat, (ix * Y + iy) * Z + iz, axis=0)

    x0, y0, z0 = c0[:, 0], c0[:, 1], c0[:, 2]
    x1, y1, z1 = c1[:, 0], c1[:, 1], c1[:, 2]
    wx, wy, wz = w[:, 0:1], w[:, 1:2], w[:, 2:3]
    return (
        g(x0, y0, z0) * (1 - wx) * (1 - wy) * (1 - wz)
        + g(x1, y0, z0) * wx * (1 - wy) * (1 - wz)
        + g(x0, y1, z0) * (1 - wx) * wy * (1 - wz)
        + g(x0, y0, z1) * (1 - wx) * (1 - wy) * wz
        + g(x1, y1, z0) * wx * wy * (1 - wz)
        + g(x1, y0, z1) * wx * (1 - wy) * wz
        + g(x0, y1, z1) * (1 - wx) * wy * wz
        + g(x1, y1, z1) * wx * wy * wz
    )
