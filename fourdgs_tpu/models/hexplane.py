"""HexPlane spatio-temporal feature field, TPU-native.

Parity target: reference scene/hexplane.py:109-183 (HexPlaneField) with
identical semantics:

- 6 planes per scale from ``itertools.combinations(range(4), 2)`` over
  (x, y, z, t): (xy, xz, xt, yz, yt, zt) — spatial planes are indices
  [0, 1, 3], temporal [2, 4, 5] (the regularizer split, gaussian_model.py:538-577).
- multires multipliers scale the *spatial* resolutions only (hexplane.py:128-140).
- time-containing planes init to 1.0, spatial planes uniform(0.1, 0.5)
  (hexplane.py:60-68).
- query: xyz normalized to the AABB (stored [max, min]! — the reference's
  normalize_aabb at hexplane.py:19-20 maps max→−1, min→+1; we keep that
  behavior for checkpoint compatibility), raw t in [0, 1] appended
  unnormalized, bilinear sample per plane with align_corners=True + border
  padding, **product** over the 6 planes, **concat** over scales
  (hexplane.py:84-106).

The torch ``F.grid_sample`` becomes a gather-based bilinear interpolation that
XLA fuses; planes are stored feature-last ([Ra, Rb, F]) so the per-point
4-corner gather vectorizes over the feature lanes.
"""

from __future__ import annotations

import itertools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.configs.core import KPlanesConfig

SPATIAL_PLANES = (0, 1, 3)   # xy, xz, yz
TEMPORAL_PLANES = (2, 4, 5)  # xt, yt, zt
COO_COMBS = tuple(itertools.combinations(range(4), 2))


def init_hexplane(
    key: jax.Array,
    kcfg: KPlanesConfig,
    multires: tuple[int, ...],
    a: float = 0.1,
    b: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """Create the plane parameter dict.

    Keys are ``grid_s{scale}_p{plane}`` — the "grid" prefix drives the
    optimizer param-group split exactly like the reference's name-based split
    (deformation.py:149-160: "grid" in name → grid LR group).
    """
    params: dict[str, jnp.ndarray] = {}
    keys = jax.random.split(key, len(multires) * len(COO_COMBS))
    i = 0
    for s, mult in enumerate(multires):
        reso = [r * mult for r in kcfg.resolution[:3]] + [kcfg.resolution[3]]
        for p, comb in enumerate(COO_COMBS):
            shape = (reso[comb[0]], reso[comb[1]], kcfg.output_coordinate_dim)
            if 3 in comb:
                params[f"grid_s{s}_p{p}"] = jnp.ones(shape, jnp.float32)
            else:
                params[f"grid_s{s}_p{p}"] = jax.random.uniform(
                    keys[i], shape, jnp.float32, a, b
                )
            i += 1
    return params


def feat_dim(kcfg: KPlanesConfig, multires: tuple[int, ...]) -> int:
    """Concatenated feature width (hexplane.py:141-145)."""
    return kcfg.output_coordinate_dim * len(multires)


def _bilinear_plane(plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Sample [Ra, Rb, F] at normalized coords (u, v) ∈ [−1, 1]² → [N, F].

    align_corners=True (−1 → texel 0, +1 → texel R−1) with border clamping,
    matching F.grid_sample(..., align_corners=True, padding_mode='border')
    (hexplane.py:39-43).

    Layout: the four bilinear corners are gathered as ONE row from a
    corner-shifted stacked table [Ra·Rb, 4F] instead of four separate row
    gathers. XLA TPU scatter/gather cost is per *row* (~7 ns/row regardless
    of width ≤ a few hundred bytes), so this makes the backward ONE
    65k-row scatter per plane instead of four — measured 11 ms → ~3 ms of
    the train step. Exactness: a shifted corner reads past the edge only
    when its clamped bilinear weight is exactly 0 (x0 == Ra−1 ⇒ wx == 0),
    so the zero padding never contributes; the shifts' autodiff is
    pad/slice adds on the dense plane, which XLA fuses.
    """
    Ra, Rb, F = plane.shape
    x = jnp.clip((u + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
    y = jnp.clip((v + 1.0) * 0.5 * (Rb - 1), 0.0, Rb - 1)
    x0 = jnp.clip(jnp.floor(x), 0, Ra - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, Rb - 1).astype(jnp.int32)
    # Border-gradient mask (advisor r3): at x0 == Ra−1 the corner weight wx
    # is exactly 0, but its corner terms read zero padding, so d/dx through
    # them would be a spurious nonzero (grid_sample border semantics give
    # slope 0 there). Multiplying by the 0/1 mask leaves every value
    # bit-identical (0·anything = 0) and zeroes the boundary derivative.
    wx = ((x - x0.astype(x.dtype))
          * (x0 < Ra - 1).astype(x.dtype))[:, None]
    wy = ((y - y0.astype(y.dtype))
          * (y0 < Rb - 1).astype(y.dtype))[:, None]
    sb = jnp.pad(plane[:, 1:, :], ((0, 0), (0, 1), (0, 0)))    # (a, b+1)
    sa = jnp.pad(plane[1:, :, :], ((0, 1), (0, 0), (0, 0)))    # (a+1, b)
    sab = jnp.pad(plane[1:, 1:, :], ((0, 1), (0, 1), (0, 0)))  # (a+1, b+1)
    stacked = jnp.concatenate([plane, sb, sa, sab], axis=-1).reshape(
        Ra * Rb, 4 * F
    )
    rows = jnp.take(stacked, x0 * Rb + y0, axis=0)             # [N, 4F]
    return (
        rows[:, :F] * (1 - wx) * (1 - wy)
        + rows[:, F:2 * F] * (1 - wx) * wy
        + rows[:, 2 * F:3 * F] * wx * (1 - wy)
        + rows[:, 3 * F:] * wx * wy
    )


def _bilinear_tslice(plane: jnp.ndarray, u: jnp.ndarray, t: jnp.ndarray):
    """Temporal plane [Ra, Rt, F] sampled at per-point u and a SHARED t.

    When every point queries the same timestamp (the render path broadcasts
    one camera time over all Gaussians, gaussian_renderer/__init__.py:52),
    the 2-D bilinear sample factorizes: lerp the two t-columns into a 1-D
    table [Ra, F], then evaluate the border-clamped linear interp as a dense
    [N, Ra] @ [Ra, F] matmul whose lhs holds the two interpolation weights
    per row. Identical math to :func:`_bilinear_plane` — but forward and
    backward are MXU matmuls instead of a 4-corner gather and its
    scatter-add transpose (XLA TPU scatter costs ~7 ns per update row; the
    24 temporal-corner scatters were ~40% of the whole train step).
    """
    Ra, Rt, _ = plane.shape
    ty = jnp.clip((t + 1.0) * 0.5 * (Rt - 1), 0.0, Rt - 1)
    t0 = jnp.clip(jnp.floor(ty), 0, Rt - 1).astype(jnp.int32)
    t1 = jnp.minimum(t0 + 1, Rt - 1)
    wt = ty - t0.astype(ty.dtype)
    table = (
        jnp.take(plane, t0, axis=1) * (1.0 - wt)
        + jnp.take(plane, t1, axis=1) * wt
    )  # [Ra, F]

    x = jnp.clip((u + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
    x0f = jnp.clip(jnp.floor(x), 0, Ra - 1)
    wx = (x - x0f)[:, None]
    x0 = x0f.astype(jnp.int32)[:, None]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], Ra), 1)
    # two-nonzero interpolation matrix; x0 == Ra−1 implies wx == 0, so the
    # dropped x0+1 == Ra lane never carries weight (border semantics intact)
    A = jnp.where(lanes == x0, 1.0 - wx, 0.0) + jnp.where(
        lanes == x0 + 1, wx, 0.0
    )
    return jax.lax.dot_general(
        A, table, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def normalize_aabb(xyz: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """(xyz − aabb[0]) · 2/(aabb[1] − aabb[0]) − 1, with aabb = [max, min].

    Keeps the reference's inverted mapping (hexplane.py:19-20 with set_aabb
    called as (xyz_max, xyz_min), scene/__init__.py:91): max → −1, min → +1.
    """
    return (xyz - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


def query_hexplane(
    params: dict[str, jnp.ndarray],
    aabb: jnp.ndarray,        # [2,3] = [xyz_max, xyz_min]
    xyz: jnp.ndarray,         # [N,3]
    t: jnp.ndarray,           # [N] or [N,1] normalized time
    multires_len: int,
) -> jnp.ndarray:
    """Multi-scale interpolated features → [N, F_total].

    Product over the 6 planes within a scale, concat across scales
    (interpolate_ms_features, hexplane.py:73-106). Note t is used raw (the
    reference concatenates timestamps after AABB normalization,
    hexplane.py:163-164) so t∈[0,1] addresses the upper half of the temporal
    axis — preserved for parity.

    When ``t`` is a scalar (one camera time shared by all points — the
    training/render path), the three temporal planes use the factorized
    matmul sampler (:func:`_bilinear_tslice`): same values, no scatter-add
    in the backward.
    """
    t_scalar = jnp.ndim(t) == 0
    xyzn = normalize_aabb(xyz, aabb)
    if t_scalar:
        pts = xyzn
    else:
        pts = jnp.concatenate([xyzn, t.reshape(-1, 1)], axis=-1)
    feats = []
    for s in range(multires_len):
        prod = None
        for p, comb in enumerate(COO_COMBS):
            plane = params[f"grid_s{s}_p{p}"]
            if t_scalar and comb[1] == 3:
                v = _bilinear_tslice(plane, pts[:, comb[0]], t)
            else:
                v = _bilinear_plane(plane, pts[:, comb[0]], pts[:, comb[1]])
            prod = v if prod is None else prod * v
        feats.append(prod)
    return jnp.concatenate(feats, axis=-1)


def hexplane_regularization(
    params: dict[str, jnp.ndarray],
    multires_len: int,
    plane_tv_weight: float,
    time_smoothness_weight: float,
    l1_time_planes_weight: float,
) -> jnp.ndarray:
    """Grid regularizers applied in the fine stage (train.py:251-254).

    Parity with gaussian_model.compute_regulation (gaussian_model.py:538-577)
    and compute_plane_smoothness (scene/regulation.py:22-28). Despite the
    names, the reference applies the *same* mean-squared second difference
    along the torch grid's h axis — the plane's **second coordinate** — to
    both groups: spatial planes [0,1,3] under plane_tv_weight, temporal planes
    [2,4,5] under time_smoothness_weight; plus L1(|1 − g|) pulling the
    temporal planes toward their identity init. In our [Ra, Rb, F] layout the
    h axis is axis 1.
    """
    total_tv = 0.0
    total_time = 0.0
    total_l1 = 0.0
    for s in range(multires_len):
        for p in range(6):
            g = params[f"grid_s{s}_p{p}"]  # [Ra, Rb, F]
            d2 = g[:, 2:, :] - 2.0 * g[:, 1:-1, :] + g[:, :-2, :]
            if p in SPATIAL_PLANES:
                total_tv = total_tv + jnp.mean(d2 * d2)
            else:
                total_time = total_time + jnp.mean(d2 * d2)
                total_l1 = total_l1 + jnp.mean(jnp.abs(1.0 - g))
    return (
        plane_tv_weight * total_tv
        + time_smoothness_weight * total_time
        + l1_time_planes_weight * total_l1
    )
