"""Gaussian primitive set: fixed-capacity pytree with an alive mask.

TPU-native redesign of the reference GaussianModel (scene/gaussian_model.py):
instead of torch tensors that are physically resized on densify/prune (with
Adam-state surgery, gaussian_model.py:316-388), all per-primitive arrays have
a **static capacity P_max** and an ``alive`` mask. Clone/split/prune become
masked scatters with jit-stable shapes (see fourdgs_tpu.models.densify), and
the Adam moments live in same-shaped arrays so "new slots get zero moments /
pruned slots die" falls out of the same scatter (SURVEY.md §7 hard parts).

Parameter tensors and activations mirror gaussian_model.py:29-64:
  xyz [P,3] · features_dc [P,1,3] · features_rest [P,K−1,3] ·
  scaling (log) [P,3] · rotation [P,4] · opacity (logit) [P,1]
  activations: exp / normalize / sigmoid; covariance from (scale, rot).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.models import deformation as deform_lib
from fourdgs_tpu.ops.knn import mean_sq_dist_3nn
from fourdgs_tpu.utils import sh as sh_lib


class GaussianState(NamedTuple):
    """Everything the trainer owns. ``params`` are optimized; the rest is
    auxiliary state (mirrors capture/restore, gaussian_model.py:66-106)."""

    params: dict[str, Any]
    alive: jnp.ndarray             # [P] bool
    max_radii2d: jnp.ndarray       # [P] f32 (train.py:348)
    xyz_gradient_accum: jnp.ndarray  # [P] f32 (add_densification_stats)
    denom: jnp.ndarray             # [P] f32
    deformation_accum: jnp.ndarray  # [P,3] f32 (|Δxyz| logging accumulator)
    deformation_table: jnp.ndarray  # [P] bool (init True, gaussian_model.py:163)
    aabb: jnp.ndarray              # [2,3] = [xyz_max, xyz_min]
    active_sh_degree: jnp.ndarray  # [] int32 (annealed, oneupSHdegree)
    spatial_lr_scale: float        # static python float


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def num_sh_coeffs(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2


def create_from_pcd(
    key: jax.Array,
    cfg: Config,
    points: np.ndarray,        # [N,3]
    colors: np.ndarray,        # [N,3] in [0,1]
    spatial_lr_scale: float,
) -> GaussianState:
    """Initialize from a point cloud (gaussian_model.py:137-163) into the
    fixed-capacity layout. Dead slots hold inert values (opacity logit −15,
    tiny scales) and are masked out of rendering via ``alive``.

    Capacity starts at ``cfg.tpu.capacity_init`` (auto: the 16384-multiple
    covering 4×N, never above ``cfg.tpu.capacity``) and grows toward
    ``cfg.tpu.capacity`` via :func:`grow_capacity` as densification fills
    slots — [P]-array math is sized by the scene, not the global cap.
    """
    N = points.shape[0]
    cap_max = cfg.tpu.capacity
    cap = cfg.tpu.capacity_init
    if cap <= 0:
        cap = -(-max(4 * N, 16384) // 16384) * 16384
    cap = min(max(cap, N), cap_max)
    if N > cap:
        raise ValueError(f"init cloud ({N}) exceeds capacity ({cap})")
    K = num_sh_coeffs(cfg.model.sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_sq_dist_3nn(pts), 1e-7)
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def padded(x, fill=0.0):
        pad = [(0, cap - N)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    # SH features stored RANK-2 ([P,3] and [P,3(K−1)] coeff-major): XLA TPU
    # pads the minor two dims of every HBM buffer to (8,128) tiles, so the
    # naive [P,1,3]/[P,15,3] shapes physically occupy 8×128- and 16×128-
    # padded rows — 268 MB + 537 MB at P=65k for 12 MB of data, and every
    # optimizer/boundary pass pays that traffic (measured ~4 ms of the
    # train step). Rank-2 rows pad to one 128-lane tile (33 MB).
    f_dc = sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))
    params: dict[str, Any] = {
        "xyz": padded(pts),
        "f_dc": padded(f_dc),
        "f_rest": jnp.zeros((cap, 3 * (K - 1)), jnp.float32),
        "scaling": padded(log_scales, fill=-10.0),
        "rotation": padded(
            jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (N, 1)), fill=0.0
        ).at[N:, 0].set(1.0),
        "opacity": padded(
            inverse_sigmoid(0.1 * jnp.ones((N, 1))), fill=-15.0
        ),
    }
    params["deform"] = deform_lib.init_deformation(
        key, cfg.hidden, K
    )

    # AABB from the point cloud bbox, stored [max, min]
    # (scene/__init__.py:85-91 → hexplane.set_aabb(xyz_max, xyz_min)).
    aabb = jnp.stack([pts.max(axis=0), pts.min(axis=0)])

    alive = jnp.zeros((cap,), bool).at[:N].set(True)
    return GaussianState(
        params=params,
        alive=alive,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        deformation_accum=jnp.zeros((cap, 3), jnp.float32),
        deformation_table=alive,
        aabb=aabb,
        active_sh_degree=jnp.int32(0),
        spatial_lr_scale=float(spatial_lr_scale),
    )


# ---------------------------------------------------------------------------
# Activations (gaussian_model.py:29-44, 47-64)


def get_scaling(params, isotropic: bool = False) -> jnp.ndarray:
    s = jnp.exp(params["scaling"])
    if isotropic:
        # Instant4D isotropic mode: broadcast the first axis to all three
        # (utils/isotropic_gaussian.py:17-34) — a proper config branch here
        # instead of the reference's monkey-patch (scene/__init__.py:130-141).
        s = jnp.repeat(s[:, :1], 3, axis=1)
    return s


def get_rotation(params) -> jnp.ndarray:
    q = params["rotation"]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def get_opacity(params) -> jnp.ndarray:
    return jax.nn.sigmoid(params["opacity"])


def get_features(params) -> jnp.ndarray:
    """[P, K, 3] SH coefficients from the rank-2 stored features."""
    P = params["f_dc"].shape[0]
    return jnp.concatenate(
        [params["f_dc"][:, None, :], params["f_rest"].reshape(P, -1, 3)],
        axis=1,
    )


def grow_capacity(
    state: GaussianState, adam_state, new_cap: int
) -> tuple[GaussianState, Any]:
    """Grow every [P]-shaped array (params, stats, Adam moments) to
    ``new_cap`` rows, filling new slots with the inert dead-slot values.

    The TPU replacement for torch's physical tensor resizing
    (gaussian_model.py:367-388): capacity starts small (create_from_pcd
    auto-init) and DOUBLES toward cfg.tpu.capacity as densification fills
    slots — so a 2k-point synthetic scene never pays 400k-row array math,
    while big scenes still reach the reference's 360k cap. Each growth is
    one host-side pad + a retrace of the (shape-specialized) jitted steps;
    growths per run are bounded by log2(capacity/init).
    """
    old = state.params["xyz"].shape[0]
    if new_cap <= old:
        return state, adam_state

    def pad(x, fill=0.0):
        widths = [(0, new_cap - old)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    params = dict(state.params)
    params["xyz"] = pad(params["xyz"])
    params["f_dc"] = pad(params["f_dc"])
    params["f_rest"] = pad(params["f_rest"])
    params["scaling"] = pad(params["scaling"], -10.0)
    params["rotation"] = pad(params["rotation"]).at[old:, 0].set(1.0)
    params["opacity"] = pad(params["opacity"], -15.0)

    def pad_moments(tree):
        return {
            k: (v if k == "deform" else jax.tree.map(pad, v))
            for k, v in tree.items()
        }

    adam_state = adam_state._replace(
        mu=pad_moments(adam_state.mu), nu=pad_moments(adam_state.nu)
    )
    state = state._replace(
        params=params,
        alive=pad(state.alive, False),
        max_radii2d=pad(state.max_radii2d),
        xyz_gradient_accum=pad(state.xyz_gradient_accum),
        denom=pad(state.denom),
        deformation_accum=pad(state.deformation_accum),
        deformation_table=pad(state.deformation_table, False),
    )
    return state, adam_state


def one_up_sh_degree(state: GaussianState, max_sh_degree: int) -> GaussianState:
    """Anneal active SH degree (gaussian_model.py:133-135, train.py:149-150)."""
    return state._replace(
        active_sh_degree=jnp.minimum(state.active_sh_degree + 1, max_sh_degree)
    )


def count_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive.astype(jnp.int32))
