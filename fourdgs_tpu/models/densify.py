"""Adaptive density control on the fixed-capacity Gaussian set.

Reimplements the reference's Adam-state-aware densification
(scene/gaussian_model.py:316-523) without any tensor resizing: clone/split
write into dead slots located by a vectorized free-list, prune clears the
alive mask, and the Adam moments (same-shaped pytrees) are zeroed at newly
written slots — reproducing cat_tensors_to_optimizer/_prune_optimizer
semantics (new slots: zero moments; pruned slots: dead) with jit-stable
shapes and no host round-trips.

Capacity overflow degrades gracefully: writes beyond the free-slot supply are
dropped (reported via the returned count), mirroring the reference's hard
360k densify gate (train.py:357-360).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models.gaussians import GaussianState

# per-primitive parameter leaves (the deformation net is not per-primitive)
PRIM_KEYS = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")


def add_densification_stats(
    state: GaussianState,
    means2d_grad_px: jnp.ndarray,  # [P,2] dL/d(pixel-space means2D)
    radii: jnp.ndarray,            # [P] int32 from the render
    width: int,
    height: int,
) -> GaussianState:
    """Accumulate view-space positional gradient norms (gaussian_model.py:521-523).

    The reference's screenspace tensor receives NDC-scale gradients (the CUDA
    backward multiplies pixel-space gradients by (0.5·W, 0.5·H),
    backward.cu:370-387); we apply the same scaling to our pixel-space
    carrier gradients so the densify_grad_threshold semantics are identical.
    Also folds in the max_radii2D update (train.py:348).
    """
    update = (radii > 0) & state.alive
    g_ndc = means2d_grad_px * jnp.array(
        [0.5 * width, 0.5 * height], jnp.float32
    )
    norm = jnp.linalg.norm(g_ndc, axis=-1)
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(update, norm, 0.0),
        denom=state.denom + update.astype(jnp.float32),
        max_radii2d=jnp.where(
            update,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


def _free_list(alive: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dead-slot indices in ascending order: free_list[r] = r-th dead slot."""
    cap = alive.shape[0]
    dead = ~alive
    rank = jnp.cumsum(dead) - 1  # rank of each dead slot among dead
    free = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(dead, rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    return free, jnp.sum(dead.astype(jnp.int32))


def _scatter_copy(params, moments, src_sel, dest, extra=None):
    """Copy selected primitive rows to dest slots; zero moments there.

    ``dest`` is [P] with invalid entries == cap (dropped). ``extra`` optionally
    overrides specific leaves with new values (for split children).
    """
    new_params = dict(params)
    new_moms = []
    for m in moments:
        new_moms.append(dict(m))
    for k in PRIM_KEYS:
        val = params[k] if extra is None or k not in extra else extra[k]
        new_params[k] = params[k].at[dest].set(
            jnp.where(src_sel.reshape((-1,) + (1,) * (val.ndim - 1)), val, params[k]),
            mode="drop",
        )
        for m, nm in zip(moments, new_moms):
            nm[k] = m[k].at[dest].set(0.0, mode="drop")
    return new_params, tuple(new_moms)


def compute_grads(state: GaussianState) -> jnp.ndarray:
    """Average view-space gradient norm since the last reset (densify(), :510-512)."""
    g = state.xyz_gradient_accum / state.denom
    return jnp.where(jnp.isnan(g) | (state.denom == 0), 0.0, g)


def _postfix_reset(state: GaussianState) -> GaussianState:
    """densification_postfix zeroes every accumulator (gaussian_model.py:390-414)."""
    cap = state.alive.shape[0]
    return state._replace(
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        deformation_accum=jnp.zeros((cap, 3), jnp.float32),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
    )


def densify_and_clone(
    state: GaussianState,
    moments: tuple,            # (mu, nu) pytrees shaped like params
    grads: jnp.ndarray,        # [P]
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float,
    isotropic: bool = False,
):
    """Copy small, high-gradient Gaussians (gaussian_model.py:443-456)."""
    scaling = G.get_scaling(state.params, isotropic)
    sel = (
        (grads >= grad_threshold)
        & (jnp.max(scaling, axis=1) <= percent_dense * scene_extent)
        & state.alive
    )
    free, n_free = _free_list(state.alive)
    cap = state.alive.shape[0]
    rank = jnp.cumsum(sel) - 1
    dest = jnp.where(sel & (rank < n_free), jnp.take(free, jnp.minimum(rank, cap - 1)), cap)
    params, moments = _scatter_copy(state.params, moments, sel, dest)
    alive = state.alive.at[dest].set(True, mode="drop")
    new_table = state.deformation_table.at[dest].set(
        jnp.where(sel, state.deformation_table, False), mode="drop"
    )
    n_new = jnp.sum((dest < cap).astype(jnp.int32))
    state = state._replace(
        params=params, alive=alive, deformation_table=new_table
    )
    return _postfix_reset(state), moments, n_new


def densify_and_split(
    key: jax.Array,
    state: GaussianState,
    moments: tuple,
    grads: jnp.ndarray,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float,
    n_split: int = 2,
    isotropic: bool = False,
):
    """Split large, high-gradient Gaussians into N children sampled from the
    parent's own distribution; parent pruned (gaussian_model.py:415-441)."""
    from fourdgs_tpu.utils import quaternion as quat

    cap = state.alive.shape[0]
    scaling = G.get_scaling(state.params, isotropic)
    sel = (
        (grads >= grad_threshold)
        & (jnp.max(scaling, axis=1) > percent_dense * scene_extent)
        & state.alive
    )
    free, n_free = _free_list(state.alive)
    rank = jnp.cumsum(sel) - 1

    R = quat.to_rotation_matrix(G.get_rotation(state.params))
    child_scaling = jnp.log(
        jnp.maximum(scaling / (0.8 * n_split), 1e-30)
    )
    alive = state.alive
    params = state.params
    table = state.deformation_table
    for j in range(n_split):
        k_j = jax.random.fold_in(key, j)
        samples = (
            jax.random.normal(k_j, (cap, 3)) * scaling
        )
        child_xyz = params["xyz"] + jnp.einsum("pij,pj->pi", R, samples)
        dest = jnp.where(
            sel & (rank * n_split + j < n_free),
            jnp.take(free, jnp.minimum(rank * n_split + j, cap - 1)),
            cap,
        )
        params, moments = _scatter_copy(
            params, moments, sel, dest,
            extra={"xyz": child_xyz, "scaling": child_scaling},
        )
        alive = alive.at[dest].set(True, mode="drop")
        table = table.at[dest].set(
            jnp.where(sel, state.deformation_table, False), mode="drop"
        )
    # prune parents (only those whose children were actually placed)
    placed = sel & (rank * n_split + (n_split - 1) < n_free)
    alive = alive & ~placed
    n_new = jnp.sum(placed.astype(jnp.int32)) * n_split
    state = state._replace(params=params, alive=alive, deformation_table=table)
    return _postfix_reset(state), moments, n_new


def prune(
    state: GaussianState,
    min_opacity: float,
    scene_extent: float,
    size_threshold_on,
    max_screen_size: float = 20.0,
    isotropic: bool = False,
):
    """Remove low-opacity / oversized Gaussians (gaussian_model.py:489-503).

    ``size_threshold_on`` may be a traced bool: the size criteria (screen
    radius > 20 px, world scale > 0.1·extent) apply only after the first
    opacity reset (train.py:361-364 passes size_threshold=None before it).
    """
    mask = G.get_opacity(state.params)[:, 0] < min_opacity
    big_vs = state.max_radii2d > max_screen_size
    big_ws = (
        jnp.max(G.get_scaling(state.params, isotropic), axis=1)
        > 0.1 * scene_extent
    )
    size_on = jnp.asarray(size_threshold_on, bool)
    mask = mask | (size_on & (big_vs | big_ws))
    mask = mask & state.alive
    n_pruned = jnp.sum(mask.astype(jnp.int32))
    return state._replace(alive=state.alive & ~mask), n_pruned


def grow(
    key: jax.Array,
    state: GaussianState,
    moments: tuple,
    density_threshold: float = 5.0,
    displacement_scale: float = 5.0,
):
    """Density-based point growth (the --add_point path).

    Parity: gaussians.grow → utils/point_utils.upsample_point_cloud
    (point_utils.py:9-130, hooked at train.py:367-368): points whose nearest
    neighbor is farther than ``density_threshold`` spawn a displaced copy
    (gaussian noise · displacement_scale), filtered to the deformation AABB,
    written into free slots with zeroed Adam moments.
    """
    from fourdgs_tpu.ops.knn import mean_sq_dist_3nn

    cap = state.alive.shape[0]
    xyz = state.params["xyz"]
    # nearest-neighbor distance; dead slots pushed far away so they never
    # register as neighbors or candidates
    far = jnp.where(state.alive[:, None], xyz, 1e6)
    nn_d = jnp.sqrt(jnp.maximum(mean_sq_dist_3nn(far), 0.0))
    sel = (nn_d > density_threshold) & state.alive

    noise = jax.random.normal(key, (cap, 3)) * displacement_scale
    new_xyz = xyz + noise
    in_aabb = jnp.all(
        (new_xyz < state.aabb[0]) & (new_xyz > state.aabb[1]), axis=-1
    )
    sel = sel & in_aabb

    free, n_free = _free_list(state.alive)
    rank = jnp.cumsum(sel) - 1
    dest = jnp.where(
        sel & (rank < n_free), jnp.take(free, jnp.minimum(rank, cap - 1)), cap
    )
    params, moments = _scatter_copy(
        state.params, moments, sel, dest, extra={"xyz": new_xyz}
    )
    alive = state.alive.at[dest].set(True, mode="drop")
    table = state.deformation_table.at[dest].set(
        jnp.where(sel, state.deformation_table, False), mode="drop"
    )
    n_new = jnp.sum((dest < cap).astype(jnp.int32))
    state = state._replace(params=params, alive=alive, deformation_table=table)
    return _postfix_reset(state), moments, n_new


def reset_opacity(state: GaussianState, moments: tuple):
    """Clamp opacity to ≤ 0.01 and zero its Adam moments
    (gaussian_model.py:269-272 + replace_tensor_to_optimizer:316-329)."""
    new_op = G.inverse_sigmoid(
        jnp.minimum(G.get_opacity(state.params), 0.01)
    )
    params = dict(state.params)
    params["opacity"] = new_op
    new_moms = []
    for m in moments:
        nm = dict(m)
        nm["opacity"] = jnp.zeros_like(m["opacity"])
        new_moms.append(nm)
    return state._replace(params=params), tuple(new_moms)
