"""Checkpoint / resume + model snapshots.

Two persistence formats, mirroring the reference (SURVEY.md §5.4):

1. **Training checkpoint** — full (GaussianState, AdamState, iteration) pytree
   via orbax (replaces torch.save of capture(), train.py:393-395 /
   gaussian_model.py:66-106). Restore round-trips densification stats, Adam
   moments, alive mask, SH degree — resuming mid-stage is exact.
2. **Model snapshot for rendering** — 3DGS-standard PLY of alive primitives +
   the deformation net as .npz (replaces scene.save → point_cloud.ply +
   deformation.pth, scene/__init__.py:143-150). The PLY interoperates with
   stock 3DGS viewers.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data import ply as ply_lib
from fourdgs_tpu.models.gaussians import GaussianState
from fourdgs_tpu.train.adam import AdamState


def _state_to_tree(state: GaussianState) -> dict:
    d = state._asdict()
    d["spatial_lr_scale"] = jnp.float32(d["spatial_lr_scale"])
    return d


def _tree_to_state(tree: dict) -> GaussianState:
    tree = dict(tree)
    tree["spatial_lr_scale"] = float(tree["spatial_lr_scale"])
    return GaussianState(**tree)


def save_checkpoint(
    path: str, state: GaussianState, adam_state: AdamState,
    iteration: int, stage: str,
):
    """chkpnt_<stage>_<iter> (train.py:393-395 naming) via orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(path, f"chkpnt_{stage}_{iteration}"))
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "state": _state_to_tree(state),
        "adam": adam_state._asdict(),
        "iteration": jnp.int32(iteration),
    }
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str) -> tuple[GaussianState, AdamState, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    state = _tree_to_state(tree["state"])
    adam_state = AdamState(**tree["adam"])
    return state, adam_state, int(tree["iteration"])


def find_stage_checkpoint(model_path: str, stage: str) -> str | None:
    """Latest chkpnt_<stage>_* under model_path, or None.

    Mirrors the resume gate (train.py:49-57): a fine checkpoint skips the
    coarse stage entirely.
    """
    if not os.path.isdir(model_path):
        return None
    best, best_iter = None, -1
    for name in os.listdir(model_path):
        if name.startswith(f"chkpnt_{stage}_"):
            try:
                it = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if it > best_iter:
                best, best_iter = os.path.join(model_path, name), it
    return best


def save_snapshot(
    model_path: str, state: GaussianState, iteration: int, stage: str = ""
):
    """scene.save equivalent: point_cloud/[coarse_]iteration_<k>/ with
    point_cloud.ply + deformation.npz + deformation_table/accum
    (scene/__init__.py:143-150, gaussian_model.py:214-267)."""
    prefix = "coarse_" if stage == "coarse" else ""
    out = os.path.join(
        model_path, "point_cloud", f"{prefix}iteration_{iteration}"
    )
    os.makedirs(out, exist_ok=True)
    alive = np.asarray(state.alive)
    ply_lib.save_gaussian_ply(
        os.path.join(out, "point_cloud.ply"), state.params, alive
    )
    flat, treedef = jax.tree.flatten(state.params["deform"])
    np.savez(
        os.path.join(out, "deformation.npz"),
        treedef=np.array(str(treedef), dtype=object),
        aabb=np.asarray(state.aabb),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )
    np.save(
        os.path.join(out, "deformation_table.npy"),
        np.asarray(state.deformation_table)[alive],
    )
    np.save(
        os.path.join(out, "deformation_accum.npy"),
        np.asarray(state.deformation_accum)[alive],
    )
    return out


def load_snapshot(snapshot_dir: str, cfg, key) -> GaussianState:
    """Rebuild a GaussianState from a snapshot dir (load_ply + load_model,
    gaussian_model.py:233-314). The deformation tree structure comes from a
    freshly initialized net (same config) — leaves are then replaced."""
    from fourdgs_tpu.models import deformation as deform_lib
    from fourdgs_tpu.models import gaussians as G

    prim = ply_lib.load_gaussian_ply(
        os.path.join(snapshot_dir, "point_cloud.ply")
    )
    n = prim["xyz"].shape[0]
    cap = cfg.tpu.capacity
    if n > cap:
        raise ValueError(f"snapshot has {n} > capacity {cap} primitives")

    data = np.load(os.path.join(snapshot_dir, "deformation.npz"),
                   allow_pickle=True)
    k_sh = G.num_sh_coeffs(cfg.model.sh_degree)
    ref_deform = deform_lib.init_deformation(key, cfg.hidden, k_sh)
    flat_ref, treedef = jax.tree.flatten(ref_deform)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat_ref))]
    deform_params = jax.tree.unflatten(treedef, leaves)

    def pad(x, fill=0.0):
        widths = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(jnp.asarray(x), widths, constant_values=fill)

    params = {
        "xyz": pad(prim["xyz"]),
        "f_dc": pad(prim["f_dc"]),
        "f_rest": pad(prim["f_rest"]),
        "scaling": pad(prim["scaling"], fill=-10.0),
        "rotation": pad(prim["rotation"]).at[n:, 0].set(1.0),
        "opacity": pad(prim["opacity"], fill=-15.0),
        "deform": deform_params,
    }
    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    table = np.load(os.path.join(snapshot_dir, "deformation_table.npy"))
    return GaussianState(
        params=params,
        alive=alive,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        deformation_accum=jnp.zeros((cap, 3), jnp.float32),
        deformation_table=jnp.zeros((cap,), bool).at[:n].set(
            jnp.asarray(table)
        ),
        aabb=jnp.asarray(data["aabb"]),
        active_sh_degree=jnp.int32(cfg.model.sh_degree),
        spatial_lr_scale=1.0,
    )
