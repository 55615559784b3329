"""Scene orchestrator: dataset sniffing, loading, model initialization.

Parity target: reference scene/__init__.py:26-157 (Scene): detect the dataset
format by marker file, load cameras + init point cloud, set the deformation
AABB from the cloud's bbox, apply Instant4D hooks (grid pruning before
create_from_pcd), and expose train/test/video camera lists + cameras_extent.

Marker-file registry (scene/__init__.py:48-68 + dataset_readers.py:680-687):
  sparse/                     → colmap
  transforms_train.json       → blender (D-NeRF)
  poses_bounds.npy            → dynerf (Neu3D)
  dataset.json                → nerfies (HyperNeRF)
  train_meta.json             → PanopticSports
  points3D_multipleview.ply   → MultipleView
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import numpy as np

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.data import blender
from fourdgs_tpu.data.blender import SceneData
from fourdgs_tpu.data.grid_pruning import grid_prune_pointcloud
from fourdgs_tpu.models import gaussians as G


def sniff_dataset_type(path: str) -> str:
    if os.path.exists(os.path.join(path, "sparse")):
        return "colmap"
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return "blender"
    if os.path.exists(os.path.join(path, "poses_bounds.npy")):
        return "dynerf"
    if os.path.exists(os.path.join(path, "dataset.json")):
        return "nerfies"
    if os.path.exists(os.path.join(path, "train_meta.json")):
        return "PanopticSports"
    if os.path.exists(os.path.join(path, "points3D_multipleview.ply")):
        return "MultipleView"
    raise ValueError(f"could not recognize dataset type at {path!r}")


def load_scene(cfg: Config, path: str | None = None) -> SceneData:
    path = path or cfg.model.source_path
    kind = sniff_dataset_type(path)
    if kind == "blender":
        return blender.load_blender_scene(
            path,
            white_background=cfg.model.white_background,
            eval_split=cfg.model.eval,
            extension=cfg.model.extension,
        )
    if kind == "dynerf":
        from fourdgs_tpu.data import dynerf
        return dynerf.load_dynerf_scene(path, cfg)
    if kind == "nerfies":
        from fourdgs_tpu.data import hypernerf
        return hypernerf.load_hypernerf_scene(path, cfg)
    if kind == "colmap":
        from fourdgs_tpu.data import colmap
        return colmap.load_colmap_scene(path, cfg)
    if kind == "PanopticSports":
        from fourdgs_tpu.data import panoptic
        return panoptic.load_panoptic_scene(path, cfg)
    if kind == "MultipleView":
        from fourdgs_tpu.data import multipleview
        return multipleview.load_multipleview_scene(path, cfg)
    raise NotImplementedError(f"loader for {kind!r} not implemented yet")


class Scene(NamedTuple):
    data: SceneData
    state: "G.GaussianState"
    cameras_extent: float


def build_scene(
    cfg: Config, key: jax.Array, path: str | None = None,
    scene_data: SceneData | None = None,
) -> Scene:
    """Load (or accept) scene data and initialize the Gaussian state.

    Applies the Instant4D grid-pruning hook before create_from_pcd when
    enabled (scene/__init__.py:103-119); the AABB comes from the (possibly
    pruned) cloud's bbox (scene/__init__.py:85-91).
    """
    data = scene_data or load_scene(cfg, path)
    extent = float(data.nerf_normalization["radius"])
    pcd = data.point_cloud
    if cfg.model.use_grid_pruning:
        pcd = grid_prune_pointcloud(pcd, data)
    state = G.create_from_pcd(
        key, cfg, pcd.points, pcd.colors, spatial_lr_scale=extent
    )
    return Scene(data=data, state=state, cameras_extent=extent)
