"""Data-layer tests: PLY I/O, Blender/D-NeRF loader, grid pruning, Scene.

Loader tests run against a synthetic D-NeRF-format dataset generated on the
fly (transforms_{train,test}.json + RGBA PNGs), exercising the same marker
files and conventions the reference sniffs (scene/__init__.py:48-68).
"""

import json
import math
import os

import jax
import numpy as np
import pytest
from PIL import Image

from fourdgs_tpu.configs.core import load_config
from fourdgs_tpu.data import ply as ply_lib
from fourdgs_tpu.data.blender import load_blender_scene, read_timeline
from fourdgs_tpu.data.grid_pruning import (
    compute_adaptive_voxel_size,
    grid_prune_pointcloud,
    voxel_downsample,
)
from fourdgs_tpu.data.ply import PointCloud
from fourdgs_tpu.data.scene import build_scene, sniff_dataset_type


class TestPly:
    def test_roundtrip_fields(self, tmp_path):
        p = str(tmp_path / "t.ply")
        rng = np.random.default_rng(0)
        fields = {"x": rng.normal(size=10), "y": rng.normal(size=10),
                  "opacity": rng.normal(size=10)}
        ply_lib.write_ply(p, fields)
        back = ply_lib.read_ply(p)
        for k in fields:
            np.testing.assert_allclose(back[k], fields[k].astype(np.float32))

    def test_pointcloud_roundtrip(self, tmp_path):
        p = str(tmp_path / "pc.ply")
        pts = np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32)
        cols = np.random.default_rng(2).uniform(0, 1, (20, 3))
        ply_lib.store_pointcloud(p, pts, cols * 255)
        pc = ply_lib.fetch_pointcloud(p)
        np.testing.assert_allclose(pc.points, pts, atol=1e-6)
        np.testing.assert_allclose(pc.colors, cols, atol=1 / 255.0)

    def test_gaussian_snapshot_roundtrip(self, tmp_path):
        from tests.test_model_stack import small_state

        cfg, state = small_state(n=16, cap=32)
        p = str(tmp_path / "point_cloud.ply")
        ply_lib.save_gaussian_ply(p, state.params, np.asarray(state.alive))
        back = ply_lib.load_gaussian_ply(p)
        assert back["xyz"].shape == (16, 3)
        assert back["f_rest"].shape == (16, 45)
        np.testing.assert_allclose(
            back["xyz"], np.asarray(state.params["xyz"])[:16], atol=1e-6
        )
        np.testing.assert_allclose(
            back["f_dc"], np.asarray(state.params["f_dc"])[:16], atol=1e-6
        )
        np.testing.assert_allclose(
            back["rotation"], np.asarray(state.params["rotation"])[:16],
            atol=1e-6,
        )


def make_dnerf_dataset(root, n_train=4, n_test=2, size=64):
    """Synthetic D-NeRF dataset: orbiting cameras, RGBA frames."""
    os.makedirs(root / "train", exist_ok=True)
    os.makedirs(root / "test", exist_ok=True)
    rng = np.random.default_rng(0)

    def frames(split, n):
        out = []
        for i in range(n):
            ang = 2 * math.pi * i / n
            c2w = np.eye(4)
            c2w[:3, 3] = [3 * math.sin(ang), 0.0, 3 * math.cos(ang)]
            # simple look-at-origin rotation
            fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
            right = np.cross([0, 1, 0], fwd)
            right = right / np.linalg.norm(right)
            up = np.cross(fwd, right)
            c2w[:3, :3] = np.stack([right, up, -fwd], axis=1)
            img = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
            img[..., 3] = 255
            name = f"./{split}/r_{i}"
            Image.fromarray(img, "RGBA").save(root / f"{split}/r_{i}.png")
            out.append({
                "file_path": name,
                "time": i / max(n - 1, 1),
                "transform_matrix": c2w.tolist(),
            })
        return out

    for split, n in (("train", n_train), ("test", n_test)):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(
                {"camera_angle_x": 0.69, "frames": frames(split, n)}, f
            )


class TestBlenderLoader:
    def test_load_scene(self, tmp_path):
        make_dnerf_dataset(tmp_path)
        scene = load_blender_scene(
            str(tmp_path), target_size=(64, 64),
            rng=np.random.default_rng(3),
        )
        assert len(scene.train_cameras) == 4
        assert len(scene.test_cameras) == 2
        assert len(scene.video_cameras) == 160
        assert scene.dataset_type == "blender"
        assert scene.point_cloud.points.shape == (2000, 3)
        assert scene.point_cloud.points.min() >= -1.3
        assert scene.point_cloud.points.max() <= 1.3
        # times normalized to [0,1]
        times = [lc.camera.time for lc in scene.train_cameras]
        assert min(times) == 0.0 and max(times) == 1.0
        assert scene.nerf_normalization["radius"] > 0
        # cameras look at the origin: project origin near image center
        cam = scene.train_cameras[0].camera
        clip = np.array([0, 0, 0, 1.0]) @ cam.full_proj
        ndc = clip[:2] / clip[3]
        assert np.abs(ndc).max() < 0.2
        # gt images are uint8 HWC
        assert scene.train_cameras[0].image.dtype == np.uint8
        assert scene.train_cameras[0].image.shape == (64, 64, 3)

    def test_timeline_normalization(self, tmp_path):
        make_dnerf_dataset(tmp_path, n_train=3, n_test=2)
        mapper, max_time = read_timeline(str(tmp_path))
        assert max_time == 1.0
        assert mapper[0.0] == 0.0 and mapper[1.0] == 1.0

    def test_sniff(self, tmp_path):
        make_dnerf_dataset(tmp_path)
        assert sniff_dataset_type(str(tmp_path)) == "blender"

    def test_build_scene_and_state(self, tmp_path):
        make_dnerf_dataset(tmp_path)
        cfg = load_config()
        cfg.tpu.capacity = 4096
        cfg.hidden.multires = (1,)
        from fourdgs_tpu.configs.core import KPlanesConfig
        cfg.hidden.kplanes_config = KPlanesConfig(
            resolution=(8, 8, 8, 4), output_coordinate_dim=8
        )
        scene = build_scene(
            cfg, jax.random.key(0), path=str(tmp_path),
        )
        from fourdgs_tpu.models import gaussians as G
        assert int(G.count_alive(scene.state)) == 2000
        assert scene.cameras_extent > 0
        # AABB covers the init cloud
        aabb = np.asarray(scene.state.aabb)
        assert np.all(aabb[0] >= aabb[1])


class TestGridPruning:
    def test_voxel_downsample_merges(self):
        # two clusters of near-duplicate points → 2 survivors at centroids
        pts = np.concatenate([
            np.full((10, 3), 0.1) + np.random.default_rng(0).normal(0, 1e-4, (10, 3)),
            np.full((10, 3), 5.3) + np.random.default_rng(1).normal(0, 1e-4, (10, 3)),
        ]).astype(np.float32)
        cols = np.ones((20, 3), np.float32) * 0.5
        down_p, down_c = voxel_downsample(pts, cols, 0.5)
        assert down_p.shape[0] == 2
        np.testing.assert_allclose(sorted(down_p[:, 0]), [0.1, 5.3], atol=0.01)

    def test_adaptive_voxel_size_clamped(self):
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        v = compute_adaptive_voxel_size(pts, None)
        assert 0.001 <= v <= 1.0

    def test_prune_reduces_count(self):
        rng = np.random.default_rng(0)
        # dense cloud: strong reduction expected
        pts = rng.normal(0, 0.05, (5000, 3)).astype(np.float32)
        pcd = PointCloud(
            points=pts, colors=rng.uniform(0, 1, (5000, 3)).astype(np.float32),
            normals=np.zeros((5000, 3), np.float32),
        )
        out = grid_prune_pointcloud(pcd, None)
        assert out.points.shape[0] < 5000
        assert out.points.shape == out.colors.shape
