"""Loader tests for COLMAP, DyNeRF/Neu3D, PanopticSports, MultipleView,
HyperNeRF — against synthetic datasets written in each on-disk format."""

import json
import os
import struct

import numpy as np
import pytest
from PIL import Image

from fourdgs_tpu.data import colmap_io
from fourdgs_tpu.data.ply import store_pointcloud
from fourdgs_tpu.data.scene import load_scene, sniff_dataset_type
from fourdgs_tpu.configs.core import load_config


def write_colmap_binary(sparse, n_cams=3, size=(32, 24)):
    os.makedirs(sparse, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, size[0], size[1]))  # PINHOLE
        f.write(struct.pack("<dddd", 30.0, 30.0, size[0] / 2, size[1] / 2))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            q = np.array([1.0, 0, 0, 0])
            t = rng.normal(size=3)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"frame{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # 2 observed points
            for j in range(2):
                f.write(struct.pack("<ddq", 1.0 + j, 2.0 + j, j))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 5))
        for i in range(5):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *rng.normal(size=3)))
            f.write(struct.pack("<BBB", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))


class TestColmapIO:
    def test_binary_roundtrip(self, tmp_path):
        sparse = str(tmp_path / "sparse" / "0")
        write_colmap_binary(sparse)
        cams, imgs, pts = colmap_io.read_model(sparse)
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 32
        assert len(imgs) == 3
        assert imgs[1].name == "frame000.png"
        assert imgs[1].xys.shape == (2, 2)
        assert imgs[1].point3d_ids.tolist() == [0, 1]
        xyz, rgb, err = pts
        assert xyz.shape == (5, 3)
        assert rgb[0].tolist() == [100, 150, 200]

    def test_qvec_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap_io.qvec2rotmat(q)
        np.testing.assert_allclose(colmap_io.rotmat2qvec(R), q, atol=1e-6)

    def test_text_cameras(self, tmp_path):
        p = tmp_path / "cameras.txt"
        p.write_text("# comment\n1 SIMPLE_PINHOLE 64 48 50.0 32 24\n")
        cams = colmap_io.read_cameras_text(str(p))
        assert cams[1].model == "SIMPLE_PINHOLE"
        assert cams[1].params[0] == 50.0


class TestColmapScene:
    def test_load(self, tmp_path):
        sparse = str(tmp_path / "sparse" / "0")
        write_colmap_binary(sparse)
        imgdir = tmp_path / "images"
        imgdir.mkdir()
        for i in range(3):
            Image.fromarray(
                np.zeros((24, 32, 3), np.uint8)
            ).save(imgdir / f"frame{i:03d}.png")
        assert sniff_dataset_type(str(tmp_path)) == "colmap"
        cfg = load_config()
        cfg.model.llffhold = 2
        scene = load_scene(cfg, str(tmp_path))
        assert scene.dataset_type == "colmap"
        assert len(scene.train_cameras) + len(scene.test_cameras) == 3
        assert scene.point_cloud.points.shape == (5, 3)
        # monocular time convention: idx/N
        times = sorted(
            lc.camera.time
            for lc in scene.train_cameras + scene.test_cameras
        )
        assert times[0] == 0.0 and times[-1] < 1.0
        # lazy image loads
        img = scene.train_cameras[0].image()
        assert img.shape == (24, 32, 3)


class TestDynerfScene:
    def test_load_from_extracted_frames(self, tmp_path):
        n_cams, n_frames = 3, 4
        rng = np.random.default_rng(0)
        poses = np.zeros((n_cams, 3, 5))
        for i in range(n_cams):
            poses[i, :, :3] = np.eye(3)
            poses[i, :, 3] = rng.normal(size=3)
            poses[i, :, 4] = [24, 32, 40.0]  # H, W, focal
        pb = np.concatenate(
            [poses.reshape(n_cams, -1), np.tile([[1.0, 10.0]], (n_cams, 1))],
            axis=1,
        )
        np.save(tmp_path / "poses_bounds.npy", pb)
        for c in range(n_cams):
            d = tmp_path / f"cam{c:02d}" / "images"
            d.mkdir(parents=True)
            for f in range(n_frames):
                Image.fromarray(
                    rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                ).save(d / f"{f:04d}.png")
        store_pointcloud(
            str(tmp_path / "points3D_downsample2.ply"),
            rng.normal(size=(50, 3)).astype(np.float32),
            rng.uniform(0, 255, (50, 3)),
        )
        assert sniff_dataset_type(str(tmp_path)) == "dynerf"
        from fourdgs_tpu.data.dynerf import load_dynerf_scene

        scene = load_dynerf_scene(
            str(tmp_path), eval_index=0, n_frames=n_frames,
            target_wh=(32, 24),
        )
        # camera 0 held out: 2 cams x 4 frames train, 1 cam x 4 test
        assert len(scene.train_cameras) == 8
        assert len(scene.test_cameras) == 4
        assert len(scene.video_cameras) == 300
        assert scene.point_cloud.points.shape == (50, 3)
        img = scene.train_cameras[0].image()
        assert img.shape == (24, 32, 3)
        times = {lc.camera.time for lc in scene.train_cameras}
        assert len(times) == n_frames


class TestPanopticScene:
    def test_load(self, tmp_path):
        n_t, n_c = 2, 2
        w, h = 32, 24
        rng = np.random.default_rng(0)
        ims = tmp_path / "ims"
        meta = {"w": w, "h": h, "k": [], "w2c": [], "fn": [], "cam_id": []}
        for t in range(n_t):
            ks, w2cs, fns, cids = [], [], [], []
            for c in range(n_c):
                K = [[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]]
                w2c = np.eye(4)
                w2c[:3, 3] = rng.normal(size=3)
                fn = f"{c}/{t:06d}.png"
                (ims / str(c)).mkdir(parents=True, exist_ok=True)
                Image.fromarray(
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                ).save(ims / fn)
                ks.append(K)
                w2cs.append(w2c.tolist())
                fns.append(fn)
                cids.append(c)
            meta["k"].append(ks)
            meta["w2c"].append(w2cs)
            meta["fn"].append(fns)
            meta["cam_id"].append(cids)
        for name in ("train_meta.json", "test_meta.json"):
            with open(tmp_path / name, "w") as f:
                json.dump(meta, f)
        data = rng.normal(size=(30, 7)).astype(np.float32)
        np.savez(tmp_path / "init_pt_cld.npz", data=data)

        assert sniff_dataset_type(str(tmp_path)) == "PanopticSports"
        cfg = load_config()
        scene = load_scene(cfg, str(tmp_path))
        assert scene.dataset_type == "PanopticSports"
        assert len(scene.train_cameras) == n_t * n_c
        assert scene.maxtime == n_t
        assert scene.point_cloud.points.shape == (30, 3)
        assert scene.nerf_normalization["radius"] > 0
        img = scene.train_cameras[0].image()
        assert img.shape == (h, w, 3)


class TestHypernerfScene:
    def test_load(self, tmp_path):
        rng = np.random.default_rng(0)
        ids = [f"{i:04d}" for i in range(8)]
        json.dump({"near": 0.1, "far": 10.0, "scale": 1.0,
                   "center": [0, 0, 0]},
                  open(tmp_path / "scene.json", "w"))
        json.dump({i: {"camera_id": 0, "warp_id": int(i)} for i in ids},
                  open(tmp_path / "metadata.json", "w"))
        json.dump({"ids": ids, "val_ids": []},
                  open(tmp_path / "dataset.json", "w"))
        (tmp_path / "camera").mkdir()
        (tmp_path / "rgb" / "2x").mkdir(parents=True)
        for i in ids:
            json.dump({
                "orientation": np.eye(3).tolist(),
                "position": rng.normal(size=3).tolist(),
                "focal_length": 60.0,
                "principal_point": [32, 24],
                "image_size": [64, 48],
                "pixel_aspect_ratio": 1.0,
                "skew": 0.0, "radial_distortion": [0, 0, 0],
                "tangential_distortion": [0, 0],
            }, open(tmp_path / "camera" / f"{i}.json", "w"))
            Image.fromarray(
                rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            ).save(tmp_path / "rgb" / "2x" / f"{i}.png")
        np.save(tmp_path / "points.npy", rng.normal(size=(40, 3)))

        assert sniff_dataset_type(str(tmp_path)) == "nerfies"
        cfg = load_config()
        scene = load_scene(cfg, str(tmp_path))
        assert scene.dataset_type == "nerfies"
        # 4:1 split: train = 0,4; test = 2 (train+2, last dropped)
        assert len(scene.train_cameras) == 2
        assert len(scene.test_cameras) == 1
        assert scene.point_cloud.points.shape == (40, 3)
        img = scene.train_cameras[0].image()
        assert img.shape == (24, 32, 3)
        times = [lc.camera.time for lc in scene.train_cameras]
        assert max(times) <= 1.0


class TestColmapWriters:
    """Model writers + converter CLI (reference scripts/colmap_converter.py
    parity): .bin → .txt → .bin must round-trip losslessly incl. point ids
    and tracks."""

    def test_bin_txt_bin_roundtrip(self, tmp_path):
        src = str(tmp_path / "sparse" / "0")
        write_colmap_binary(src)
        cams0, imgs0, pts0 = colmap_io.read_model_full(src)
        assert len(pts0) == 5 and pts0[0].image_ids.shape == (1,)

        txt_dir = str(tmp_path / "txt")
        colmap_io.write_model(cams0, imgs0, pts0, txt_dir, ".txt")
        cams1, imgs1, pts1 = colmap_io.read_model_full(txt_dir, ".txt")
        bin_dir = str(tmp_path / "bin2")
        colmap_io.write_model(cams1, imgs1, pts1, bin_dir, ".bin")
        cams2, imgs2, pts2 = colmap_io.read_model_full(bin_dir, ".bin")

        assert cams2.keys() == cams0.keys()
        for cid in cams0:
            a, b = cams0[cid], cams2[cid]
            assert (a.model, a.width, a.height) == (b.model, b.width, b.height)
            np.testing.assert_array_equal(a.params, b.params)
        assert imgs2.keys() == imgs0.keys()
        for iid in imgs0:
            a, b = imgs0[iid], imgs2[iid]
            assert a.name == b.name and a.camera_id == b.camera_id
            np.testing.assert_array_equal(a.qvec, b.qvec)
            np.testing.assert_array_equal(a.tvec, b.tvec)
            np.testing.assert_array_equal(a.xys, b.xys)
            np.testing.assert_array_equal(a.point3d_ids, b.point3d_ids)
        assert pts2.keys() == pts0.keys()
        for pid in pts0:
            a, b = pts0[pid], pts2[pid]
            np.testing.assert_array_equal(a.xyz, b.xyz)
            np.testing.assert_array_equal(a.rgb, b.rgb)
            assert a.error == b.error
            np.testing.assert_array_equal(a.image_ids, b.image_ids)
            np.testing.assert_array_equal(a.point2d_idxs, b.point2d_idxs)

    def test_converter_cli(self, tmp_path):
        import importlib.util

        src = str(tmp_path / "sparse" / "0")
        write_colmap_binary(src)
        out = str(tmp_path / "converted")
        spec = importlib.util.spec_from_file_location(
            "colmap_converter",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "colmap_converter.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main(["--input_model", src, "--output_model", out,
                  "--output_format", ".txt"])
        assert os.path.exists(os.path.join(out, "cameras.txt"))
        assert os.path.exists(os.path.join(out, "images.txt"))
        assert os.path.exists(os.path.join(out, "points3D.txt"))
        # text model loads through the ordinary readers too
        cams, imgs, pts = colmap_io.read_model(out)
        assert cams[1].model == "PINHOLE" and len(imgs) == 3
