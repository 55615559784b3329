"""Nerfies distortion camera (fourdgs_tpu.data.nerfies_camera).

Parity target: scene/utils.py:28-428 — projection with Brown–Conrady
distortion, Newton undistortion, pixel→ray→point round trips, scaling,
JSON (de)serialization.
"""

import json

import numpy as np
import pytest

from fourdgs_tpu.data.nerfies_camera import NerfiesCamera, undistort


def make_cam(distorted=True):
    # mild rotation + offset, off-center principal point
    th = 0.3
    R = np.array([
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)],
    ])
    return NerfiesCamera(
        orientation=R,
        position=[0.4, -0.2, -3.0],
        focal_length=500.0,
        principal_point=[310.0, 255.0],
        image_size=[640, 512],
        pixel_aspect_ratio=1.0,
        radial_distortion=[-0.12, 0.03, 0.0] if distorted else None,
        tangential_distortion=[1e-3, -5e-4] if distorted else None,
    )


class TestUndistort:
    def test_inverts_distortion(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.4, 0.4, 200)
        y = rng.uniform(-0.4, 0.4, 200)
        k1, k2, k3, p1, p2 = -0.12, 0.03, 0.001, 1e-3, -5e-4
        from fourdgs_tpu.data.nerfies_camera import _distort

        xd, yd = _distort(x, y, k1, k2, k3, p1, p2)
        xu, yu = undistort(xd, yd, k1, k2, k3, p1, p2)
        np.testing.assert_allclose(xu, x, atol=1e-9)
        np.testing.assert_allclose(yu, y, atol=1e-9)

    def test_identity_without_distortion(self):
        xd = np.array([0.1, -0.2])
        yd = np.array([0.05, 0.3])
        xu, yu = undistort(xd, yd)
        np.testing.assert_allclose(xu, xd)
        np.testing.assert_allclose(yu, yd)


class TestNerfiesCamera:
    @pytest.mark.parametrize("distorted", [False, True])
    def test_project_ray_roundtrip(self, distorted):
        cam = make_cam(distorted)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.5, 0.5, (50, 3))
        pix = cam.project(pts)
        rays = cam.pixels_to_rays(pix)
        # every ray must pass through its world point
        v = pts - cam.position
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        np.testing.assert_allclose(rays, v, atol=1e-6)

    def test_pixels_to_points_roundtrip(self):
        cam = make_cam(True)
        rng = np.random.default_rng(2)
        pts = rng.uniform(-0.5, 0.5, (20, 3))
        pix = cam.project(pts)
        depth = (pts - cam.position) @ cam.optical_axis
        lifted = cam.pixels_to_points(pix, depth)
        np.testing.assert_allclose(lifted, pts, atol=1e-6)

    def test_scale_preserves_projection_geometry(self):
        cam = make_cam(True)
        half = cam.scale(0.5)
        pts = np.array([[0.2, -0.1, 0.4]])
        np.testing.assert_allclose(
            half.project(pts), cam.project(pts) * 0.5, atol=1e-9
        )
        assert tuple(half.image_size) == (320, 256)
        with pytest.raises(ValueError):
            cam.scale(0)

    def test_json_roundtrip(self, tmp_path):
        cam = make_cam(True)
        p = tmp_path / "cam.json"
        p.write_text(json.dumps(cam.to_json()))
        cam2 = NerfiesCamera.from_json(str(p))
        np.testing.assert_allclose(cam2.orientation, cam.orientation)
        np.testing.assert_allclose(
            cam2.radial_distortion, cam.radial_distortion
        )
        pts = np.array([[0.1, 0.2, 0.3]])
        np.testing.assert_allclose(cam2.project(pts), cam.project(pts))

    def test_old_format_tangential_key(self, tmp_path):
        cam = make_cam(True)
        d = cam.to_json()
        d["tangential"] = d.pop("tangential_distortion")
        p = tmp_path / "old.json"
        p.write_text(json.dumps(d))
        cam2 = NerfiesCamera.from_json(str(p))
        np.testing.assert_allclose(
            cam2.tangential_distortion, cam.tangential_distortion
        )

    def test_get_pixel_centers(self):
        cam = make_cam(False)
        grid = cam.get_pixel_centers()
        assert grid.shape == (512, 640, 2)
        assert grid[0, 0, 0] == 0.5 and grid[0, 0, 1] == 0.5
