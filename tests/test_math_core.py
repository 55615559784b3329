"""Golden tests for the math core: cameras, SH, quaternions, preprocess.

These pin the exact numerical semantics listed in SURVEY.md §2.1 (constants
from the reference CUDA rasterizer) without copying any reference code.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops.preprocess import preprocess
from fourdgs_tpu.utils import graphics, quaternion as quat, sh as sh_lib


def look_at_camera(eye, target, width=64, height=64, fov=math.pi / 3, time=0.0):
    """Build a camera at `eye` looking at `target` (world +y up)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # 3DGS/COLMAP convention: y down, z fwd
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=1)  # camera-to-world rotation
    t = -R.T @ eye  # COLMAP-style translation
    fovy = graphics.focal2fov(graphics.fov2focal(fov, width), height)
    return graphics.make_camera(R, t, fov, fovy, width, height, time=time)


class TestGraphics:
    def test_projection_depth_range(self):
        P = graphics.projection_matrix(0.01, 100.0, 1.0, 1.0)
        # point at z=znear on the optical axis → ndc z = 0
        for z, expect in [(0.01, 0.0), (100.0, 1.0)]:
            p = np.array([0.0, 0.0, z, 1.0]) @ P
            assert abs(p[2] / p[3] - expect) < 1e-5
        # w coordinate equals view z (z_sign = +1)
        p = np.array([0.3, -0.2, 5.0, 1.0]) @ P
        assert abs(p[3] - 5.0) < 1e-6

    def test_projection_fov_edges(self):
        fovx, fovy = 1.2, 0.9
        P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
        z = 10.0
        x_edge = math.tan(fovx / 2) * z
        p = np.array([x_edge, 0.0, z, 1.0]) @ P
        assert abs(p[0] / p[3] - 1.0) < 1e-5

    def test_world_to_view_maps_camera_center_to_origin(self):
        cam = look_at_camera([1.0, 2.0, -3.0], [0.0, 0.0, 0.0])
        c = np.append(cam.camera_center, 1.0)
        v = c @ cam.world_view
        np.testing.assert_allclose(v[:3], 0.0, atol=1e-5)

    def test_camera_looks_at_target(self):
        cam = look_at_camera([1.0, 2.0, -3.0], [0.2, -0.1, 0.4])
        tgt = np.array([0.2, -0.1, 0.4, 1.0], np.float32)
        clip = tgt @ cam.full_proj
        ndc = clip[:2] / clip[3]
        np.testing.assert_allclose(ndc, 0.0, atol=1e-5)
        # target in front of camera
        view = tgt @ cam.world_view
        assert view[2] > 0

    def test_ndc2pix(self):
        # ((v+1)·S − 1)/2: ndc −1 → −0.5, ndc +1 → S − 0.5 (auxiliary.h:41-44)
        assert graphics.ndc2pix(-1.0, 64) == -0.5
        assert graphics.ndc2pix(1.0, 64) == 63.5

    def test_fov_focal_roundtrip(self):
        assert abs(graphics.focal2fov(graphics.fov2focal(0.8, 640), 640) - 0.8) < 1e-12


class TestSH:
    def test_dc_only_constant_over_directions(self):
        sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
        d2 = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (5, 1))
        np.testing.assert_allclose(
            sh_lib.eval_sh(3, sh, d1), sh_lib.eval_sh(3, sh, d2), atol=1e-7
        )
        np.testing.assert_allclose(sh_lib.eval_sh(0, sh, d1), sh_lib.C0, atol=1e-7)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            sh_lib.sh_to_rgb_dc(sh_lib.rgb_to_sh(rgb)), rgb, atol=1e-6
        )

    def test_orthonormality_monte_carlo(self):
        # Basis functions should be orthonormal over the sphere (loose MC check
        # validates signs/normalizations of C1..C3 jointly).
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        basis = []
        for k in range(16):
            sh = np.zeros((v.shape[0], 16, 1), np.float32)
            sh[:, k, 0] = 1.0
            basis.append(np.asarray(sh_lib.eval_sh(3, jnp.array(sh), jnp.array(v)))[:, 0])
        B = np.stack(basis, 1)
        gram = (B.T @ B) / v.shape[0] * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_clamp_gates_gradient(self):
        sh = jnp.full((1, 1, 3), -10.0)  # deeply clamped at 0
        d = jnp.array([[0.0, 0.0, 1.0]])
        g = jax.grad(lambda s: sh_lib.sh_to_rgb(0, s, d).sum())(sh)
        np.testing.assert_allclose(g, 0.0)


class TestQuaternion:
    def test_rotation_orthonormal(self):
        rng = np.random.default_rng(1)
        q = quat.normalize(jnp.array(rng.normal(size=(32, 4)), jnp.float32))
        R = quat.to_rotation_matrix(q)
        eye = jnp.einsum("pij,pkj->pik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.default_rng(2)
        q1 = quat.normalize(jnp.array(rng.normal(size=(8, 4)), jnp.float32))
        q2 = quat.normalize(jnp.array(rng.normal(size=(8, 4)), jnp.float32))
        R12 = quat.to_rotation_matrix(quat.multiply(q1, q2))
        np.testing.assert_allclose(
            R12,
            quat.to_rotation_matrix(q1) @ quat.to_rotation_matrix(q2),
            atol=1e-5,
        )

    def test_covariance_psd_and_eigvals(self):
        s = jnp.array([[0.5, 1.0, 2.0]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov = quat.covariance_from_scaling_rotation(s, q)
        np.testing.assert_allclose(
            np.asarray(cov[0]), np.diag([0.25, 1.0, 4.0]), atol=1e-6
        )


class TestPreprocess:
    def _run(self, means, scales=None, cam=None, sh_deg=0, **kw):
        P = means.shape[0]
        if scales is None:
            scales = jnp.full((P, 3), 0.1)
        rot = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (P, 1))
        shs = jnp.zeros((P, 1, 3))
        cam = cam or look_at_camera([0.0, 0.0, -5.0], [0.0, 0.0, 0.0])
        return cam, preprocess(
            means, scales, rot, shs,
            jnp.array(cam.camera_center), jnp.array(cam.world_view),
            jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy,
            cam.width, cam.height, sh_deg, **kw,
        )

    def test_center_gaussian_projects_to_image_center(self):
        cam, out = self._run(jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(
            np.asarray(out.means2d[0]), [31.5, 31.5], atol=1e-3
        )
        assert abs(float(out.depths[0]) - 5.0) < 1e-4
        assert int(out.radii[0]) > 0

    def test_behind_camera_culled(self):
        cam, out = self._run(jnp.array([[0.0, 0.0, -10.0]]))
        assert int(out.radii[0]) == 0
        assert int(out.tiles_touched[0]) == 0

    def test_near_plane_cull_threshold(self):
        # z_view = 0.2 exactly is culled (auxiliary.h:154 uses <= 0.2)
        cam, out = self._run(jnp.array([[0.0, 0.0, -4.8], [0.0, 0.0, -4.7]]))
        assert int(out.radii[0]) == 0
        assert int(out.radii[1]) > 0

    def test_isotropic_conic(self):
        cam, out = self._run(jnp.array([[0.0, 0.0, 0.0]]))
        conic = np.asarray(out.conic[0])
        assert abs(conic[0] - conic[2]) / conic[0] < 1e-3
        assert abs(conic[1]) < 1e-6 * conic[0]

    def test_radius_scales_with_size(self):
        cam, o_small = self._run(jnp.array([[0.0, 0.0, 0.0]]),
                                 scales=jnp.full((1, 3), 0.05))
        cam, o_big = self._run(jnp.array([[0.0, 0.0, 0.0]]),
                               scales=jnp.full((1, 3), 0.4))
        assert int(o_big.radii[0]) > int(o_small.radii[0])

    def test_dilation_floor_on_radius(self):
        # A degenerate (tiny) Gaussian still gets the +0.3 dilation ⇒ a
        # nonzero radius (forward.cu:110-111).
        cam, out = self._run(jnp.array([[0.0, 0.0, 0.0]]),
                             scales=jnp.full((1, 3), 1e-6))
        assert int(out.radii[0]) >= 2  # ceil(3·sqrt(0.3)) = 2

    def test_tile_rect_consistency(self):
        cam, out = self._run(jnp.array([[0.0, 0.0, 0.0]]))
        tmin, tmax = np.asarray(out.tile_min[0]), np.asarray(out.tile_max[0])
        x, y = np.asarray(out.means2d[0])
        r = int(out.radii[0])
        assert tmin[0] <= x // C.TILE_X < tmax[0]
        assert tmin[1] <= y // C.TILE_Y < tmax[1]
        assert int(out.tiles_touched[0]) == (tmax[0] - tmin[0]) * (tmax[1] - tmin[1])


class TestIntrinsicsCamera:
    """make_camera_from_k: setup_camera parity (dataset_readers.py:522-547),
    principal-point offsets folded into the projection (VERDICT r2 #10)."""

    def test_centered_matches_fov_camera(self):
        w, h = 64, 48
        fx, fy = 80.0, 70.0
        K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        R = np.eye(3)
        T = np.array([0.1, -0.2, 3.0])
        w2c = np.eye(4)
        w2c[:3, :3] = R.T
        w2c[:3, 3] = T
        fovx = 2 * np.arctan(w / (2 * fx))
        fovy = 2 * np.arctan(h / (2 * fy))
        cam_fov = graphics.make_camera(R, T, fovx, fovy, w, h)
        cam_k = graphics.make_camera_from_k(K, w2c, w, h)
        np.testing.assert_allclose(
            cam_k.world_view, cam_fov.world_view, atol=1e-6
        )
        np.testing.assert_allclose(
            cam_k.full_proj, cam_fov.full_proj, atol=1e-5
        )
        np.testing.assert_allclose(
            cam_k.camera_center, cam_fov.camera_center, atol=1e-5
        )
        assert cam_k.tanfovx == pytest.approx(np.tan(fovx / 2), rel=1e-6)

    def test_offcenter_principal_point_shifts_projection(self):
        w, h = 64, 64
        fx = fy = 80.0
        dx = 6.0  # principal point 6px right of center
        K0 = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        K1 = np.array([[fx, 0, w / 2 + dx], [0, fy, h / 2], [0, 0, 1]])
        w2c = np.eye(4)
        w2c[:3, 3] = [0, 0, 4.0]
        c0 = graphics.make_camera_from_k(K0, w2c, w, h)
        c1 = graphics.make_camera_from_k(K1, w2c, w, h)
        # project the origin through both cameras
        p = np.array([0.0, 0.0, 0.0, 1.0])
        q0 = p @ c0.full_proj
        q1 = p @ c1.full_proj
        px0 = graphics.ndc2pix(q0[0] / q0[3], w)
        px1 = graphics.ndc2pix(q1[0] / q1[3], w)
        # moving cx right by dx moves every projection right by dx
        assert px1 - px0 == pytest.approx(dx, abs=1e-4)


class TestMaskedPsnr:
    """Covisible-masked PSNR (utils/image_utils.py:16-38 semantics)."""

    def test_matches_unmasked_with_full_mask(self):
        from fourdgs_tpu.utils import losses

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)), jnp.float32)
        full = jnp.ones((16, 16))
        assert float(losses.masked_psnr(a, b, full)) == pytest.approx(
            float(losses.psnr(a[None], b[None])[0]), abs=1e-4
        )

    def test_mask_excludes_corrupted_region(self):
        from fourdgs_tpu.utils import losses

        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)), jnp.float32)
        pred = gt.at[:, :8, :].set(0.0)  # destroy the top half
        mask = jnp.zeros((16, 16)).at[8:, :].set(1.0)  # keep bottom only
        # masked: perfect; unmasked: terrible
        assert float(losses.masked_psnr(pred, gt, mask)) > 80
        assert float(losses.psnr(pred[None], gt[None])[0]) < 20

    def test_accepts_1hw_mask(self):
        from fourdgs_tpu.utils import losses

        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(0, 1, (3, 8, 8)), jnp.float32)
        m2 = jnp.ones((8, 8))
        m3 = m2[None]
        assert float(losses.masked_psnr(a, a * 0.9, m2)) == pytest.approx(
            float(losses.masked_psnr(a, a * 0.9, m3))
        )
