"""Tiled rasterizer vs oracle: forward and gradient allclose.

The core parity requirement (BASELINE.md: "rendered images and all
pixel-gradients allclose"): the fixed-budget tiled pipeline must match the
whole-image oracle bit-for-bit up to float32 reduction-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops.binning import bin_gaussians
from fourdgs_tpu.ops.reference import rasterize_reference
from fourdgs_tpu.ops.tiled import rasterize_tiled
from tests.test_math_core import look_at_camera


def random_scene(n, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    return {
        "means3d": jnp.array(rng.uniform(-spread, spread, (n, 3)), jnp.float32),
        "scales": jnp.array(rng.uniform(0.02, 0.3, (n, 3)), jnp.float32),
        "rotations": jnp.array(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32
        ),
        "opacities": jnp.array(rng.uniform(0.2, 0.95, (n,)), jnp.float32),
        "shs": jnp.array(rng.uniform(-0.5, 1.0, (n, 16, 3)), jnp.float32),
    }


CAM_KW = {}


def run_both(p, cam, sh_degree=3, bg=None, instance_budget=8192, tile_budget=512):
    bg = jnp.array([0.15, 0.25, 0.35]) if bg is None else bg
    args = (
        p["means3d"], p["scales"], p["rotations"], p["opacities"], p["shs"],
        jnp.array(cam.camera_center), jnp.array(cam.world_view),
        jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy,
        cam.width, cam.height, sh_degree, bg,
    )
    ref = rasterize_reference(*args)
    til = rasterize_tiled(
        *args, instance_budget=instance_budget, tile_budget=tile_budget
    )
    return ref, til


class TestBinning:
    def test_counts_and_ranges(self):
        # 3 Gaussians with known rects on a 4x4 tile grid
        tile_min = jnp.array([[0, 0], [1, 1], [3, 3]], jnp.int32)
        tile_max = jnp.array([[2, 2], [2, 3], [4, 4]], jnp.int32)
        touched = jnp.array([4, 2, 1], jnp.int32)
        depths = jnp.array([3.0, 1.0, 2.0])
        out = bin_gaussians(tile_min, tile_max, touched, depths, 4, 4, 16)
        assert int(out.num_rendered) == 7
        # tile (1,1) = id 5 contains g0 (depth 3) and g1 (depth 1): g1 first
        s, e = int(out.tile_start[5]), int(out.tile_stop[5])
        assert e - s == 2
        np.testing.assert_array_equal(np.asarray(out.gauss_id[s:e]), [1, 0])
        # tile 15 contains only g2
        s, e = int(out.tile_start[15]), int(out.tile_stop[15])
        assert e - s == 1 and int(out.gauss_id[s]) == 2
        # empty tile
        s, e = int(out.tile_start[3]), int(out.tile_stop[3])
        assert s == e
        # padding sorts to the end and is invalid
        assert not bool(out.valid[-1])

    def test_overflow_reported(self):
        tile_min = jnp.zeros((2, 2), jnp.int32)
        tile_max = jnp.full((2, 2), 4, jnp.int32)
        touched = jnp.full((2,), 16, jnp.int32)
        out = bin_gaussians(
            tile_min, tile_max, touched, jnp.array([1.0, 2.0]), 4, 4, 8
        )
        assert int(out.num_rendered) == 32 > 8


class TestForwardParity:
    @pytest.mark.parametrize("size", [(64, 64), (48, 80), (50, 70)])
    def test_color_depth_alpha_allclose(self, size):
        w, h = size
        cam = look_at_camera([0.3, -0.2, -4], [0, 0, 0], width=w, height=h)
        p = random_scene(64, seed=3)
        ref, til = run_both(p, cam)
        assert int(til.num_rendered) <= 8192
        assert int(til.max_tile_len) <= 512
        np.testing.assert_allclose(
            np.asarray(til.color), np.asarray(ref.color), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(til.depth), np.asarray(ref.depth), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(til.alpha), np.asarray(ref.alpha), atol=2e-5
        )

    def test_dense_overlap_scene(self):
        # heavily overlapping gaussians exercise the T-stop path
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=64, height=64)
        p = random_scene(128, seed=5, spread=0.3)
        p["opacities"] = jnp.full((128,), 0.9)
        ref, til = run_both(p, cam)
        np.testing.assert_allclose(
            np.asarray(til.color), np.asarray(ref.color), atol=2e-5
        )

    def test_radii_match(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=64, height=64)
        p = random_scene(64, seed=3)
        ref, til = run_both(p, cam)
        np.testing.assert_array_equal(np.asarray(til.radii), np.asarray(ref.radii))


class TestGradientParity:
    def test_grads_allclose(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=48, height=48)
        p = random_scene(48, seed=11)
        bg = jnp.array([0.1, 0.2, 0.3])
        tgt = jnp.linspace(0, 1, 3 * 48 * 48).reshape(3, 48, 48)

        def loss_ref(p):
            out = rasterize_reference(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], jnp.array(cam.camera_center),
                jnp.array(cam.world_view), jnp.array(cam.full_proj),
                cam.tanfovx, cam.tanfovy, 48, 48, 3, bg,
            )
            return jnp.sum((out.color - tgt) ** 2) + 0.05 * jnp.sum(out.depth)

        def loss_til(p):
            out = rasterize_tiled(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], jnp.array(cam.camera_center),
                jnp.array(cam.world_view), jnp.array(cam.full_proj),
                cam.tanfovx, cam.tanfovy, 48, 48, 3, bg,
                instance_budget=4096, tile_budget=256,
            )
            return jnp.sum((out.color - tgt) ** 2) + 0.05 * jnp.sum(out.depth)

        g_ref = jax.grad(loss_ref)(p)
        g_til = jax.grad(loss_til)(p)
        assert abs(float(loss_ref(p)) - float(loss_til(p))) < 1e-3
        for k in p:
            np.testing.assert_allclose(
                np.asarray(g_til[k]), np.asarray(g_ref[k]),
                rtol=1e-3, atol=1e-4, err_msg=f"grad mismatch for {k}",
            )

    def test_means2d_offset_carrier(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=32, height=32)
        p = random_scene(16, seed=2)

        def loss(off):
            out = rasterize_tiled(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], jnp.array(cam.camera_center),
                jnp.array(cam.world_view), jnp.array(cam.full_proj),
                cam.tanfovx, cam.tanfovy, 32, 32, 3, jnp.zeros(3),
                instance_budget=2048, tile_budget=256, means2d_offset=off,
            )
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss)(jnp.zeros((16, 2)))
        assert float(jnp.abs(g).sum()) > 0


class TestBudgetOverflow:
    def test_tile_budget_truncates_far_instances(self):
        # When a tile overflows its budget, the *farthest* instances drop
        # (list is depth-sorted) — closest-first rendering degrades gracefully.
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=32, height=32)
        p = random_scene(64, seed=9, spread=0.2)
        ref, til_small = run_both(p, cam, instance_budget=8192, tile_budget=64)
        # the nearest instances still dominate the image
        err = np.abs(np.asarray(til_small.color) - np.asarray(ref.color)).mean()
        assert int(til_small.max_tile_len) > 0
        assert err < 0.2
