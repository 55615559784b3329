"""Pallas rasterizer parity: interpret-mode kernels vs the tiled/oracle path.

Validates the production pipeline end to end on CPU (Pallas interpreter):
forward color/depth/alpha and the full gradient set must match the pure-JAX
tiled rasterizer, which is itself pinned to the whole-image oracle
(tests/test_tiled_raster.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops.binning import bin_gaussians, bin_gaussians_fast
from fourdgs_tpu.ops.rasterize import rasterize_pallas
from fourdgs_tpu.ops.tiled import rasterize_tiled
from tests.test_math_core import look_at_camera
from tests.test_tiled_raster import random_scene


def run_pallas(p, cam, sh_degree=3, bg=None, budget=8192):
    bg = jnp.array([0.15, 0.25, 0.35]) if bg is None else bg
    return rasterize_pallas(
        p["means3d"], p["scales"], p["rotations"], p["opacities"], p["shs"],
        jnp.array(cam.camera_center), jnp.array(cam.world_view),
        jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy,
        cam.width, cam.height, sh_degree, bg,
        instance_budget=budget, interpret=True,
    )


def run_tiled(p, cam, sh_degree=3, bg=None, budget=8192):
    bg = jnp.array([0.15, 0.25, 0.35]) if bg is None else bg
    return rasterize_tiled(
        p["means3d"], p["scales"], p["rotations"], p["opacities"], p["shs"],
        jnp.array(cam.camera_center), jnp.array(cam.world_view),
        jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy,
        cam.width, cam.height, sh_degree, bg,
        instance_budget=budget, tile_budget=512,
    )


class TestFastBinning:
    def test_matches_lexicographic_binning(self):
        cam = look_at_camera([0.3, -0.2, -4], [0, 0, 0], width=64, height=64)
        p = random_scene(64, seed=3)
        from fourdgs_tpu.ops.preprocess import preprocess

        pre = preprocess(
            p["means3d"], p["scales"], p["rotations"], p["shs"],
            jnp.array(cam.camera_center), jnp.array(cam.world_view),
            jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy, 64, 64, 3,
        )
        a = bin_gaussians(pre.tile_min, pre.tile_max, pre.tiles_touched,
                          pre.depths, 4, 4, 8192)
        b = bin_gaussians_fast(pre.tile_min, pre.tile_max, pre.tiles_touched,
                               pre.depths, 4, 4, 8192)
        assert int(a.num_rendered) == int(b.num_rendered)
        np.testing.assert_array_equal(
            np.asarray(a.tile_start), np.asarray(b.tile_start)
        )
        n = int(a.num_rendered)
        # identical (tile, depth)-ordered gaussian ids
        np.testing.assert_array_equal(
            np.asarray(a.gauss_id[:n]), np.asarray(b.gauss_id[:n])
        )


class TestPallasForwardParity:
    @pytest.mark.parametrize("size", [(64, 64), (48, 80)])
    def test_forward_allclose(self, size):
        w, h = size
        cam = look_at_camera([0.3, -0.2, -4], [0, 0, 0], width=w, height=h)
        p = random_scene(64, seed=3)
        a = run_tiled(p, cam)
        b = run_pallas(p, cam)
        np.testing.assert_allclose(
            np.asarray(b.color), np.asarray(a.color), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(b.depth), np.asarray(a.depth), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(b.alpha), np.asarray(a.alpha), atol=3e-5
        )
        assert int(a.num_rendered) == int(b.num_rendered)

    def test_dense_overlap_t_stop(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=64, height=64)
        p = random_scene(128, seed=5, spread=0.3)
        p["opacities"] = jnp.full((128,), 0.9)
        a = run_tiled(p, cam)
        b = run_pallas(p, cam)
        np.testing.assert_allclose(
            np.asarray(b.color), np.asarray(a.color), atol=3e-5
        )

    def test_multi_chunk_tiles(self):
        # >CHUNK instances in one tile exercises the chunk loop + carry
        n = 300
        rng = np.random.default_rng(0)
        p = {
            "means3d": jnp.array(
                rng.uniform(-0.05, 0.05, (n, 3)), jnp.float32
            ),
            "scales": jnp.full((n, 3), 0.02),
            "rotations": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
            "opacities": jnp.full((n,), 0.01),  # low α: no early T-stop
            "shs": jnp.array(rng.uniform(0, 1, (n, 16, 3)), jnp.float32),
        }
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=32, height=32)
        a = run_tiled(p, cam)
        b = run_pallas(p, cam)
        assert int(a.max_tile_len) > 256  # actually multi-chunk
        np.testing.assert_allclose(
            np.asarray(b.color), np.asarray(a.color), atol=3e-5
        )


class TestPallasGradientParity:
    def test_grads_allclose(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=48, height=48)
        p = random_scene(48, seed=11)
        bg = jnp.array([0.1, 0.2, 0.3])
        tgt = jnp.linspace(0, 1, 3 * 48 * 48).reshape(3, 48, 48)

        def loss(p, runner):
            out = runner(p, cam, bg=bg, budget=4096)
            return (
                jnp.sum((out.color - tgt) ** 2)
                + 0.05 * jnp.sum(out.depth)
                + 0.02 * jnp.sum(out.alpha ** 2)
            )

        g_t = jax.grad(lambda q: loss(q, run_tiled))(p)
        g_p = jax.grad(lambda q: loss(q, run_pallas))(p)
        assert abs(
            float(loss(p, run_tiled)) - float(loss(p, run_pallas))
        ) < 1e-3
        for k in p:
            np.testing.assert_allclose(
                np.asarray(g_p[k]), np.asarray(g_t[k]),
                rtol=2e-3, atol=2e-4, err_msg=f"grad mismatch for {k}",
            )

    def test_means2d_offset_carrier(self):
        cam = look_at_camera([0, 0, -4], [0, 0, 0], width=32, height=32)
        p = random_scene(16, seed=2)

        def loss(off):
            out = rasterize_pallas(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], jnp.array(cam.camera_center),
                jnp.array(cam.world_view), jnp.array(cam.full_proj),
                cam.tanfovx, cam.tanfovy, 32, 32, 3, jnp.zeros(3),
                instance_budget=2048, means2d_offset=off, interpret=True,
            )
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss)(jnp.zeros((16, 2)))
        assert float(jnp.abs(g).sum()) > 0
