"""Oracle rasterizer tests: rendering semantics + gradient correctness.

The pure-JAX reference rasterizer (fourdgs_tpu.ops.reference) is the allclose
anchor for the tiled/Pallas path, so its own correctness is established here
independently: geometric checks, blending-order checks, and finite-difference
validation of every gradient (d-means3D, d-scales, d-rotations, d-opacity,
d-SH) — the properties BASELINE.md requires ("all pixel-gradients allclose").
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops.reference import rasterize_reference
from tests.test_math_core import look_at_camera


def render(params, cam, sh_degree=0, bg=None, **kw):
    bg = jnp.zeros(3) if bg is None else bg
    return rasterize_reference(
        params["means3d"], params["scales"], params["rotations"],
        params["opacities"], params["shs"],
        jnp.array(cam.camera_center), jnp.array(cam.world_view),
        jnp.array(cam.full_proj), cam.tanfovx, cam.tanfovy,
        cam.width, cam.height, sh_degree, bg, **kw,
    )


def single_gaussian(color=(1.0, 0.0, 0.0), opacity=4.0, scale=0.3, z=0.0):
    from fourdgs_tpu.utils import sh as sh_lib
    rgb = jnp.array([color])
    return {
        "means3d": jnp.array([[0.0, 0.0, z]]),
        "scales": jnp.full((1, 3), scale),
        "rotations": jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        "opacities": jax.nn.sigmoid(jnp.array([opacity])),
        "shs": sh_lib.rgb_to_sh(rgb)[:, None, :],
    }


class TestForward:
    def test_empty_scene_is_background(self):
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=32, height=32)
        p = single_gaussian()
        p["means3d"] = jnp.array([[0.0, 0.0, -20.0]])  # behind camera
        out = render(p, cam, bg=jnp.array([0.2, 0.4, 0.6]))
        np.testing.assert_allclose(
            np.asarray(out.color),
            np.broadcast_to(np.array([0.2, 0.4, 0.6])[:, None, None], (3, 32, 32)),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-7)

    def test_blob_centered_and_colored(self):
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=33, height=33)
        out = render(single_gaussian(opacity=8.0), cam)
        img = np.asarray(out.color)
        cy, cx = np.unravel_index(np.argmax(img[0]), img[0].shape)
        assert abs(cy - 16) <= 1 and abs(cx - 16) <= 1
        assert img[0, 16, 16] > 0.9          # red channel saturated at center
        assert img[1, 16, 16] < 0.02         # green ~0
        # radially symmetric
        np.testing.assert_allclose(img[0, 16, 10], img[0, 16, 22], rtol=0.05)

    def test_front_occludes_back(self):
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=32, height=32)
        front = single_gaussian(color=(1, 0, 0), opacity=12.0, z=-1.0)
        back = single_gaussian(color=(0, 1, 0), opacity=12.0, z=1.0)
        both = {k: jnp.concatenate([front[k], back[k]]) for k in front}
        out = render(both, cam)
        img = np.asarray(out.color)
        assert img[0, 16, 16] > 0.9 and img[1, 16, 16] < 0.1
        # swap concat order — depth sort must make result identical
        both_r = {k: jnp.concatenate([back[k], front[k]]) for k in front}
        out_r = render(both_r, cam)
        np.testing.assert_allclose(np.asarray(out_r.color), img, atol=1e-6)

    def test_depth_output(self):
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=32, height=32)
        out = render(single_gaussian(opacity=12.0), cam)
        d = np.asarray(out.depth)[0]
        a = np.asarray(out.alpha)[0]
        # depth ≈ alpha·z at the center (D = Σ z·α·T)
        assert abs(d[16, 16] - a[16, 16] * 5.0) < 0.05

    def test_alpha_composition_semi_transparent(self):
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=32, height=32)
        p = single_gaussian(color=(1, 1, 1), opacity=0.0, scale=2.0)  # sigmoid(0)=0.5
        out = render(p, cam, bg=jnp.zeros(3))
        c = float(np.asarray(out.color)[0, 16, 16])
        assert 0.45 < c <= 0.55  # single layer of α≈0.5 white

    def test_transmittance_stop(self):
        # Many stacked opaque layers: T hits the 1e-4 stop; far layers invisible
        cam = look_at_camera([0, 0, -5], [0, 0, 0], width=16, height=16)
        n = 32
        zs = np.linspace(-1, 1, n)
        p = {
            "means3d": jnp.array([[0.0, 0.0, z] for z in zs]),
            "scales": jnp.full((n, 3), 1.0),
            "rotations": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
            "opacities": jnp.full((n,), 0.9),
            "shs": jnp.tile(jnp.array([[[1.0, 1.0, 1.0]]]), (n, 1, 1)),
        }
        out = render(p, cam, bg=jnp.array([100.0, 100.0, 100.0]))
        # at the center T hits the 1e-4 stop: the huge bg must be invisible
        assert float(np.asarray(out.color)[0, 8, 8]) < 2.0
        assert float(np.asarray(out.alpha)[0, 8, 8]) > 0.999


class TestGradients:
    def _fd_check(self, params, key, cam, rtol=5e-2, atol=2e-2, eps=2e-3):
        # float32 central differences on a discontinuous renderer (α floor,
        # tile-rect edges) ⇒ atol absorbs O(1e-2) FD noise; the rtol tracks
        # the dominant analytic agreement.
        """Central finite differences vs autodiff on a scalar image loss."""
        tgt = jnp.linspace(0, 1, 3 * cam.width * cam.height).reshape(
            3, cam.height, cam.width
        )

        def loss(p):
            out = render(p, cam, sh_degree=0, bg=jnp.array([0.1, 0.1, 0.1]))
            return jnp.sum((out.color - tgt) ** 2) + 0.1 * jnp.sum(out.depth)

        g = jax.grad(loss)(params)[key]
        gn = np.asarray(g)
        flat = params[key].flatten()
        fd = np.zeros_like(np.asarray(flat))
        for i in range(flat.shape[0]):
            pp = dict(params); pm = dict(params)
            pp[key] = flat.at[i].add(eps).reshape(params[key].shape)
            pm[key] = flat.at[i].add(-eps).reshape(params[key].shape)
            fd[i] = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        fd = fd.reshape(gn.shape)
        np.testing.assert_allclose(gn, fd, rtol=rtol, atol=atol)

    @pytest.fixture
    def tiny_scene(self):
        rng = np.random.default_rng(7)
        n = 4
        return {
            "means3d": jnp.array(rng.uniform(-0.4, 0.4, (n, 3)), jnp.float32),
            "scales": jnp.array(rng.uniform(0.2, 0.5, (n, 3)), jnp.float32),
            "rotations": jnp.array(
                rng.normal(size=(n, 4)) + np.array([3.0, 0, 0, 0]), jnp.float32
            ),
            "opacities": jnp.array(rng.uniform(0.3, 0.7, (n,)), jnp.float32),
            "shs": jnp.array(rng.uniform(-0.3, 0.8, (n, 1, 3)), jnp.float32),
        }, look_at_camera([0, 0, -4], [0, 0, 0], width=12, height=12)

    def test_grad_means3d(self, tiny_scene):
        p, cam = tiny_scene
        self._fd_check(p, "means3d", cam)

    def test_grad_scales(self, tiny_scene):
        p, cam = tiny_scene
        self._fd_check(p, "scales", cam)

    def test_grad_rotations(self, tiny_scene):
        p, cam = tiny_scene
        self._fd_check(p, "rotations", cam)

    def test_grad_opacity(self, tiny_scene):
        p, cam = tiny_scene
        self._fd_check(p, "opacities", cam)

    def test_grad_sh(self, tiny_scene):
        p, cam = tiny_scene
        self._fd_check(p, "shs", cam)

    def test_means2d_offset_carrier(self, tiny_scene):
        p, cam = tiny_scene

        def loss(off):
            out = render(p, cam, means2d_offset=off)
            return jnp.sum(out.color ** 2)

        off = jnp.zeros((4, 2))
        g = jax.grad(loss)(off)
        assert float(jnp.abs(g).sum()) > 0  # gradient flows to the carrier
