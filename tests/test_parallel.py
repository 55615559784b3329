"""Multi-device tests on the virtual 8-CPU mesh.

- GSPMD data+model sharded train step (the __graft_entry__ dryrun path)
- tile-row-sharded (sp) Pallas rendering: loss and parameter gradients must
  match the single-device pallas pipeline exactly — validates that slab
  clipping + local binning + the psum-only communication pattern is lossless.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.configs.core import KPlanesConfig, load_config
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.parallel import mesh as pmesh
from fourdgs_tpu.parallel.sp import make_sp_render_loss
from fourdgs_tpu.render import CameraArrays
from tests.test_math_core import look_at_camera


def sp_cfg():
    cfg = load_config()
    cfg.tpu.capacity = 512
    cfg.tpu.instance_budget = 4096
    cfg.hidden.kplanes_config = KPlanesConfig(
        resolution=(8, 8, 8, 4), output_coordinate_dim=8
    )
    cfg.hidden.multires = (1,)
    cfg.hidden.net_width = 16
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False
    cfg.model.sh_degree = 1
    cfg.model.white_background = False
    return cfg


def build_state(cfg, n=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return G.create_from_pcd(jax.random.key(seed), cfg, pts, cols, 1.0)


class TestGspmdDryrun:
    def test_graft_entry_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestTileRowSharding:
    @pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2)])
    def test_sp_loss_and_grads_match_single_device(self, mesh_shape):
        n_data, n_model = mesh_shape
        cfg = sp_cfg()
        state = build_state(cfg)
        W, H = 32, 64  # grid_y = 4 tile rows, divisible by model axis
        B = 2
        cams = [
            CameraArrays.from_camera(
                look_at_camera([0.3 * i, 0.2, -3], [0, 0, 0],
                               width=W, height=H, time=0.4 * i)
            )
            for i in range(B)
        ]
        batch_cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        rng = np.random.default_rng(5)
        gts = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))

        # single-device reference loss through the same pallas pipeline
        mesh1 = pmesh.make_mesh(1, 1)
        loss_1 = make_sp_render_loss(
            cfg, mesh1, W, H, "fine", 1, interpret=True
        )
        mesh_n = pmesh.make_mesh(n_data, n_model)
        loss_n = make_sp_render_loss(
            cfg, mesh_n, W, H, "fine", 1, interpret=True
        )

        args = (state.params, state, batch_cams, gts)
        l1 = float(loss_1(*args))
        ln = float(loss_n(*args))
        assert abs(l1 - ln) < 1e-5

        g1 = jax.grad(lambda p: loss_1(p, state, batch_cams, gts))(
            state.params
        )
        gn = jax.grad(lambda p: loss_n(p, state, batch_cams, gts))(
            state.params
        )
        for k in ("xyz", "opacity", "scaling", "rotation", "f_dc"):
            np.testing.assert_allclose(
                np.asarray(gn[k]), np.asarray(g1[k]),
                rtol=2e-4, atol=1e-6, err_msg=f"grad mismatch: {k}",
            )
        # deformation-net grads all-reduce across both axes
        d1 = jax.tree.leaves(g1["deform"])
        dn = jax.tree.leaves(gn["deform"])
        for a, b in zip(dn, d1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )
