"""Model-stack tests: HexPlane, deformation MLP, Gaussian state, densify, Adam.

HexPlane bilinear sampling is validated against torch.nn.functional.grid_sample
(the exact op the reference uses, scene/hexplane.py:39-43) — an independent
oracle available on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.configs.core import Config, KPlanesConfig, load_config
from fourdgs_tpu.models import deformation as deform_lib
from fourdgs_tpu.models import densify as dens
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models import hexplane as hp
from fourdgs_tpu.ops.knn import mean_sq_dist_3nn
from fourdgs_tpu.train import adam


class TestHexPlane:
    def test_bilinear_matches_torch_grid_sample(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        Ra, Rb, C = 13, 9, 4
        plane_t = rng.normal(size=(1, C, Rb, Ra)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(200, 2)).astype(np.float32)

        ref = F.grid_sample(
            torch.from_numpy(plane_t),
            torch.from_numpy(coords).view(1, 1, -1, 2),
            align_corners=True, mode="bilinear", padding_mode="border",
        ).squeeze().T.numpy()  # [200, C]

        plane_j = jnp.asarray(plane_t[0].transpose(2, 1, 0))  # [Ra, Rb, C]
        out = hp._bilinear_plane(
            plane_j, jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1])
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_init_shapes_and_values(self):
        kcfg = KPlanesConfig(resolution=(8, 8, 8, 5))
        params = hp.init_hexplane(jax.random.key(0), kcfg, (1, 2))
        assert len(params) == 12
        # scale 1: spatial resolutions doubled, temporal unchanged
        assert params["grid_s1_p0"].shape == (16, 16, 32)   # xy
        assert params["grid_s1_p2"].shape == (16, 5, 32)    # xt
        # time planes init to ones, spatial in [0.1, 0.5]
        np.testing.assert_allclose(np.asarray(params["grid_s0_p2"]), 1.0)
        s = np.asarray(params["grid_s0_p0"])
        assert s.min() >= 0.1 and s.max() <= 0.5

    def test_query_feature_dim_and_product(self):
        kcfg = KPlanesConfig(resolution=(8, 8, 8, 5), output_coordinate_dim=16)
        params = hp.init_hexplane(jax.random.key(0), kcfg, (1, 2))
        aabb = jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]])  # [max, min]
        xyz = jnp.zeros((7, 3))
        t = jnp.full((7,), 0.5)
        feats = hp.query_hexplane(params, aabb, xyz, t, 2)
        assert feats.shape == (7, 32)
        # with all-ones planes the product is 1: force and check
        ones = {k: jnp.ones_like(v) for k, v in params.items()}
        f1 = hp.query_hexplane(ones, aabb, xyz, t, 2)
        np.testing.assert_allclose(np.asarray(f1), 1.0, atol=1e-6)

    def test_scalar_time_fast_path_matches_per_point(self):
        # scalar t triggers the temporal-plane matmul sampler
        # (hexplane._bilinear_tslice); values and grid gradients must match
        # the per-point gather path exactly
        kcfg = KPlanesConfig(resolution=(8, 8, 8, 5), output_coordinate_dim=16)
        params = hp.init_hexplane(jax.random.key(3), kcfg, (1, 2))
        params = {k: v * jax.random.uniform(jax.random.key(i), v.shape)
                  for i, (k, v) in enumerate(params.items())}
        aabb = jnp.array([[1.2, 1.1, 1.0], [-1.0, -1.2, -1.4]])
        xyz = jax.random.uniform(jax.random.key(9), (33, 3), minval=-1.5,
                                 maxval=1.5)
        for tv in (0.0, 0.37, 1.0):
            t_vec = jnp.full((33,), tv)
            t_sc = jnp.float32(tv)
            a = hp.query_hexplane(params, aabb, xyz, t_vec, 2)
            b = hp.query_hexplane(params, aabb, xyz, t_sc, 2)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
            )
            ga = jax.grad(lambda p: jnp.sum(
                hp.query_hexplane(p, aabb, xyz, t_vec, 2) ** 2))(params)
            gb = jax.grad(lambda p: jnp.sum(
                hp.query_hexplane(p, aabb, xyz, t_sc, 2) ** 2))(params)
            for k in ga:
                np.testing.assert_allclose(
                    np.asarray(gb[k]), np.asarray(ga[k]),
                    rtol=1e-4, atol=1e-5, err_msg=k,
                )
            # gradient w.r.t. the query points must also agree (flows
            # through the interpolation-weight matrix)
            gxa = jax.grad(lambda q: jnp.sum(
                hp.query_hexplane(params, aabb, q, t_vec, 2) ** 2))(xyz)
            gxb = jax.grad(lambda q: jnp.sum(
                hp.query_hexplane(params, aabb, q, t_sc, 2) ** 2))(xyz)
            np.testing.assert_allclose(
                np.asarray(gxb), np.asarray(gxa), rtol=1e-4, atol=1e-5
            )

    def test_aabb_normalization_is_reference_inverted(self):
        aabb = jnp.array([[2.0, 2.0, 2.0], [-2.0, -2.0, -2.0]])
        # reference quirk: max → −1, min → +1
        n = hp.normalize_aabb(jnp.array([[2.0, -2.0, 0.0]]), aabb)
        np.testing.assert_allclose(np.asarray(n)[0], [-1.0, 1.0, 0.0], atol=1e-6)

    def test_regularizers_zero_at_identity(self):
        kcfg = KPlanesConfig(resolution=(8, 8, 8, 5))
        params = hp.init_hexplane(jax.random.key(0), kcfg, (1,))
        # constant planes ⇒ zero second differences; time planes at ones ⇒ L1=0
        const = {k: jnp.ones_like(v) * 0.3 for k, v in params.items()}
        r = hp.hexplane_regularization(const, 1, 1.0, 1.0, 0.0)
        assert abs(float(r)) < 1e-10
        r_time = hp.hexplane_regularization(params, 1, 0.0, 0.0, 1.0)
        assert abs(float(r_time)) < 1e-10  # |1 - 1| = 0

    def test_regularizer_grad_flows(self):
        kcfg = KPlanesConfig(resolution=(8, 8, 8, 5))
        params = hp.init_hexplane(jax.random.key(1), kcfg, (1,))
        g = jax.grad(
            lambda p: hp.hexplane_regularization(p, 1, 1e-4, 1e-2, 1e-4)
        )(params)
        total = sum(float(jnp.abs(v).sum()) for v in g.values())
        assert total > 0


class TestDeformation:
    @pytest.fixture
    def setup(self):
        cfg = load_config()
        cfg.hidden.kplanes_config = KPlanesConfig(
            resolution=(8, 8, 8, 5), output_coordinate_dim=8
        )
        cfg.hidden.multires = (1, 2)
        cfg.hidden.net_width = 16
        cfg.hidden.defor_depth = 1
        params = deform_lib.init_deformation(jax.random.key(0), cfg.hidden, 16)
        aabb = jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]])
        return cfg, params, aabb

    def _inputs(self, n=5):
        k = jax.random.key(3)
        ks = jax.random.split(k, 6)
        return (
            jax.random.normal(ks[0], (n, 3)) * 0.3,
            jax.random.normal(ks[1], (n, 3)),
            jax.random.normal(ks[2], (n, 4)),
            jax.random.normal(ks[3], (n, 1)),
            jax.random.normal(ks[4], (n, 16, 3)),
            jax.random.uniform(ks[5], (n,)),
        )

    def test_shapes(self, setup):
        cfg, params, aabb = setup
        xyz, s, r, o, sh, t = self._inputs()
        ox, os_, orot, oop, osh = deform_lib.deform(
            params, cfg.hidden, aabb, xyz, s, r, o, sh, t
        )
        assert ox.shape == (5, 3) and os_.shape == (5, 3)
        assert orot.shape == (5, 4) and oop.shape == (5, 1)
        assert osh.shape == (5, 16, 3)

    def test_disable_flags(self, setup):
        cfg, params, aabb = setup
        xyz, s, r, o, sh, t = self._inputs()
        cfg.hidden.no_dx = True
        cfg.hidden.no_ds = True
        cfg.hidden.no_dr = True
        cfg.hidden.no_do = True
        cfg.hidden.no_dshs = True
        ox, os_, orot, oop, osh = deform_lib.deform(
            params, cfg.hidden, aabb, xyz, s, r, o, sh, t
        )
        np.testing.assert_array_equal(np.asarray(ox), np.asarray(xyz))
        np.testing.assert_array_equal(np.asarray(os_), np.asarray(s))
        np.testing.assert_array_equal(np.asarray(orot), np.asarray(r))
        np.testing.assert_array_equal(np.asarray(oop), np.asarray(o))
        np.testing.assert_array_equal(np.asarray(osh), np.asarray(sh))

    def test_time_dependence(self, setup):
        cfg, params, aabb = setup
        cfg.hidden.no_dx = False
        # at init the time planes are identically 1 (time-independent by
        # design); perturb them so time variation can show through
        params = dict(params)
        for k in list(params):
            if "grid" in k and params[k].shape[1] == 5:  # temporal axis Rb=5
                params[k] = params[k] + 0.1 * jax.random.normal(
                    jax.random.key(9), params[k].shape
                )
        xyz, s, r, o, sh, _ = self._inputs()
        o1 = deform_lib.deform(params, cfg.hidden, aabb, xyz, s, r, o, sh,
                               jnp.zeros(5))
        o2 = deform_lib.deform(params, cfg.hidden, aabb, xyz, s, r, o, sh,
                               jnp.ones(5))
        assert float(jnp.abs(o1[0] - o2[0]).max()) > 1e-7

    def test_param_group_split(self, setup):
        cfg, params, aabb = setup
        labels = deform_lib.split_param_labels(params)
        flat = jax.tree.leaves(labels)
        assert "grid" in flat and "deformation" in flat
        # grid keys labeled grid, mlp keys labeled deformation
        assert all(
            v == "grid" for k, lab in labels.items() if "grid" in k
            for v in jax.tree.leaves(lab)
        )


class TestKnn:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = jnp.array(rng.normal(size=(300, 3)), jnp.float32)
        out = mean_sq_dist_3nn(pts, chunk=128)
        d2 = np.sum(
            (np.asarray(pts)[:, None, :] - np.asarray(pts)[None, :, :]) ** 2,
            axis=-1,
        )
        np.fill_diagonal(d2, np.inf)
        expect = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def small_state(n=32, cap=64, seed=0):
    cfg = load_config()
    cfg.tpu.capacity = cap
    cfg.hidden.kplanes_config = KPlanesConfig(
        resolution=(4, 4, 4, 3), output_coordinate_dim=4
    )
    cfg.hidden.multires = (1,)
    cfg.hidden.net_width = 8
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    state = G.create_from_pcd(jax.random.key(0), cfg, pts, cols, 1.0)
    return cfg, state


class TestGaussianState:
    def test_create_from_pcd(self):
        cfg, state = small_state()
        assert int(G.count_alive(state)) == 32
        assert state.params["xyz"].shape == (64, 3)
        assert state.params["f_rest"].shape == (64, 45)
        # initial opacity sigmoid(logit) == 0.1
        op = np.asarray(G.get_opacity(state.params))[:32]
        np.testing.assert_allclose(op, 0.1, atol=1e-6)
        # scales = log(sqrt(mean 3nn sq dist)), equal across axes
        s = np.asarray(state.params["scaling"])[:32]
        np.testing.assert_allclose(s[:, 0], s[:, 1])
        # aabb = [max, min]
        assert np.all(np.asarray(state.aabb[0]) >= np.asarray(state.aabb[1]))

    def test_isotropic_scaling_branch(self):
        cfg, state = small_state()
        s = G.get_scaling(state.params, isotropic=True)
        np.testing.assert_allclose(np.asarray(s[:, 0]), np.asarray(s[:, 2]))

    def test_one_up_sh(self):
        cfg, state = small_state()
        for _ in range(5):
            state = G.one_up_sh_degree(state, 3)
        assert int(state.active_sh_degree) == 3


class TestDensify:
    def test_clone_into_free_slots(self):
        cfg, state = small_state(n=8, cap=32)
        mom = (jax.tree.map(jnp.ones_like, state.params),
               jax.tree.map(jnp.ones_like, state.params))
        grads = jnp.zeros((32,)).at[2].set(1.0).at[5].set(1.0)
        state2, mom2, n_new = dens.densify_and_clone(
            state, mom, grads, 0.5, scene_extent=10000.0, percent_dense=0.01
        )
        assert int(n_new) == 2
        assert int(G.count_alive(state2)) == 10
        # clones landed in the first free slots (8, 9) with parents' values
        np.testing.assert_allclose(
            np.asarray(state2.params["xyz"][8]),
            np.asarray(state.params["xyz"][2]),
        )
        np.testing.assert_allclose(
            np.asarray(state2.params["xyz"][9]),
            np.asarray(state.params["xyz"][5]),
        )
        # moments zeroed at the new slots, untouched elsewhere
        assert float(mom2[0]["xyz"][8].sum()) == 0.0
        assert float(mom2[0]["xyz"][2].sum()) == 3.0
        # postfix reset zeroed the stats
        assert float(state2.xyz_gradient_accum.sum()) == 0.0

    def test_clone_respects_percent_dense(self):
        cfg, state = small_state(n=8, cap=32)
        mom = (jax.tree.map(jnp.zeros_like, state.params),) * 2
        grads = jnp.ones((32,))
        # tiny extent ⇒ every gaussian is "too big" to clone
        state2, _, n_new = dens.densify_and_clone(
            state, mom, grads, 0.5, scene_extent=1e-6, percent_dense=0.01
        )
        assert int(n_new) == 0

    def test_split_spawns_children_kills_parent(self):
        cfg, state = small_state(n=8, cap=32)
        mom = (jax.tree.map(jnp.zeros_like, state.params),) * 2
        grads = jnp.zeros((32,)).at[3].set(1.0)
        state2, mom2, n_new = dens.densify_and_split(
            jax.random.key(1), state, mom, grads, 0.5,
            scene_extent=1e-6, percent_dense=0.01,
        )
        assert int(n_new) == 2
        # net: -1 parent +2 children
        assert int(G.count_alive(state2)) == 9
        assert not bool(state2.alive[3])
        # children scale = parent/1.6
        parent_scale = np.exp(np.asarray(state.params["scaling"][3]))
        child_scale = np.exp(np.asarray(state2.params["scaling"][8]))
        np.testing.assert_allclose(child_scale, parent_scale / 1.6, rtol=1e-5)

    def test_capacity_overflow_drops(self):
        cfg, state = small_state(n=30, cap=32)
        mom = (jax.tree.map(jnp.zeros_like, state.params),) * 2
        grads = jnp.ones((32,))
        state2, _, n_new = dens.densify_and_clone(
            state, mom, grads, 0.5, scene_extent=10000.0, percent_dense=0.01
        )
        assert int(n_new) == 2  # only 2 free slots existed
        assert int(G.count_alive(state2)) == 32

    def test_prune(self):
        cfg, state = small_state(n=8, cap=32)
        params = dict(state.params)
        params["opacity"] = params["opacity"].at[1, 0].set(G.inverse_sigmoid(0.001))
        state = state._replace(
            params=params,
            max_radii2d=state.max_radii2d.at[4].set(50.0),
        )
        state2, n_pruned = dens.prune(
            state, min_opacity=0.005, scene_extent=1e9, size_threshold_on=True
        )
        assert int(n_pruned) == 2
        assert not bool(state2.alive[1]) and not bool(state2.alive[4])

    def test_reset_opacity(self):
        cfg, state = small_state(n=8, cap=32)
        mom = (jax.tree.map(jnp.ones_like, state.params),
               jax.tree.map(jnp.ones_like, state.params))
        state2, mom2 = dens.reset_opacity(state, mom)
        op = np.asarray(G.get_opacity(state2.params))[:8]
        assert op.max() <= 0.01 + 1e-6
        assert float(jnp.abs(mom2[0]["opacity"]).sum()) == 0.0
        assert float(jnp.abs(mom2[0]["xyz"]).sum()) > 0.0

    def test_stats_accumulation(self):
        cfg, state = small_state(n=8, cap=32)
        g = jnp.ones((32, 2)) * 0.001
        radii = jnp.zeros((32,), jnp.int32).at[:8].set(5)
        state2 = dens.add_densification_stats(state, g, radii, 100, 200)
        # norm(0.001·[50, 100]) = norm([0.05, 0.1])
        expect = np.hypot(0.05, 0.1)
        np.testing.assert_allclose(
            np.asarray(state2.xyz_gradient_accum[:8]), expect, rtol=1e-5
        )
        assert float(state2.denom[8]) == 0.0  # dead slot untouched
        assert float(state2.max_radii2d[0]) == 5.0


class TestAdam:
    def test_converges_quadratic(self):
        params = {"x": jnp.array([5.0, -3.0])}
        st = adam.init(params)
        lr = {"x": jnp.float32(0.1)}
        for _ in range(500):
            g = jax.grad(lambda p: jnp.sum(p["x"] ** 2))(params)
            params, st = adam.update(params, g, st, lr)
        assert float(jnp.abs(params["x"]).max()) < 1e-2

    def test_expon_lr_schedule(self):
        lr0 = float(adam.expon_lr(0, 1e-2, 1e-4, max_steps=100))
        lr_mid = float(adam.expon_lr(50, 1e-2, 1e-4, max_steps=100))
        lr_end = float(adam.expon_lr(100, 1e-2, 1e-4, max_steps=100))
        assert abs(lr0 - 1e-2) < 1e-8
        assert abs(lr_mid - 1e-3) < 1e-8  # geometric midpoint
        assert abs(lr_end - 1e-4) < 1e-9
        # clamps past max_steps
        assert abs(float(adam.expon_lr(500, 1e-2, 1e-4, max_steps=100)) - 1e-4) < 1e-9

    def test_lr_tree_layout(self):
        cfg, state = small_state()
        lrs = adam.learning_rates(0, cfg.opt, spatial_lr_scale=2.0)
        assert abs(float(lrs["xyz"]) - cfg.opt.position_lr_init * 2.0) < 1e-9
        assert abs(float(lrs["f_rest"]) - cfg.opt.feature_lr / 20.0) < 1e-9
        tree = adam.lr_tree_for_params(state.params, lrs)
        assert float(jax.tree.leaves(tree["deform"]["feature_out"])[0]) == float(
            lrs["deformation"]
        )
        grid_key = next(k for k in state.params["deform"] if "grid" in k)
        assert float(jax.tree.leaves(tree["deform"][grid_key])[0]) == float(
            lrs["grid"]
        )


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = load_config()
        assert cfg.opt.iterations == 30_000
        assert cfg.opt.opacity_lr == 0.05
        assert cfg.hidden.no_do and cfg.hidden.no_dshs
        assert cfg.hidden.kplanes_config.resolution == (64, 64, 64, 25)
        assert cfg.model.sh_degree == 3

    def test_override_file_with_base(self, tmp_path):
        base = tmp_path / "base.py"
        base.write_text(
            "OptimizationParams = {'iterations': 111}\n"
            "ModelHiddenParams = {'net_width': 128}\n"
        )
        child = tmp_path / "child.py"
        child.write_text(
            "_base_ = 'base.py'\n"
            "OptimizationParams = {'batch_size': 4}\n"
        )
        cfg = load_config(child)
        assert cfg.opt.iterations == 111
        assert cfg.opt.batch_size == 4
        assert cfg.hidden.net_width == 128

    def test_unknown_knob_raises(self, tmp_path):
        f = tmp_path / "bad.py"
        f.write_text("OptimizationParams = {'not_a_knob': 1}\n")
        with pytest.raises(KeyError):
            load_config(f)
