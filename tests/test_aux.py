"""Aux-subsystem tests: timer, gradient tracker, debug images, viewer,
samplers, dense grid, point growth, timing visualizer, sh_degree=0 path."""

import json
import os
import socket
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.data.samplers import fine_sampler_order, get_stamp_list
from fourdgs_tpu.models import densify as dens
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models.grid import init_dense_grid, sample_dense_grid
from fourdgs_tpu.utils.gradient_tracker import GradientTracker
from fourdgs_tpu.utils.timer import DetailedTimer, Timer


class TestTimer:
    def test_pausable_wall_clock(self):
        t = Timer()
        t.start()
        time.sleep(0.05)
        t.pause()
        frozen = t.get_elapsed_time()
        time.sleep(0.05)
        assert abs(t.get_elapsed_time() - frozen) < 1e-6
        assert 0.04 < frozen < 0.5

    def test_detailed_timer_report(self, tmp_path):
        dt = DetailedTimer(str(tmp_path))
        for i in range(1, 4):
            dt.start_iteration(i)
            dt.start_timer("fine_render")
            time.sleep(0.01)
            dt.end_timer("fine_render")
            dt.log_iteration(i, 0.5, 20.0, 0.4, "fine", 1000)
            dt.end_iteration(i, "fine")
        p1 = dt.save_timing_report()
        p2 = dt.save_training_logs()
        rep = json.load(open(p1))
        assert len(rep["iterations"]) == 3
        assert "fine_render" in rep["summary"]["operations"]
        assert rep["summary"]["operations"]["fine_render"]["count"] == 3
        logs = json.load(open(p2))
        assert logs[0]["psnr"] == 20.0

    def test_timing_visualizer(self, tmp_path):
        dt = DetailedTimer(str(tmp_path))
        for i in range(1, 6):
            dt.start_iteration(i)
            dt.start_timer("coarse_render")
            dt.end_timer("coarse_render")
            dt.end_iteration(i, "coarse")
        report = dt.save_timing_report()
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "vt", os.path.join(os.path.dirname(__file__), "..",
                               "scripts", "visualize_timing.py")
        )
        vt = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(vt)
        vt.main([report])
        out = os.path.join(str(tmp_path), "timing_plots")
        assert os.path.exists(os.path.join(out, "iteration_times.png"))
        assert os.path.exists(os.path.join(out, "operation_breakdown.png"))
        assert os.path.exists(
            os.path.join(out, "iteration_times_broken.png")
        )
        assert os.path.exists(os.path.join(out, "stage_comparison.png"))
        assert os.path.exists(os.path.join(out, "operation_trends.png"))
        txt = open(os.path.join(out, "timing_analysis.txt")).read()
        assert "timing summary" in txt and "% wall" in txt


class TestGradientTracker:
    def _stats(self, scale=1.0):
        g = {
            "xyz": jnp.ones((8, 3)) * scale,
            "f_dc": jnp.ones((8, 3)),
            "f_rest": jnp.ones((8, 0)),
            "opacity": jnp.ones((8, 1)),
            "scaling": jnp.ones((8, 3)),
            "rotation": jnp.ones((8, 4)),
            "deform": {"grid_s0_p0": jnp.ones((4, 4, 2)),
                       "feature_out": [{"w": jnp.ones((4, 4)),
                                        "b": jnp.ones(4)}]},
        }
        from fourdgs_tpu.utils.gradient_tracker import compute_grad_stats

        return jax.tree.map(float, compute_grad_stats(g))

    def test_record_and_report(self, tmp_path):
        tr = GradientTracker(str(tmp_path))
        for i in range(10, 40, 10):
            tr.record(i, "fine", self._stats())
        p = tr.generate_report()
        rep = json.load(open(p))
        assert rep["iterations"] == [10, 20, 30]
        assert "xyz/norm" in rep["history"]
        assert "grid/norm" in rep["history"]
        assert rep["summary"]["deformation/norm"]["last"] > 0

    def test_anomaly_detection(self, tmp_path):
        tr = GradientTracker(str(tmp_path))
        stats = self._stats()
        stats["xyz"]["norm"] = 1e-9
        for i in range(10):
            tr.record(i, "fine", stats)
        an = tr.detect_anomalies()
        assert "xyz" in an["vanishing"]

    def test_curves_plot(self, tmp_path):
        tr = GradientTracker(str(tmp_path))
        for i in range(5):
            tr.record(i * 10, "fine", self._stats())
        p = tr.visualize_gradient_curves()
        assert p and os.path.exists(p)


class TestDebugImages:
    def test_panels(self, tmp_path):
        from fourdgs_tpu.utils.debug_images import (
            render_training_image, save_debug_image, should_save_progress,
        )

        r = np.random.default_rng(0).uniform(0, 1, (3, 32, 48)).astype(np.float32)
        gt = (r * 255).astype(np.uint8).transpose(1, 2, 0)
        d = np.abs(np.random.default_rng(1).normal(size=(1, 32, 48))).astype(np.float32)
        p1 = save_debug_image(r, gt, "fine", 100, 0.5, str(tmp_path))
        p2 = render_training_image(r, gt, d, "fine", 99, 12.0, str(tmp_path))
        assert os.path.exists(p1) and os.path.exists(p2)
        from PIL import Image

        assert Image.open(p1).size == (96, 32)  # render|gt side by side
        assert Image.open(p2).size == (144, 32)  # gt|render|depth
        assert should_save_progress(9) and should_save_progress(99)
        assert not should_save_progress(10)


class TestViewer:
    def test_socket_roundtrip(self):
        from fourdgs_tpu.viewer import NetworkGUI

        gui = NetworkGUI(port=0)
        port = gui.listener.getsockname()[1]

        result = {}

        def client():
            c = socket.create_connection(("127.0.0.1", port), timeout=5)
            msg = {
                "resolution_x": 16, "resolution_y": 8,
                "train": True, "fov_y": 0.8, "fov_x": 0.9,
                "z_near": 0.01, "z_far": 100.0,
                "shs_python": False, "rot_scale_python": False,
                "keep_alive": False, "scaling_modifier": 1.0,
                "view_matrix": list(np.eye(4).flatten().astype(float)),
                "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
            }
            payload = json.dumps(msg).encode()
            c.sendall(len(payload).to_bytes(4, "little"))
            c.sendall(payload)

            def recv_exact(k):
                buf = b""
                while len(buf) < k:
                    chunk = c.recv(k - len(buf))
                    if not chunk:
                        raise ConnectionError
                    buf += chunk
                return buf

            img = recv_exact(16 * 8 * 3)
            n = int.from_bytes(recv_exact(4), "little")
            result["verify"] = recv_exact(n).decode()
            result["img_len"] = len(img)
            c.close()

        t = threading.Thread(target=client)
        t.start()
        time.sleep(0.2)
        gui.try_connect()
        cam, do_training, keep_alive, scale = gui.receive()
        assert cam.width == 16 and cam.height == 8
        assert do_training and not keep_alive
        gui.send(np.full((3, 8, 16), 0.5, np.float32), "/data/scene")
        t.join(timeout=5)
        gui.close()
        assert result["verify"] == "/data/scene"
        assert result["img_len"] >= 16 * 8 * 3


class TestSamplers:
    def test_stamp_list(self):
        idx = get_stamp_list(n_cameras=12, n_poses=3, timestamp=1)
        assert idx == [1, 5, 9]

    def test_fine_sampler_covers_epoch(self):
        import random

        order = fine_sampler_order(40, 4, random.Random(0))
        # every frame index appears via some pose; replay adds duplicates
        assert len(order) >= 40
        assert max(order) < 40 and min(order) >= 0


class TestDenseGrid:
    def test_trilinear_interpolation(self):
        grid = init_dense_grid(jax.random.key(0), 1, (4, 4, 4))
        grid = grid.at[:, :, :, 0].set(
            jnp.arange(4, dtype=jnp.float32)[:, None, None]
            * jnp.ones((4, 4, 4))
        )
        aabb = jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]])
        # halfway along x → value 1.5
        out = sample_dense_grid(grid, aabb, jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), [[1.5]], atol=1e-6)
        # corners
        out = sample_dense_grid(grid, aabb, jnp.array([[-1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), [[0.0]], atol=1e-6)


class TestGrow:
    def test_grow_adds_displaced_points(self):
        from tests.test_model_stack import small_state

        cfg, state = small_state(n=8, cap=32)
        # spread points far apart so all qualify as low-density
        params = dict(state.params)
        params["xyz"] = params["xyz"].at[:8].set(
            jnp.arange(8, dtype=jnp.float32)[:, None]
            * jnp.array([[100.0, 0.0, 0.0]])
        )
        state = state._replace(
            params=params,
            aabb=jnp.array([[1e6, 1e6, 1e6], [-1e6, -1e6, -1e6]]),
        )
        mom = (jax.tree.map(jnp.zeros_like, state.params),) * 2
        state2, mom2, n_new = dens.grow(
            jax.random.key(0), state, mom,
            density_threshold=5.0, displacement_scale=5.0,
        )
        assert int(n_new) == 8
        assert int(G.count_alive(state2)) == 16


class TestSimplifiedRGB:
    @pytest.mark.slow
    def test_sh_degree_zero_end_to_end(self):
        # Instant4D simplified RGB: sh_degree=0 → f_rest is [P,0]
        from tests.test_training import make_gt_scene, tiny_cfg

        cfg = tiny_cfg()
        cfg.model.sh_degree = 0
        cfg.model.use_simplified_rgb = True
        gt, cams = make_gt_scene(n=16)
        state = G.create_from_pcd(
            jax.random.key(0), cfg,
            np.asarray(gt["means3d"]),
            np.full((16, 3), 0.5, np.float32), 1.0,
        )
        assert state.params["f_rest"].shape == (256, 0)
        from fourdgs_tpu.train import adam
        from fourdgs_tpu.train.loop import scene_reconstruction

        opt_state = adam.init(state.params)
        state, opt_state, log = scene_reconstruction(
            cfg, state, opt_state, cams, "coarse", 20,
            cameras_extent=3.0, log_interval=10,
        )
        assert np.isfinite(log.iterations[-1]["loss"])


class TestLPIPS:
    """Native JAX LPIPS port (vendored-net equivalent of the reference's
    lpipsPyTorch). Pretrained weights are not fetchable offline, so these
    validate the architecture with random-init weights in the npz layout."""

    @pytest.mark.parametrize("net", ["alex", "vgg"])
    def test_distance_properties(self, net):
        from fourdgs_tpu.utils import lpips as L

        w = L.random_weights(net, seed=3)
        d = L.make_lpips(w, net)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        y = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        assert float(d(x, x)) == pytest.approx(0.0, abs=1e-9)
        dxy = float(d(x, y))
        assert dxy > 0
        assert float(d(y, x)) == pytest.approx(dxy, rel=1e-5)

    def test_npz_roundtrip(self, tmp_path):
        from fourdgs_tpu.utils import lpips as L

        w = L.random_weights("alex", seed=1)
        p = tmp_path / "lpips_alex.npz"
        np.savez_compressed(p, **w)
        w2 = L.load_weights("alex", path=str(p))
        assert set(w2) == set(w)
        d = L.make_lpips(w2, "alex")
        x = np.random.default_rng(2).uniform(0, 1, (3, 48, 48)).astype(
            np.float32
        )
        assert np.isfinite(float(d(x, x * 0.5)))

    def test_missing_weights_returns_none(self):
        from fourdgs_tpu.utils import lpips as L

        assert L.load_weights("vgg", path="/nonexistent/file.npz") is None


class TestObservability:
    """Tensorboard-class event stream (reference train.py:488-538)."""

    def test_scalars_histograms_images(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from fourdgs_tpu.configs.core import KPlanesConfig, load_config
        from fourdgs_tpu.models import gaussians as G
        from fourdgs_tpu.utils.observability import (
            EventLog, log_scene_stats, read_events,
        )

        ev = EventLog(str(tmp_path))
        ev.add_scalar("fine/train_loss_patches/l1_loss", 0.12, 100)
        ev.add_histogram("fine/scene/opacity_histogram",
                         np.random.default_rng(0).uniform(0, 1, 500), 100)
        ev.add_image("fine/test_view_0/render",
                     np.random.default_rng(1).uniform(0, 1, (3, 16, 16)), 100)

        cfg = load_config()
        cfg.tpu.capacity = 64
        cfg.hidden.kplanes_config = KPlanesConfig(
            resolution=(4, 4, 4, 2), output_coordinate_dim=4
        )
        cfg.hidden.multires = (1,)
        cfg.hidden.net_width = 8
        rng = np.random.default_rng(2)
        state = G.create_from_pcd(
            jax.random.key(0), cfg,
            rng.uniform(-1, 1, (32, 3)).astype(np.float32),
            rng.uniform(0, 1, (32, 3)).astype(np.float32), 1.0,
        )
        log_scene_stats(ev, state, "fine", 100)
        ev.close()

        events = read_events(str(tmp_path))
        tags = {e["tag"] for e in events}
        assert "fine/train_loss_patches/l1_loss" in tags
        assert "fine/scene/opacity_histogram" in tags
        assert "fine/scene/motion_histogram" in tags
        assert "fine/total_points" in tags
        assert "fine/deformation_rate" in tags
        import os
        assert os.listdir(tmp_path / "eval_images")

        # the plotter renders the stream without error
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "plot_events",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "plot_events.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main(["--model_path", str(tmp_path)])
        assert os.path.exists(tmp_path / "plots" / "scalars.png")
        assert os.path.exists(tmp_path / "plots" / "histograms.png")


class TestGradientTimeline:
    """Per-timestamp gradient timeline + offline analyzer
    (reference gradient_tracker.py:817+, analyze_gradients.py)."""

    def test_timeline_and_analyzer(self, tmp_path):
        import jax

        from fourdgs_tpu.configs.core import KPlanesConfig, load_config
        from fourdgs_tpu.models import gaussians as G
        from fourdgs_tpu.utils.gradient_tracker import (
            GradientTracker, gradient_timeline,
        )
        from tests.test_math_core import look_at_camera

        cfg = load_config()
        cfg.tpu.backend = "tile"
        cfg.tpu.capacity = 64
        cfg.tpu.instance_budget = 2048
        cfg.tpu.tile_budget = 128
        cfg.tpu.blend_chunk = 64
        cfg.hidden.kplanes_config = KPlanesConfig(
            resolution=(4, 4, 4, 2), output_coordinate_dim=4
        )
        cfg.hidden.multires = (1,)
        cfg.hidden.net_width = 8
        cfg.hidden.defor_depth = 0
        cfg.hidden.no_dx = False
        cfg.model.sh_degree = 0
        rng = np.random.default_rng(0)
        state = G.create_from_pcd(
            jax.random.key(0), cfg,
            rng.uniform(-0.5, 0.5, (24, 3)).astype(np.float32),
            rng.uniform(0, 1, (24, 3)).astype(np.float32), 1.0,
        )
        cam = look_at_camera([0, 0.3, -3], [0, 0, 0], width=32, height=32)
        gt = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        jp, pp = gradient_timeline(
            cfg, state, cam, gt, str(tmp_path),
            time_points=[0.0, 0.5, 1.0],
        )
        rows = json.load(open(jp))
        assert len(rows) == 3
        assert all(np.isfinite(r["loss"]) for r in rows)
        assert all(r["grad_norm_max"] >= 0 for r in rows)
        assert os.path.exists(pp)

        # analyzer over a synthetic report
        tr = GradientTracker(str(tmp_path))
        for i in range(20):
            tr.record(i * 10, "fine", {
                "xyz": {"norm": 1e-3 * (0.9 ** i)},
                "grid": {"norm": 1e-12},
            })
        tr.generate_report()
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "analyze_gradients",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "analyze_gradients.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.main(["--model_path", str(tmp_path)]) == 0
        res = json.load(open(tmp_path / "gradient_analysis.json"))
        assert "grid" in res["vanishing"]
        assert res["groups"]["xyz"]["status"] in (
            "healthy", "decaying-fast"
        )
