"""CLI integration: train.py → render.py → metrics.py on a synthetic D-NeRF
dataset (the reference's debug_test.sh smoke matrix at CI scale)."""

import json
import os
import sys

import numpy as np
import pytest

from tests.test_data import make_dnerf_dataset

# the full CLI e2e matrix (train→render→metrics→resume→export, mesh train)
# is the heavy tail of the suite — slow lane (see pyproject addopts)
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("dnerf_data")
    make_dnerf_dataset(data_dir, n_train=6, n_test=2, size=64)
    out_root = tmp_path_factory.mktemp("out")
    model_path = str(out_root / "smoke")

    import train as train_cli

    train_cli.main([
        "-s", str(data_dir),
        "--model_path", model_path,
        "--expname", "smoke",
        "--quiet",
        "--test_iterations", "6",
        "--save_iterations", "6",
        "--checkpoint_iterations", "6",
        "--override",
        "opt.iterations=6", "opt.coarse_iterations=4",
        "opt.densify_from_iter=1000", "opt.pruning_from_iter=1000",
        "tpu.capacity=4096", "tpu.instance_budget=16384",
        "tpu.tile_budget=256", "tpu.blend_chunk=64",
        'tpu.backend="tile"',
        "hidden.net_width=16", "hidden.defor_depth=0",
        "hidden.multires=[1]",
        'hidden.kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4, "output_coordinate_dim": 8, "resolution": [8, 8, 8, 4]}',
    ])
    return str(data_dir), model_path


class TestTrainCLI:
    def test_outputs_exist(self, trained_model):
        data_dir, model_path = trained_model
        assert os.path.exists(os.path.join(model_path, "cfg_args.json"))
        assert os.path.exists(os.path.join(model_path, "timing_report.json"))
        assert os.path.exists(os.path.join(model_path, "training_logs.json"))
        assert os.path.exists(os.path.join(model_path, "eval_log.jsonl"))
        # observability stream (reference train.py:488-538 tensorboard parity)
        assert os.path.exists(os.path.join(model_path, "events.jsonl"))
        assert os.listdir(os.path.join(model_path, "eval_images"))
        snap = os.path.join(model_path, "point_cloud", "iteration_6")
        assert os.path.exists(os.path.join(snap, "point_cloud.ply"))
        assert os.path.exists(os.path.join(snap, "deformation.npz"))
        assert any(
            d.startswith("chkpnt_fine_") for d in os.listdir(model_path)
        )
        logs = json.load(open(os.path.join(model_path, "training_logs.json")))
        assert logs and np.isfinite(logs[-1]["loss"])

    def test_eval_log_has_psnr(self, trained_model):
        _, model_path = trained_model
        rows = [json.loads(l) for l in
                open(os.path.join(model_path, "eval_log.jsonl"))]
        assert rows and "test" in rows[-1]
        assert np.isfinite(rows[-1]["test"]["psnr"])

    def test_render_and_metrics(self, trained_model):
        data_dir, model_path = trained_model
        import render as render_cli

        render_cli.main([
            "--model_path", model_path,
            "--source_path", data_dir,
            "--skip_video", "--skip_train",
        ])
        test_dir = os.path.join(model_path, "test", "ours_6")
        renders = os.listdir(os.path.join(test_dir, "renders"))
        assert len(renders) == 2  # the synthetic dataset's 2 test cameras

        import metrics as metrics_cli

        metrics_cli.main(["--model_path", model_path])
        results = json.load(open(os.path.join(model_path, "results.json")))
        vals = results["ours_6"]
        assert np.isfinite(vals["PSNR"]) and np.isfinite(vals["MS-SSIM"])

    def test_resume_from_checkpoint(self, trained_model):
        data_dir, model_path = trained_model
        import train as train_cli

        ckpt = os.path.join(model_path, "chkpnt_fine_6")
        train_cli.main([
            "-s", data_dir,
            "--model_path", model_path + "_resumed",
            "--expname", "smoke_resume",
            "--quiet",
            "--start_checkpoint", ckpt,
            "--test_iterations", "-1",
            "--save_iterations", "-1",
            "--override",
            "opt.iterations=8", "opt.coarse_iterations=4",
            "opt.densify_from_iter=1000", "opt.pruning_from_iter=1000",
            "tpu.capacity=4096", "tpu.instance_budget=16384",
            "tpu.tile_budget=256", "tpu.blend_chunk=64",
            'tpu.backend="tile"',
            "hidden.net_width=16", "hidden.defor_depth=0",
            "hidden.multires=[1]",
            'hidden.kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4, "output_coordinate_dim": 8, "resolution": [8, 8, 8, 4]}',
        ])
        assert os.path.exists(
            os.path.join(model_path + "_resumed", "training_logs.json")
        )

    def test_export_perframe(self, trained_model):
        data_dir, model_path = trained_model
        import export_perframe_3DGS as exp

        exp.main(["--model_path", model_path, "--source_path", data_dir])
        out = os.path.join(model_path, "gaussian_pertimestamp")
        plys = [f for f in os.listdir(out) if f.endswith(".ply")]
        assert len(plys) == 2
        from fourdgs_tpu.data.ply import load_gaussian_ply

        params = load_gaussian_ply(os.path.join(out, plys[0]))
        assert params["xyz"].shape[0] == 2000  # init cloud size

    def test_gradient_from_checkpoint(self, trained_model):
        """Checkpoint-based gradient timeline CLI (reference
        visualize_gradient_from_checkpoint.py:1-254): PNG + JSON from a
        saved model, no retraining."""
        data_dir, model_path = trained_model
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "scripts"))
        import gradient_from_checkpoint as gfc

        out = os.path.join(model_path, "grad_ckpt")
        gfc.main([
            "--checkpoint", os.path.join(model_path, "chkpnt_fine_6"),
            "-s", data_dir, "--out", out, "--n_times", "3",
        ])
        timeline = json.load(
            open(os.path.join(out, "gradient_timeline.json"))
        )
        assert len(timeline) == 3
        assert all(np.isfinite(r["grad_norm_mean"]) for r in timeline)
        assert any(f.endswith(".png") for f in os.listdir(out))


class TestMeshCLI:
    """train.py --mesh: the sharded dp×sp trainer reachable from the CLI
    (VERDICT r2 #2/#4) — trains end-to-end on the virtual 8-CPU mesh."""

    def test_train_on_mesh(self, tmp_path_factory):
        data_dir = tmp_path_factory.mktemp("dnerf_mesh")
        make_dnerf_dataset(data_dir, n_train=4, n_test=2, size=32)
        model_path = str(tmp_path_factory.mktemp("out_mesh") / "mesh")

        import train as train_cli

        train_cli.main([
            "-s", str(data_dir),
            "--model_path", model_path,
            "--expname", "mesh_smoke",
            "--quiet",
            "--mesh", "data=2,model=2",
            "--test_iterations", "3",
            "--save_iterations", "3",
            "--override",
            "opt.iterations=3", "opt.coarse_iterations=2",
            "opt.densify_from_iter=1000", "opt.pruning_from_iter=1000",
            "opt.opacity_reset_interval=1000",
            "tpu.capacity=2048", "tpu.instance_budget=8192",
            "tpu.tile_budget=128", "tpu.blend_chunk=64",
            'tpu.backend="pallas"',
            "hidden.net_width=16", "hidden.defor_depth=0",
            "hidden.multires=[1]",
            'hidden.kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4, "output_coordinate_dim": 8, "resolution": [8, 8, 8, 4]}',
        ])
        logs = json.load(open(os.path.join(model_path, "training_logs.json")))
        assert logs and np.isfinite(logs[-1]["loss"])
        # snapshot + checkpoint written from the replicated sharded state
        snap = os.path.join(model_path, "point_cloud", "iteration_3")
        assert os.path.exists(os.path.join(snap, "point_cloud.ply"))
