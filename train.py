#!/usr/bin/env python3
"""Train a 4D Gaussian Splatting model (TPU-native).

CLI parity with the reference train.py:545-591:

    python train.py -s <dataset path> --configs <preset.py> --expname <name>
                    [--port ...] [--test_iterations ...] [--save_iterations ...]
                    [--checkpoint_iterations ...] [--start_checkpoint ...]

Stages: coarse (static canonical model) then fine (deformation on), as in
training() (train.py:402-463). Writes cfg dump, timing_report.json,
training_logs.json, snapshots (point_cloud/iteration_*), and checkpoints
under output/<expname>/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-s", "--source_path", type=str, required=True)
    parser.add_argument("--configs", type=str, default=None)
    parser.add_argument("--expname", type=str, default="default")
    parser.add_argument("--model_path", type=str, default="")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[3000, 7000, 14000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[14000, 20000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=6666)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--gradient_tracking", action="store_true",
                        help="record per-group gradient stats every 10 iters "
                             "and write gradient_report.json + curves + the "
                             "per-timestamp timeline at end of run "
                             "(reference train.py:410-416,448-463)")
    parser.add_argument("--debug_mode", action="store_true",
                        help="save render|GT panels every 100 iterations "
                             "(reference train.py:212-219)")
    parser.add_argument("--port", type=int, default=None,
                        help="serve the SIBR network viewer on this port "
                             "(reference train.py:117-142; its default 6009)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="train on a device mesh, e.g. 'data=2,model=4' "
                             "(model = tile-row slabs; must divide tile rows)")
    parser.add_argument("--shard_primitives", action="store_true",
                        help="[P]-sharded fallback: params + Adam moments "
                             "sharded over the 'model' axis with a per-step "
                             "all-gather (for capacities whose replicated "
                             "state would not fit one chip's HBM)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: call jax.distributed.initialize() "
                             "before building the mesh (TPU pods autodiscover;"
                             " see fourdgs_tpu.parallel.multihost)")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--override", nargs="*", default=[],
                        help="dotted config overrides, e.g. opt.iterations=100")
    args = parser.parse_args(argv)

    if args.distributed:
        # must run before any JAX API touches devices
        from fourdgs_tpu.parallel import multihost
        multihost.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax
    import numpy as np

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from fourdgs_tpu.configs.core import config_to_dict, load_config
    from fourdgs_tpu.data.scene import build_scene
    from fourdgs_tpu.train import adam, checkpoint
    from fourdgs_tpu.train.loop import scene_reconstruction
    from fourdgs_tpu.utils.timer import DetailedTimer, Timer

    overrides = {}
    for item in args.override:
        k, _, v = item.partition("=")
        overrides[k] = json.loads(v) if v and v[0] in "[{0123456789-tf.\"" else v
    cfg = load_config(args.configs, **overrides)
    cfg.model.source_path = args.source_path
    model_path = args.model_path or os.path.join("output", args.expname)
    cfg.model.model_path = model_path
    os.makedirs(model_path, exist_ok=True)

    # cfg replay dump (train.py:477-478 equivalent, JSON not eval())
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1, default=str)

    mesh = None
    if args.shard_primitives:
        cfg.tpu.shard_primitives = True
    if args.mesh:
        from fourdgs_tpu.parallel import multihost
        from fourdgs_tpu.parallel.mesh import parse_mesh_arg
        sizes = parse_mesh_arg(args.mesh)
        mesh = multihost.make_hybrid_mesh(sizes["data"], sizes["model"])
        print(f"mesh: data={sizes['data']} x model={sizes['model']} over "
              f"{jax.process_count()} process(es)")

    timer = DetailedTimer(model_path)
    wall = Timer()
    wall.start()

    print(f"loading scene from {args.source_path} ...")
    scene = build_scene(cfg, jax.random.key(args.seed))
    state = scene.state
    adam_state = adam.init(state.params)
    print(
        f"scene: {len(scene.data.train_cameras)} train / "
        f"{len(scene.data.test_cameras)} test cameras, "
        f"extent={scene.cameras_extent:.3f}, "
        f"init points={int(np.sum(np.asarray(state.alive)))}"
    )

    start_stage, start_iter = "coarse", 0
    if args.start_checkpoint:
        state, adam_state, start_iter = checkpoint.load_checkpoint(
            args.start_checkpoint
        )
        if "fine" in args.start_checkpoint:
            start_stage = "fine"
        print(f"resumed from {args.start_checkpoint} "
              f"({start_stage} @ {start_iter})")

    cams = [(lc.camera, lc.image) for lc in scene.data.train_cameras]

    # -- in-training eval (training_report parity, reference train.py:488-538)
    from fourdgs_tpu.render import CameraArrays, render as render_fn
    from fourdgs_tpu.utils import losses as loss_lib
    import jax.numpy as jnp

    from fourdgs_tpu.utils.observability import EventLog, log_scene_stats

    ev = EventLog(model_path)
    eval_cache = {}

    def run_eval(iteration, stage, cur_state):
        """PSNR/L1 over strided test + train cameras (≤5 each per split)."""
        bg = jnp.array([1.0, 1.0, 1.0] if cfg.model.white_background
                       else [0.0, 0.0, 0.0])
        report = {}
        splits = {
            "test": scene.data.test_cameras[::max(len(scene.data.test_cameras) // 5, 1)][:5],
            "train": scene.data.train_cameras[::max(len(scene.data.train_cameras) // 5, 1)][:5],
        }
        for split, lcs in splits.items():
            if not lcs:
                continue
            l1s, psnrs = [], []
            for vi, lc in enumerate(lcs):
                w, h = lc.camera.width, lc.camera.height
                key = (stage, w, h, int(cur_state.active_sh_degree))
                if key not in eval_cache:
                    def make(stage=stage, w=w, h=h,
                             sh=int(cur_state.active_sh_degree)):
                        def f(params, state, cam):
                            return render_fn(
                                params, state, cam, cfg, w, h, stage, bg, sh
                            ).color
                        return jax.jit(f)
                    eval_cache[key] = make()
                color = eval_cache[key](
                    cur_state.params, cur_state,
                    CameraArrays.from_camera(lc.camera),
                )
                gt = np.asarray(lc.image() if callable(lc.image) else lc.image)
                if gt.dtype == np.uint8:
                    gt = gt.astype(np.float32).transpose(2, 0, 1) / 255.0
                gt = jnp.asarray(gt[:3])
                l1s.append(float(loss_lib.l1_loss(color, gt)))
                # covisible-masked PSNR on HyperNeRF test views
                # (hyper_loader.py:102-105, image_utils.py:16-38)
                mask_path = getattr(lc, "mask_path", None)
                if mask_path and os.path.exists(mask_path):
                    from PIL import Image

                    m = Image.open(mask_path).convert("L").resize(
                        (w, h), Image.BILINEAR
                    )
                    psnrs.append(float(loss_lib.masked_psnr(
                        color, gt, jnp.asarray(np.asarray(m), jnp.float32)
                    )))
                else:
                    psnrs.append(
                        float(loss_lib.psnr(color[None], gt[None])[0])
                    )
                if vi < 5:
                    # first 5 eval views as images (train.py:513-516);
                    # GT dumped once, on the first eval of the run
                    ev.add_image(f"{stage}/{split}_view_{vi}/render",
                                 np.asarray(color), iteration)
                    if iteration == min(args.test_iterations, default=0):
                        ev.add_image(f"{stage}/{split}_view_{vi}/gt",
                                     np.asarray(gt), iteration)
            report[split] = {"l1": float(np.mean(l1s)),
                             "psnr": float(np.mean(psnrs))}
            ev.add_scalar(f"{stage}/{split}/loss_viewpoint - l1_loss",
                          report[split]["l1"], iteration)
            ev.add_scalar(f"{stage}/{split}/loss_viewpoint - psnr",
                          report[split]["psnr"], iteration)
            print(f"[ITER {iteration}] eval {stage}/{split}: "
                  f"L1 {report[split]['l1']:.5f} "
                  f"PSNR {report[split]['psnr']:.2f}")
        log_scene_stats(ev, cur_state, stage, iteration)
        path = os.path.join(model_path, "eval_log.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"iteration": iteration, "stage": stage,
                                **report}) + "\n")

    def log_fn(iteration, stage, m, cur_state, cur_adam):
        if not args.quiet:
            print(
                f"[{stage} {iteration:6d}] loss={m['loss']:.5f} "
                f"psnr={m['psnr']:.2f} points={int(m['n_points'])}"
            )
        # per-iteration scalar stream (train.py:489-492)
        ev.add_scalar(f"{stage}/train_loss_patches/l1_loss",
                      m["l1"], iteration)
        ev.add_scalar(f"{stage}/train_loss_patches/total_loss",
                      m["loss"], iteration)
        if iteration in args.test_iterations:
            run_eval(iteration, stage, cur_state)
        if iteration in args.save_iterations:
            checkpoint.save_snapshot(model_path, cur_state, iteration, stage)
        if iteration in args.checkpoint_iterations:
            checkpoint.save_checkpoint(
                model_path, cur_state, cur_adam, iteration, stage
            )

    extra_iters = set(args.save_iterations) | set(args.checkpoint_iterations) | set(args.test_iterations)

    viewer = None
    if args.port is not None:
        from fourdgs_tpu.viewer import NetworkGUI

        viewer = NetworkGUI(port=args.port)
        print(f"network viewer listening on 127.0.0.1:{args.port}")

    tracker = None
    if args.gradient_tracking:
        if mesh is not None:
            print("gradient tracking is single-device only; ignoring "
                  "--gradient_tracking under --mesh")
        else:
            from fourdgs_tpu.utils.gradient_tracker import GradientTracker

            tracker = GradientTracker(model_path)

    aux_kwargs = dict(
        mesh=mesh, debug_mode=args.debug_mode, viewer=viewer,
        model_path=model_path, source_path=args.source_path,
        gradient_tracker=tracker, event_log=ev,
    )
    try:
        if start_stage == "coarse":
            state, adam_state, _ = scene_reconstruction(
                cfg, state, adam_state, cams, "coarse",
                cfg.opt.coarse_iterations,
                scene.cameras_extent, timer=timer, rng_seed=args.seed,
                log_fn=log_fn, extra_log_iters=extra_iters, **aux_kwargs,
            )
        state, adam_state, log = scene_reconstruction(
            cfg, state, adam_state, cams, "fine", cfg.opt.iterations,
            scene.cameras_extent, timer=timer, rng_seed=args.seed + 1,
            log_fn=log_fn, extra_log_iters=extra_iters, **aux_kwargs,
        )
    finally:
        if viewer is not None:
            viewer.close()

    if tracker is not None:
        # end-of-run report + curves + per-timestamp timeline
        # (reference train.py:448-463)
        from fourdgs_tpu.utils.gradient_tracker import gradient_timeline

        tracker.generate_report()
        tracker.visualize_gradient_curves()
        cam0, gt0 = cams[0]
        gt0 = np.asarray(gt0() if callable(gt0) else gt0)
        if gt0.dtype == np.uint8:
            gt0 = gt0.astype(np.float32).transpose(2, 0, 1) / 255.0
        gradient_timeline(cfg, state, cam0, gt0, model_path)
        print(f"gradient report + timeline → {model_path}")

    wall.pause()
    checkpoint.save_snapshot(model_path, state, cfg.opt.iterations, "fine")
    checkpoint.save_checkpoint(
        model_path, state, adam_state, cfg.opt.iterations, "fine"
    )
    timer.save_timing_report()
    timer.save_training_logs()
    timer.print_summary()
    ev.close()
    print(f"training done in {wall.get_elapsed_time():.1f}s "
          f"→ {model_path}")


if __name__ == "__main__":
    main()
