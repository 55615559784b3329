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
    parser.add_argument("--override", nargs="*", default=[],
                        help="dotted config overrides, e.g. opt.iterations=100")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

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

    def log_fn(iteration, stage, m, cur_state, cur_adam):
        if not args.quiet:
            print(
                f"[{stage} {iteration:6d}] loss={m['loss']:.5f} "
                f"psnr={m['psnr']:.2f} points={int(m['n_points'])}"
            )
        if iteration in args.save_iterations:
            checkpoint.save_snapshot(model_path, cur_state, iteration, stage)
        if iteration in args.checkpoint_iterations:
            checkpoint.save_checkpoint(
                model_path, cur_state, cur_adam, iteration, stage
            )

    extra_iters = set(args.save_iterations) | set(args.checkpoint_iterations) | set(args.test_iterations)

    if start_stage == "coarse":
        state, adam_state, _ = scene_reconstruction(
            cfg, state, adam_state, cams, "coarse", cfg.opt.coarse_iterations,
            scene.cameras_extent, timer=timer, rng_seed=args.seed,
            log_fn=log_fn, extra_log_iters=extra_iters,
        )
    state, adam_state, log = scene_reconstruction(
        cfg, state, adam_state, cams, "fine", cfg.opt.iterations,
        scene.cameras_extent, timer=timer, rng_seed=args.seed + 1,
        log_fn=log_fn, extra_log_iters=extra_iters,
    )

    wall.pause()
    checkpoint.save_snapshot(model_path, state, cfg.opt.iterations, "fine")
    checkpoint.save_checkpoint(
        model_path, state, adam_state, cfg.opt.iterations, "fine"
    )
    timer.save_timing_report()
    timer.save_training_logs()
    timer.print_summary()
    print(f"training done in {wall.get_elapsed_time():.1f}s "
          f"→ {model_path}")


if __name__ == "__main__":
    main()
