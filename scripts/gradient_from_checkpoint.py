#!/usr/bin/env python3
"""Per-timestamp gradient timeline from a SAVED checkpoint.

TPU-native equivalent of the reference's checkpoint-based gradient
visualizer (visualize_gradient_from_checkpoint.py:1-254): load a trained
model from an orbax checkpoint (chkpnt_<stage>_<iter>), re-render + backward
through one camera at N timestamps, and write gradient_timeline.json + the
3D scatter panel grid — without re-running training.

    python scripts/gradient_from_checkpoint.py \
        --checkpoint output/exp/chkpnt_fine_20000 \
        -s <dataset path> [--configs <preset.py>] \
        [--out output/exp/grad_from_ckpt] [--n_times 10] [--camera 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (chkpnt_<stage>_<iter>)")
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--configs", default=None)
    ap.add_argument("--out", default=None,
                    help="output dir (default: <ckpt parent>/grad_from_ckpt)")
    ap.add_argument("--n_times", type=int, default=10)
    ap.add_argument("--camera", type=int, default=0,
                    help="train-camera index to probe through")
    ap.add_argument("--stage", default="fine")
    args = ap.parse_args(argv)

    import json

    import jax
    import numpy as np

    from fourdgs_tpu.configs.core import config_from_dict, load_config
    from fourdgs_tpu.data.scene import build_scene
    from fourdgs_tpu.train import checkpoint
    from fourdgs_tpu.utils.gradient_tracker import gradient_timeline

    # prefer the run's exact saved config (cfg_args.json next to the
    # checkpoint) so model shapes/capacities match the saved params
    cfg_dump = os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)), "cfg_args.json"
    )
    if args.configs is None and os.path.exists(cfg_dump):
        cfg = config_from_dict(json.load(open(cfg_dump)))
        print(f"config restored from {cfg_dump}")
    else:
        cfg = load_config(args.configs)
    cfg.model.source_path = args.source_path

    scene = build_scene(cfg, jax.random.key(0))
    state, _, it = checkpoint.load_checkpoint(args.checkpoint)
    print(f"checkpoint @ iteration {it}: "
          f"{int(np.sum(np.asarray(state.alive)))} alive points")

    lc = scene.data.train_cameras[args.camera]
    gt = np.asarray(lc.image() if callable(lc.image) else lc.image)
    if gt.dtype == np.uint8:
        gt = gt.astype(np.float32).transpose(2, 0, 1) / 255.0

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)), "grad_from_ckpt"
    )
    times = [i / max(args.n_times - 1, 1) for i in range(args.n_times)]
    gradient_timeline(cfg, state, lc.camera, gt, out,
                      time_points=times, stage=args.stage)
    print(f"gradient timeline ({args.n_times} timestamps) → {out}")


if __name__ == "__main__":
    main()
