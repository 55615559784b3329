#!/usr/bin/env python3
"""Train + render + evaluate a batch of scenes (full_eval.py parity).

    python full_eval.py --base_dir <datasets_root> --family dnerf \
        [--scenes bouncingballs lego] [--output output/full_eval]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

FAMILIES = {
    "dnerf": ["bouncingballs", "hellwarrior", "hook", "jumpingjacks",
              "lego", "mutant", "standup", "trex"],
    "dynerf": ["coffee_martini", "cook_spinach", "cut_roasted_beef",
               "flame_salmon_1", "flame_steak", "sear_steak"],
    "hypernerf": ["3dprinter", "banana", "broom2", "chicken"],
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--family", choices=sorted(FAMILIES), required=True)
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--output", default="output/full_eval")
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_render", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    args = parser.parse_args(argv)

    presets = os.path.join("fourdgs_tpu", "configs", "presets", args.family)
    scenes = args.scenes or FAMILIES[args.family]
    py = sys.executable
    for scene in scenes:
        data = os.path.join(args.base_dir, scene)
        cfg = os.path.join(presets, f"{scene}.py")
        if not os.path.exists(cfg):
            cfg = os.path.join(presets, "default.py")
        exp = f"{args.family}/{scene}"
        model_path = os.path.join("output", exp)
        print(f"===== {scene} =====")
        if not args.skip_train:
            t0 = time.time()
            subprocess.run(
                [py, "train.py", "-s", data, "--configs", cfg,
                 "--expname", exp, "--quiet"], check=True,
            )
            print(f"train wall: {time.time()-t0:.0f}s")
        if not args.skip_render:
            subprocess.run(
                [py, "render.py", "--model_path", model_path,
                 "--source_path", data, "--skip_train"], check=True,
            )
        if not args.skip_metrics:
            subprocess.run(
                [py, "metrics.py", "--model_path", model_path], check=True,
            )


if __name__ == "__main__":
    main()
