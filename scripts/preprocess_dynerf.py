#!/usr/bin/env python3
"""Extract Neu3D video frames to cam*/images/%04d.png ahead of training.

Parity: scripts/preprocess_dynerf.py in the reference (the loader also does
this lazily on first run; this pre-pays the cost).

    python scripts/preprocess_dynerf.py --datadir <scene> [--frames 300]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fourdgs_tpu.data.dynerf import _extract_video_frames  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datadir", required=True)
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--width", type=int, default=1352)
    p.add_argument("--height", type=int, default=1014)
    args = p.parse_args(argv)
    for video in sorted(glob.glob(os.path.join(args.datadir, "cam*.mp4"))):
        out = os.path.join(video.split(".")[0], "images")
        if os.path.isdir(out) and len(os.listdir(out)) >= args.frames:
            print(f"skip {video} (already extracted)")
            continue
        print(f"extracting {video} → {out}")
        _extract_video_frames(
            video, out, (args.width, args.height), args.frames
        )


if __name__ == "__main__":
    main()
