#!/usr/bin/env python3
"""Voxel-downsample an init point cloud to a target budget.

Parity: scripts/downsample_point.py in the reference (open3d voxel
downsample to keep init clouds under ~40k points, README.md:284) — native
implementation via fourdgs_tpu.data.grid_pruning.voxel_downsample with a
binary search over voxel size.

    python scripts/downsample_point.py in.ply out.ply [--target 40000]
"""

import argparse

import numpy as np

from fourdgs_tpu.data.grid_pruning import voxel_downsample
from fourdgs_tpu.data.ply import fetch_pointcloud, store_pointcloud


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--target", type=int, default=40_000)
    args = p.parse_args(argv)

    pc = fetch_pointcloud(args.input)
    pts, cols = pc.points, pc.colors
    print(f"input: {pts.shape[0]} points")
    if pts.shape[0] > args.target:
        diag = float(np.linalg.norm(pts.max(0) - pts.min(0)))
        lo, hi = diag / 10000.0, diag
        for _ in range(24):  # binary search voxel size to hit the budget
            mid = (lo * hi) ** 0.5
            down_p, down_c = voxel_downsample(pts, cols, mid)
            if down_p.shape[0] > args.target:
                lo = mid
            else:
                hi = mid
        pts, cols = voxel_downsample(pts, cols, hi)
    print(f"output: {pts.shape[0]} points")
    store_pointcloud(args.output, pts, np.clip(cols, 0, 1) * 255)


if __name__ == "__main__":
    main()
