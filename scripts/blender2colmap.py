#!/usr/bin/env python3
"""Convert Blender/D-NeRF transforms to COLMAP text-model inputs.

Parity: scripts/blender2colmap.py in the reference: writes colmap/images
(all train frames) + colmap/sparse_custom/{cameras,images,points3D}.txt for
triangulation by colmap.sh.
"""

import json
import math
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fourdgs_tpu.data.blender import _pose_from_transform  # noqa: E402
from fourdgs_tpu.data.colmap_io import rotmat2qvec  # noqa: E402


def main(workdir):
    with open(os.path.join(workdir, "transforms_train.json")) as f:
        meta = json.load(f)
    frames = meta["frames"]
    out_img = os.path.join(workdir, "colmap", "images")
    out_sparse = os.path.join(workdir, "colmap", "sparse_custom")
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_sparse, exist_ok=True)

    from PIL import Image

    first = os.path.join(workdir, frames[0]["file_path"] + ".png")
    W, H = Image.open(first).size
    fovx = meta["camera_angle_x"]
    focal = W / (2.0 * math.tan(fovx / 2.0))
    with open(os.path.join(out_sparse, "cameras.txt"), "w") as f:
        f.write(f"1 SIMPLE_PINHOLE {W} {H} {focal} {W/2} {H/2}\n")
    with open(os.path.join(out_sparse, "images.txt"), "w") as f:
        for i, fr in enumerate(frames):
            R, T = _pose_from_transform(fr["transform_matrix"])
            qvec = rotmat2qvec(R.T)
            name = f"r_{i:04d}.png"
            f.write(f"{i+1} " + " ".join(map(str, qvec)) + " "
                    + " ".join(map(str, T)) + f" 1 {name}\n\n")
            shutil.copy(
                os.path.join(workdir, fr["file_path"] + ".png"),
                os.path.join(out_img, name),
            )
    open(os.path.join(out_sparse, "points3D.txt"), "w").close()
    print(f"wrote COLMAP inputs → {out_sparse}")


if __name__ == "__main__":
    main(sys.argv[1])
