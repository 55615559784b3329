#!/usr/bin/env python3
"""Convert HyperNeRF (Nerfies) cameras to COLMAP text-model inputs.

Parity: scripts/hypernerf2colmap.py in the reference — rgb/2x frames +
camera/<id>.json pinhole parts → colmap/sparse_custom for triangulation.
"""

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fourdgs_tpu.data.colmap_io import rotmat2qvec  # noqa: E402


def main(workdir, ratio=0.5):
    with open(os.path.join(workdir, "dataset.json")) as f:
        ids = json.load(f)["ids"]
    out_img = os.path.join(workdir, "colmap", "images")
    out_sparse = os.path.join(workdir, "colmap", "sparse_custom")
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_sparse, exist_ok=True)
    scale_dir = int(1 / ratio)

    cam0 = json.load(
        open(os.path.join(workdir, "camera", f"{ids[0]}.json"))
    )
    W, H = [int(v * ratio) for v in cam0["image_size"]]
    focal = cam0["focal_length"] * ratio
    with open(os.path.join(out_sparse, "cameras.txt"), "w") as f:
        f.write(f"1 SIMPLE_PINHOLE {W} {H} {focal} {W/2} {H/2}\n")
    with open(os.path.join(out_sparse, "images.txt"), "w") as f:
        for i, img_id in enumerate(ids):
            cj = json.load(
                open(os.path.join(workdir, "camera", f"{img_id}.json"))
            )
            orientation = np.asarray(cj["orientation"])
            position = np.asarray(cj["position"])
            # w2c rotation is the orientation itself; t = -orientation @ pos
            qvec = rotmat2qvec(orientation)
            T = -orientation @ position
            name = f"{img_id}.png"
            f.write(f"{i+1} " + " ".join(map(str, qvec)) + " "
                    + " ".join(map(str, T)) + f" 1 {name}\n\n")
            shutil.copy(
                os.path.join(workdir, "rgb", f"{scale_dir}x", name),
                os.path.join(out_img, name),
            )
    open(os.path.join(out_sparse, "points3D.txt"), "w").close()
    print(f"wrote COLMAP inputs → {out_sparse}")


if __name__ == "__main__":
    main(sys.argv[1])
