#!/usr/bin/env python3
"""One-time LPIPS weight conversion (run on a machine WITH network access).

Produces fourdgs_tpu/assets/lpips_{vgg,alex}.npz consumed by
fourdgs_tpu.utils.lpips — the torchvision trunk conv weights
(networks.py:77-95 of the reference's vendored lpipsPyTorch) plus the v0.1
LinLayers from richzhang/PerceptualSimilarity (utils.py:11-30).

Usage:
    pip install torch torchvision
    python scripts/convert_lpips_weights.py [--out fourdgs_tpu/assets]

Then copy the npz files into this repo (or set FOURDGS_LPIPS_WEIGHTS_DIR).
"""

import argparse
import os

import numpy as np


def convert(net: str, out_dir: str):
    import torch
    from torchvision import models

    if net == "vgg":
        trunk = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1)
    else:
        trunk = models.alexnet(
            weights=models.AlexNet_Weights.IMAGENET1K_V1
        )
    feats = trunk.features.eval()

    out = {}
    conv_i = 0
    for layer in feats:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}_w"] = layer.weight.detach().numpy()
            out[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           f"master/lpips/weights/v0.1/{net}.pth")
    lin_sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    # keys: lin0.model.1.weight ... lin4.model.1.weight, each [1,C,1,1]
    for k, v in lin_sd.items():
        j = int(k.split(".")[0].replace("lin", ""))
        out[f"lin{j}_w"] = v.detach().numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"lpips_{net}.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({conv_i} convs, "
          f"{sum(1 for k in out if k.startswith('lin'))} lin layers)")
    return out


def emit_goldens(net: str, weights: dict, out_dir: str,
                 seed: int = 1234, size: int = 64):
    """Golden LPIPS distance for the fixed-seed input pair, computed with
    the CONVERTED weights through an independent torch evaluation of the
    reference's vendored math (tests/test_lpips_parity.py's oracle).

    tests/test_lpips_parity.py::TestGoldenVectors then proves the JAX port
    end-to-end on any machine that has the npz + this json (VERDICT r3 #5).
    """
    import json
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_lpips_parity import golden_inputs, torch_lpips_reference

    x, y = golden_inputs(seed, size)
    d = torch_lpips_reference(
        weights, net, torch.from_numpy(x), torch.from_numpy(y)
    )
    gpath = os.path.join(out_dir, f"lpips_goldens_{net}.json")
    with open(gpath, "w") as f:
        json.dump({"seed": seed, "size": size, "distance": d}, f, indent=1)
    print(f"wrote {gpath} (distance={d:.6f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fourdgs_tpu/assets")
    ap.add_argument("--goldens", action="store_true",
                    help="also emit lpips_goldens_<net>.json for the parity "
                         "test (fixed-seed inputs)")
    args = ap.parse_args()
    for net in ("vgg", "alex"):
        w = convert(net, args.out)
        if args.goldens:
            emit_goldens(net, w, args.out)
