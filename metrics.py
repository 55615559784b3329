#!/usr/bin/env python3
"""Evaluate saved renders: PSNR / SSIM / MS-SSIM / D-SSIM (/ LPIPS).

CLI parity with the reference metrics.py:36-113:

    python metrics.py --model_path output/<expname> [output/<other> ...]

Reads test/ours_<iter>/{renders,gt} PNG trees written by render.py and writes
results.json + per_view.json next to them. D-SSIM = (1 − MS-SSIM)/2
(metrics.py:79). LPIPS (vgg+alex) requires pretrained backbone weights; in
an offline environment it is skipped and recorded as null (the reference
downloads torchvision weights at first use, lpipsPyTorch/modules/lpips.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def msssim(img1, img2, levels=5):
    """Multi-scale SSIM with the standard level weights."""
    import jax.numpy as jnp

    from fourdgs_tpu.utils.losses import _gaussian_window
    import jax

    weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]
    w = jnp.asarray(_gaussian_window(11))

    def ssim_parts(a, b):
        C = a.shape[1]
        kernel = jnp.tile(w[None, None], (C, 1, 1, 1))

        def conv(x):
            return jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [(5, 5), (5, 5)],
                feature_group_count=C,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        mu1, mu2 = conv(a), conv(b)
        s1 = conv(a * a) - mu1 * mu1
        s2 = conv(b * b) - mu2 * mu2
        s12 = conv(a * b) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        l = (2 * mu1 * mu2 + C1) / (mu1**2 + mu2**2 + C1)
        cs = (2 * s12 + C2) / (s1 + s2 + C2)
        return jnp.mean(l), jnp.mean(cs)

    def downsample(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0

    a, b = img1, img2
    mcs = []
    l_final = None
    for i in range(levels):
        l, cs = ssim_parts(a, b)
        mcs.append(cs)
        l_final = l
        if i < levels - 1:
            a, b = downsample(a), downsample(b)
    mcs = jnp.stack(mcs)
    return float(
        jnp.prod(jnp.maximum(mcs[:-1], 0) ** weights[:-1])
        * jnp.maximum(l_final, 0) ** weights[-1]
    )


def try_lpips():
    """LPIPS distance functions, preferring the native JAX port.

    Order: (1) fourdgs_tpu.utils.lpips with converted pretrained weights
    (see scripts/convert_lpips_weights.py — the vendored-net equivalent of
    the reference's lpipsPyTorch/modules/lpips.py:8-36); (2) the optional
    external ``lpips`` package; (3) None → null columns.
    Returned callables take [3,H,W] float images in [0,1].
    """
    from fourdgs_tpu.utils import lpips as ljax

    nets = {}
    for net in ("vgg", "alex"):
        w = ljax.load_weights(net)
        if w is not None:
            nets[net] = ljax.make_lpips(w, net)
    if nets:
        return nets
    try:
        import lpips  # noqa
        import torch

        def wrap(m):
            def f(a, b):
                ta = torch.from_numpy(np.asarray(a))[None] * 2 - 1
                tb = torch.from_numpy(np.asarray(b))[None] * 2 - 1
                return float(m(ta, tb))
            return f

        return {
            "vgg": wrap(lpips.LPIPS(net="vgg")),
            "alex": wrap(lpips.LPIPS(net="alex")),
        }
    except Exception:
        return None


def read_images(d):
    from PIL import Image

    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".png"):
            out.append(
                np.asarray(Image.open(os.path.join(d, name)).convert("RGB"),
                           np.float32) / 255.0
            )
    return out


def evaluate(model_paths):
    import jax.numpy as jnp

    from fourdgs_tpu.utils.losses import psnr as psnr_fn, ssim as ssim_fn

    lpips_nets = try_lpips()
    for model_path in model_paths:
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print(f"{model_path}: no test renders, skipping")
            continue
        full, per_view = {}, {}
        for method in sorted(os.listdir(test_dir)):
            base = os.path.join(test_dir, method)
            renders = read_images(os.path.join(base, "renders"))
            gts = read_images(os.path.join(base, "gt"))
            masks = None
            mdir = os.path.join(base, "masks")
            if os.path.isdir(mdir):
                # covisible masks saved by render.py → masked PSNR
                # (image_utils.py:16-38 semantics)
                from fourdgs_tpu.utils.losses import masked_psnr
                from PIL import Image

                masks = [
                    np.asarray(Image.open(os.path.join(mdir, f)).convert("L"),
                               np.float32)
                    for f in sorted(os.listdir(mdir)) if f.endswith(".png")
                ]
            rows = []
            for vi, (r, g) in enumerate(zip(renders, gts)):
                rj = jnp.asarray(r.transpose(2, 0, 1))[None]
                gj = jnp.asarray(g.transpose(2, 0, 1))[None]
                ms = msssim(rj, gj)
                row = {
                    "PSNR": (
                        float(masked_psnr(rj[0], gj[0],
                                          jnp.asarray(masks[vi])))
                        if masks and vi < len(masks)
                        else float(psnr_fn(rj, gj)[0])
                    ),
                    "SSIM": float(ssim_fn(rj, gj)),
                    "MS-SSIM": ms,
                    "D-SSIM": (1.0 - ms) / 2.0,
                }
                for net in ("vgg", "alex"):
                    fn = (lpips_nets or {}).get(net)
                    row[f"LPIPS-{net}"] = (
                        float(fn(r.transpose(2, 0, 1), g.transpose(2, 0, 1)))
                        if fn else None
                    )
                rows.append(row)
            if not rows:
                continue
            keys = rows[0].keys()
            full[method] = {
                k: (
                    float(np.mean([r[k] for r in rows]))
                    if rows[0][k] is not None else None
                )
                for k in keys
            }
            per_view[method] = {
                k: [r[k] for r in rows] for k in keys
            }
            print(f"{model_path} {method}: "
                  + " ".join(
                      f"{k}={v:.4f}" for k, v in full[method].items()
                      if v is not None
                  ))
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", "-m", nargs="+", required=True)
    args = parser.parse_args(argv)
    evaluate(args.model_path)


if __name__ == "__main__":
    main()
