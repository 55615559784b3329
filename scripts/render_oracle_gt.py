#!/usr/bin/env python3
"""Render and cache the bench_quality GT frames with the INDEPENDENT oracle.

VERDICT r4 missing #1: bench_quality's GT was rendered by the production
Pallas rasterizer itself, making the held-out PSNR a self-consistency proof.
This script renders the exact same camera splits over the same ground-truth
Gaussian scene with ``ops.reference.rasterize_reference`` — the pure-JAX
whole-image oracle that the Pallas path is allclose-tested against
(tests/test_pallas_raster.py) but which shares none of its binning/blend
code — on the CPU backend, and caches the frames to
``gt_cache/oracle_gt_<size>.npz`` as uint8 (the reference trains from 8-bit
PNGs, metrics.py reads 8-bit renders — uint8 GT is the faithful contract).

bench_quality.py --gt oracle then trains the TPU pipeline against these
frames, breaking the circularity.

Runtime: ~31 s/frame at 800x800 on this host's CPU (O(P·H·W) oracle),
~57 min for the default 100 train + 10 test frames. Run once; the cache is
keyed by (size, n_train, n_test) and the splits' RNG seeds are fixed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=10)
    ap.add_argument("--out_dir", default="gt_cache")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench_quality import gt_raster_args, make_gt_scene, ring_camera
    from fourdgs_tpu.ops.reference import rasterize_reference

    size = args.size
    pts_gt, cols_gt, scales_gt, offsets = make_gt_scene()
    extra = gt_raster_args(pts_gt, cols_gt, scales_gt)
    bg = jnp.zeros(3)

    @jax.jit
    def oracle_render(means3d, cam_wv, cam_fp, cam_center, tanx, tany):
        return rasterize_reference(
            means3d, extra["scales"], extra["rotations"],
            extra["opacities"], extra["shs"],
            cam_center, cam_wv, cam_fp, tanx, tany, size, size, 0, bg,
        ).color

    def render_split(n, elev_lo, elev_hi, seed, tag):
        """Mirror of bench_quality.make_split — same RNG stream, same
        cameras — but rendered by the oracle and returned as uint8 HWC."""
        r = np.random.default_rng(seed)
        imgs = np.zeros((n, size, size, 3), np.uint8)
        cam_meta = []
        for i in range(n):
            t = i / max(n - 1, 1)
            ang = r.uniform(0, 2 * np.pi)
            elev = r.uniform(elev_lo, elev_hi)
            cam = ring_camera(ang, elev, size, size, t)
            t0 = time.time()
            img = oracle_render(
                jnp.asarray(pts_gt + offsets(t)),
                jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                jnp.asarray(cam.camera_center), cam.tanfovx, cam.tanfovy,
            )
            img8 = np.clip(
                np.asarray(img).transpose(1, 2, 0) * 255.0 + 0.5, 0, 255
            ).astype(np.uint8)
            imgs[i] = img8
            cam_meta.append((ang, elev, t))
            print(f"[{tag} {i + 1}/{n}] {time.time() - t0:.1f}s", flush=True)
        return imgs, np.asarray(cam_meta, np.float64)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(
        args.out_dir,
        f"oracle_gt_{size}_{args.n_train}_{args.n_test}.npz",
    )
    t_all = time.time()
    train_imgs, train_meta = render_split(
        args.n_train, 0.15, 0.9, seed=1, tag="train"
    )
    test_imgs, test_meta = render_split(
        args.n_test, 0.15, 0.9, seed=2, tag="test"
    )
    np.savez_compressed(
        out,
        train_imgs=train_imgs, train_meta=train_meta,
        test_imgs=test_imgs, test_meta=test_meta,
        size=size,
    )
    print(f"wrote {out} in {(time.time() - t_all) / 60:.1f} min")


if __name__ == "__main__":
    main()
