#!/usr/bin/env python3
"""Offline rendering: render train/test/video splits from a saved model.

CLI parity with the reference render.py:93-115:

    python render.py --model_path output/<expname> [--iteration N]
                     [--skip_train] [--skip_test] [--skip_video] [--configs ...]

For each split, renders every camera through the fine-stage pipeline, prints
the measured FPS ((n−1)/elapsed, render.py:69-70), writes renders/ + gt/ PNG
trees consumed by metrics.py, and assembles video_rgb.mp4 from the video
split (render.py:77).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def render_set(model_path, name, iteration, cameras, gts, render_fn,
               mask_paths=None):
    import numpy as np
    from PIL import Image

    base = os.path.join(model_path, name, f"ours_{iteration}")
    rdir = os.path.join(base, "renders")
    gdir = os.path.join(base, "gt")
    os.makedirs(rdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    if mask_paths and any(mask_paths):
        # covisible masks for masked test PSNR (hyper_loader.py:102-105);
        # metrics.py picks the masks/ dir up automatically
        mdir = os.path.join(base, "masks")
        os.makedirs(mdir, exist_ok=True)
        for i, mp in enumerate(mask_paths):
            if mp and os.path.exists(mp):
                m = Image.open(mp).convert("L")
                if cameras:
                    m = m.resize(
                        (cameras[i].width, cameras[i].height), Image.BILINEAR
                    )
                m.save(os.path.join(mdir, f"{i:05d}.png"))

    import jax

    frames = []
    # warmup/compile on the first camera, then timed loop (render.py:60-70)
    if cameras:
        jax.block_until_ready(render_fn(cameras[0]))
    t0 = time.time()
    outs = []
    for cam in cameras:
        outs.append(render_fn(cam))
    if outs:
        jax.block_until_ready(outs[-1])
    dt = time.time() - t0
    fps = (len(cameras) - 1) / dt if len(cameras) > 1 and dt > 0 else 0.0
    print(f"{name}: {len(cameras)} views, FPS: {fps:.2f}")

    for i, out in enumerate(outs):
        img = np.asarray(out).transpose(1, 2, 0)
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img8).save(os.path.join(rdir, f"{i:05d}.png"))
        frames.append(img8)
        if gts is not None and i < len(gts):
            g = gts[i]
            if g.dtype != np.uint8:
                g = (np.clip(g.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(g).save(os.path.join(gdir, f"{i:05d}.png"))
    return frames, fps


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--configs", type=str, default=None)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fourdgs_tpu.configs.core import load_config
    from fourdgs_tpu.data.scene import load_scene
    from fourdgs_tpu.render import CameraArrays, render
    from fourdgs_tpu.train import checkpoint

    cfg = load_config(args.configs)
    # replay the saved training config when available (get_combined_args)
    cfg_dump = os.path.join(args.model_path, "cfg_args.json")
    if os.path.exists(cfg_dump) and args.configs is None:
        saved = json.load(open(cfg_dump))
        cfg = load_config()
        for group, knobs in saved.items():
            if group in ("model", "pipe", "hidden", "opt", "tpu") and isinstance(knobs, dict):
                for k, v in knobs.items():
                    if hasattr(getattr(cfg, group), k):
                        if k == "kplanes_config":
                            from fourdgs_tpu.configs.core import KPlanesConfig
                            v = KPlanesConfig(**{kk: tuple(vv) if kk == "resolution" else vv for kk, vv in v.items()})
                        elif isinstance(getattr(getattr(cfg, group), k), tuple):
                            v = tuple(v)
                        setattr(getattr(cfg, group), k, v)
    if args.source_path:
        cfg.model.source_path = args.source_path

    # find snapshot
    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = [
        int(d.rsplit("_", 1)[1]) for d in os.listdir(pc_dir)
        if d.startswith("iteration_")
    ]
    iteration = args.iteration if args.iteration > 0 else max(iters)
    snap = os.path.join(pc_dir, f"iteration_{iteration}")
    print(f"rendering snapshot {snap}")
    state = checkpoint.load_snapshot(snap, cfg, jax.random.key(0))

    data = load_scene(cfg)
    bg = jnp.array([1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0])

    def make_render_fn(width, height):
        def fn(params, state, cam):
            return render(
                params, state, cam, cfg, width, height, "fine", bg,
                active_sh_degree=cfg.model.sh_degree,
            ).color
        jitted = jax.jit(fn)
        return lambda cam: jitted(
            state.params, state, CameraArrays.from_camera(cam)
        )

    splits = []
    if not args.skip_train:
        splits.append(("train", data.train_cameras))
    if not args.skip_test:
        splits.append(("test", data.test_cameras))
    for name, cams_gt in splits:
        if not cams_gt:
            continue
        w, h = cams_gt[0].camera.width, cams_gt[0].camera.height
        rfn = make_render_fn(w, h)
        render_set(
            args.model_path, name, iteration,
            [lc.camera for lc in cams_gt],
            [lc.image for lc in cams_gt], rfn,
            mask_paths=[getattr(lc, "mask_path", None) for lc in cams_gt],
        )
    if not args.skip_video and data.video_cameras:
        vc = data.video_cameras
        rfn = make_render_fn(vc[0].width, vc[0].height)
        frames, _ = render_set(
            args.model_path, "video", iteration, vc, None, rfn
        )
        try:
            import imageio

            imageio.mimwrite(
                os.path.join(
                    args.model_path, "video", f"ours_{iteration}",
                    "video_rgb.mp4",
                ),
                frames, fps=30,
            )
        except Exception as e:  # mp4 writer optional
            print(f"video write skipped: {e}")


if __name__ == "__main__":
    main()
