#!/usr/bin/env python3
"""Merge several trained 4DGS models into one rendered sequence.

Parity with reference merge_many_4dgs.py:59-231: for each video camera,
query each model's deformed state at the camera timestamp
(get_state_at_time), optionally apply a per-model SE(3)+scale bias
(rotate/translate/scale the extra models into the base model's frame),
concatenate all primitives, and rasterize them in a single pass.

    python merge_many_4dgs.py --model_paths out/a out/b \
        [--motion_bias "0,0,0" ...] [--rotation_bias "0,0" ...] \
        [--scale_bias 1.0 ...] [--iteration N] [--output merged_out]
"""

from __future__ import annotations

import argparse
import json
import os


def rotate_point_cloud(xyz, motion_bias, rotation_bias_deg, scale):
    """Z/Y-axis rotation + translation + uniform scale (reference
    merge_many_4dgs.py rotate_point_cloud semantics)."""
    import numpy as np
    import jax.numpy as jnp

    rz, ry = [float(a) * np.pi / 180.0 for a in rotation_bias_deg]
    cz, sz = np.cos(rz), np.sin(rz)
    cy, sy = np.cos(ry), np.sin(ry)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], jnp.float32)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    return (xyz * scale) @ (Rz @ Ry).T + jnp.asarray(motion_bias)


def load_model(model_path, iteration, configs):
    import jax

    from fourdgs_tpu.configs.core import KPlanesConfig, load_config
    from fourdgs_tpu.train import checkpoint

    cfg = load_config(configs)
    cfg_dump = os.path.join(model_path, "cfg_args.json")
    if os.path.exists(cfg_dump) and configs is None:
        saved = json.load(open(cfg_dump))
        for group in ("model", "pipe", "hidden", "opt", "tpu"):
            for k, v in saved.get(group, {}).items():
                tgt = getattr(cfg, group)
                if hasattr(tgt, k):
                    if k == "kplanes_config":
                        v = KPlanesConfig(**{kk: tuple(vv) if kk == "resolution" else vv for kk, vv in v.items()})
                    elif isinstance(getattr(tgt, k), tuple):
                        v = tuple(v)
                    setattr(tgt, k, v)
    pc_dir = os.path.join(model_path, "point_cloud")
    iters = [int(d.rsplit("_", 1)[1]) for d in os.listdir(pc_dir)
             if d.startswith("iteration_")]
    it = iteration if iteration > 0 else max(iters)
    state = checkpoint.load_snapshot(
        os.path.join(pc_dir, f"iteration_{it}"), cfg, jax.random.key(0)
    )
    return cfg, state


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_paths", nargs="+", required=True)
    parser.add_argument("--source_path", "-s", required=True,
                        help="scene supplying the video camera path")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--configs", type=str, default=None)
    parser.add_argument("--motion_bias", nargs="*", default=[],
                        help="per-extra-model 'x,y,z'")
    parser.add_argument("--rotation_bias", nargs="*", default=[],
                        help="per-extra-model 'rotz,roty' degrees")
    parser.add_argument("--scale_bias", nargs="*", type=float, default=[])
    parser.add_argument("--output", type=str, default="merged_render")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from export_perframe_3DGS import get_state_at_time
    from fourdgs_tpu.data.scene import load_scene
    from fourdgs_tpu.ops.tiled import rasterize_tiled
    from fourdgs_tpu.render import CameraArrays

    models = [load_model(p, args.iteration, args.configs)
              for p in args.model_paths]
    cfg0 = models[0][0]
    cfg0.model.source_path = args.source_path
    data = load_scene(cfg0)
    cams = data.video_cameras or [lc.camera for lc in data.test_cameras]
    os.makedirs(args.output, exist_ok=True)
    bg = jnp.array([1.0, 1.0, 1.0] if cfg0.model.white_background else [0, 0, 0])

    n_extra = len(models) - 1
    motion = [tuple(map(float, m.split(","))) for m in args.motion_bias]
    motion += [(0.0, 0.0, 0.0)] * (n_extra - len(motion))
    rot = [tuple(m.split(",")) for m in args.rotation_bias]
    rot += [("0", "0")] * (n_extra - len(rot))
    scl = list(args.scale_bias) + [1.0] * (n_extra - len(args.scale_bias))

    for fi, cam in enumerate(cams):
        parts = []
        for mi, (cfg, state) in enumerate(models):
            alive = np.asarray(state.alive)
            xyz, scales, rots_q, opacity, shs = get_state_at_time(
                state.params, state, cfg, cam.time
            )
            scales_act = jnp.exp(scales)[alive]
            xyz = xyz[alive]
            if mi > 0:
                xyz = rotate_point_cloud(
                    xyz, motion[mi - 1], rot[mi - 1], scl[mi - 1]
                )
                scales_act = scales_act * scl[mi - 1]
            rots_n = rots_q[alive]
            rots_n = rots_n / jnp.maximum(
                jnp.linalg.norm(rots_n, axis=-1, keepdims=True), 1e-12
            )
            parts.append(dict(
                xyz=xyz, scales=scales_act, rot=rots_n,
                op=jax.nn.sigmoid(opacity[alive]).reshape(-1),
                shs=shs[alive],
            ))
        # pad SH coefficient counts to the max across models
        kmax = max(p["shs"].shape[1] for p in parts)
        for p in parts:
            k = p["shs"].shape[1]
            if k < kmax:
                p["shs"] = jnp.pad(p["shs"], ((0, 0), (0, kmax - k), (0, 0)))
        merged = {
            key: jnp.concatenate([p[key] for p in parts])
            for key in parts[0]
        }
        ca = CameraArrays.from_camera(cam)
        out = rasterize_tiled(
            merged["xyz"], merged["scales"], merged["rot"], merged["op"],
            merged["shs"], ca.camera_center, ca.world_view, ca.full_proj,
            ca.tanfovx, ca.tanfovy, cam.width, cam.height,
            int(np.sqrt(kmax)) - 1, bg,
            instance_budget=1 << 20, tile_budget=4096,
        )
        img = (np.clip(np.asarray(out.color), 0, 1).transpose(1, 2, 0)
               * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(args.output, f"{fi:05d}.png")
        )
        if fi % 20 == 0:
            print(f"{fi}/{len(cams)}")
    print(f"done → {args.output}")


if __name__ == "__main__":
    main()
