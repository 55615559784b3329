#!/usr/bin/env python3
"""Export per-timestamp static 3DGS models from a trained 4DGS model.

Parity with reference export_perframe_3DGS.py: for each test-camera
timestamp, query the deformed state (get_state_at_time,
utils/render_utils.py:3-17) and write a 3DGS-standard PLY to
<model_path>/gaussian_pertimestamp/time_<idx>.ply — loadable by any static
3DGS viewer.

    python export_perframe_3DGS.py --model_path output/<expname> [--iteration N]
"""

from __future__ import annotations

import argparse
import os


def get_state_at_time(params, state, cfg, time: float):
    """Deformation-only forward at one timestamp (no rasterization).

    Matches utils/render_utils.py:3-17: raw (pre-activation) parameters in,
    deformed raw parameters out; note the reference returns the *undeformed*
    opacity (render_utils.py:17) — preserved here.
    """
    import jax.numpy as jnp

    from fourdgs_tpu.models import deformation as deform_lib
    from fourdgs_tpu.models import gaussians as G

    xyz = params["xyz"]
    shs = G.get_features(params)
    t = jnp.full((xyz.shape[0],), time)
    out_xyz, out_scales, out_rot, _out_op, out_shs = deform_lib.deform(
        params["deform"], cfg.hidden, state.aabb,
        xyz, params["scaling"], params["rotation"], params["opacity"],
        shs, t,
    )
    return out_xyz, out_scales, out_rot, params["opacity"], out_shs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--source_path", "-s", default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--configs", type=str, default=None)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from fourdgs_tpu.data import ply as ply_lib
    from fourdgs_tpu.data.scene import load_scene
    from fourdgs_tpu.train import checkpoint
    from render import main as _render_cfg_loader  # reuse cfg replay logic

    # load config the same way render.py does
    import json

    from fourdgs_tpu.configs.core import load_config

    cfg = load_config(args.configs)
    cfg_dump = os.path.join(args.model_path, "cfg_args.json")
    if os.path.exists(cfg_dump) and args.configs is None:
        saved = json.load(open(cfg_dump))
        for group in ("model", "pipe", "hidden", "opt", "tpu"):
            knobs = saved.get(group, {})
            for k, v in knobs.items():
                tgt = getattr(cfg, group)
                if hasattr(tgt, k):
                    cur = getattr(tgt, k)
                    if k == "kplanes_config":
                        from fourdgs_tpu.configs.core import KPlanesConfig
                        v = KPlanesConfig(**{kk: tuple(vv) if kk == "resolution" else vv for kk, vv in v.items()})
                    elif isinstance(cur, tuple):
                        v = tuple(v)
                    setattr(tgt, k, v)
    if args.source_path:
        cfg.model.source_path = args.source_path

    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = [int(d.rsplit("_", 1)[1]) for d in os.listdir(pc_dir)
             if d.startswith("iteration_")]
    iteration = args.iteration if args.iteration > 0 else max(iters)
    state = checkpoint.load_snapshot(
        os.path.join(pc_dir, f"iteration_{iteration}"), cfg, jax.random.key(0)
    )

    data = load_scene(cfg)
    out_dir = os.path.join(args.model_path, "gaussian_pertimestamp")
    os.makedirs(out_dir, exist_ok=True)
    alive = np.asarray(state.alive)

    times = [lc.camera.time for lc in data.test_cameras] or [
        lc.camera.time for lc in data.train_cameras
    ]
    print(f"exporting {len(times)} timestamps ...")
    for index, time in enumerate(times):
        xyz, scales, rot, opacity, shs = get_state_at_time(
            state.params, state, cfg, time
        )
        n_pts = shs.shape[0]
        params_t = {
            "xyz": xyz,
            "f_dc": shs[:, 0, :],
            "f_rest": shs[:, 1:, :].reshape(n_pts, -1),
            "scaling": scales,
            "rotation": rot,
            "opacity": opacity,
        }
        ply_lib.save_gaussian_ply(
            os.path.join(out_dir, f"time_{index:05d}.ply"),
            {k: np.asarray(v) for k, v in params_t.items()}, alive,
        )
    print(f"done → {out_dir}")


if __name__ == "__main__":
    main()
