#!/usr/bin/env python3
"""DyNeRF-shaped convergence benchmark on the real TPU chip (VERDICT r4 #3).

Exercises exactly the machinery BASELINE config 5 (Neu3D/DyNeRF
cook_spinach-class scenes, reference arguments/dynerf/default.py +
scene/neural_3D_dataset_NDC.py) needs and that the bouncingballs bench never
touches:

  - multi-view VIDEO data: N_CAM fixed ring cameras × N_T timestamps,
    camera 0 held out entirely (the reference's eval_index=0 holdout,
    neural_3D_dataset_NDC.py:304-366)
  - the dynerf preset schedule/architecture (3k coarse + 14k fine,
    kplanes reso [64,64,64,150], net_width 128, defor_depth 0,
    no_do/no_dshs False, grid regularizers on)
  - batch_size 4 with the FineSampler temporally-correlated sampler
    (opt.custom_sampler engages via the camera-major heuristic)
  - a NON-16-multiple resolution (676×507 — half DyNeRF's 1352×1014) so
    the padded tile grid + pixel mask path runs on-chip
  - --instant4d: sh_degree 0 (simplified RGB) + isotropic Gaussians

GT is rendered by the production rasterizer over a known moving
ground-truth Gaussian scene (self-consistency evidence; the independent
oracle-GT proof lives in bench_quality.py --gt oracle).

Usage:
    python bench_quality_dynerf.py                # full 3k+14k (~12 min)
    python bench_quality_dynerf.py --scale 0.05   # smoke
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from bench_quality import gt_raster_args, make_gt_scene, ring_camera

N_CAM = 12
N_T = 150


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--width", type=int, default=676)
    ap.add_argument("--height", type=int, default=507)
    ap.add_argument("--n_test_t", type=int, default=15)
    ap.add_argument("--out", default="BENCH_QUALITY_DYNERF.json")
    ap.add_argument("--instant4d", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from fourdgs_tpu.configs.core import load_config
    from fourdgs_tpu.models import gaussians as G
    from fourdgs_tpu.ops.rasterize import rasterize_pallas
    from fourdgs_tpu.render import CameraArrays, render as render_fn
    from fourdgs_tpu.train import adam
    from fourdgs_tpu.train.loop import scene_reconstruction
    from fourdgs_tpu.utils import losses

    cfg = load_config("fourdgs_tpu/configs/presets/dynerf/default.py")
    cfg.opt.coarse_iterations = max(int(3000 * args.scale), 50)
    cfg.opt.iterations = max(int(14000 * args.scale), 100)
    cfg.opt.densify_until_iter = min(
        cfg.opt.densify_until_iter, int(10000 * args.scale)
    )
    # scale the activation edges with the schedule: an unscaled
    # densify_from_iter=500 in a 0.1-scale smoke means densification never
    # engages while untrained-deformation scale inflation runs away — the
    # full-schedule proportions are what the reference trains under
    cfg.opt.densify_from_iter = int(cfg.opt.densify_from_iter * args.scale)
    cfg.opt.pruning_from_iter = int(cfg.opt.pruning_from_iter * args.scale)
    cfg.opt.position_lr_max_steps = cfg.opt.iterations
    # DEVIATION from the dynerf preset (documented in the JSON): the preset
    # disables opacity resets within its schedule (interval 60000), tuned
    # for real multi-view captures. On this synthetic ring scene the
    # no-reset schedule falls into the fog minimum (scales inflate while
    # opacities collapse below 1/255, after which the opacity-aware rect
    # cull leaves zero instances and training is dead) — keep the global
    # 3k reset cadence (reference arguments/__init__.py:147 default).
    cfg.opt.opacity_reset_interval = max(int(3000 * args.scale), 100)
    cfg.opt.custom_sampler = "fine"      # FineSampler (loader_utils.py:23-52)
    cfg.tpu.backend = "pallas"
    cfg.tpu.payload_bf16 = True
    cfg.tpu.instance_budget = 256 * 1024
    # the fine-start deformation transient demands ~13M instances for a few
    # hundred steps; cap the budget at 2M and let overflow truncation carry
    # the transient (deepest instances dropped — graceful LOD)
    cfg.tpu.instance_budget_max = 2 * 1024 * 1024
    # start fine at exactly the canonical model (head deltas = 0): the
    # Xavier-init transient never decays under heavy truncation (the
    # shrink gradient is starved when 85% of each tile's list is dropped)
    cfg.hidden.zero_init_heads = True
    if args.instant4d:
        cfg.model.use_isotropic_gaussian = True
        cfg.model.sh_degree = 0

    W, H = args.width, args.height
    rng = np.random.default_rng(0)

    pts_gt, cols_gt, scales_gt, offsets = make_gt_scene()
    extra = gt_raster_args(pts_gt, cols_gt, scales_gt)
    bg = jnp.zeros(3)
    GT_BUDGET = 64 * 1024

    @jax.jit
    def gt_render(means3d, cam_wv, cam_fp, cam_center, tanx, tany):
        out = rasterize_pallas(
            means3d, extra["scales"], extra["rotations"],
            extra["opacities"], extra["shs"],
            cam_center, cam_wv, cam_fp, tanx, tany, W, H, 0, bg,
            instance_budget=GT_BUDGET,
        )
        return out.color, out.num_rendered

    # N_CAM fixed cameras on a ring (camera-major ordering, as the
    # reference's video datasets iterate); camera 0 held out for eval.
    cam_rng = np.random.default_rng(7)
    poses = [(cam_rng.uniform(0, 2 * np.pi), cam_rng.uniform(0.2, 0.8))
             for _ in range(N_CAM)]

    def render_pair(ci, t):
        ang, elev = poses[ci]
        cam = ring_camera(ang, elev, W, H, t)
        img, n_inst = gt_render(
            jnp.asarray(pts_gt + offsets(t)),
            jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.camera_center), cam.tanfovx, cam.tanfovy,
        )
        assert int(n_inst) <= GT_BUDGET
        img8 = np.clip(
            np.asarray(img).transpose(1, 2, 0) * 255.0 + 0.5, 0, 255
        ).astype(np.uint8)
        return cam, img8

    t0 = time.time()
    train_cams = []
    for ci in range(1, N_CAM):          # camera-major: all frames of cam 1,
        for ti in range(N_T):           # then cam 2, ... (FineSampler layout)
            t = ti / (N_T - 1)
            train_cams.append(render_pair(ci, t))
    test_cams = []
    for ti in np.linspace(0, N_T - 1, args.n_test_t).astype(int):
        test_cams.append(render_pair(0, ti / (N_T - 1)))
    gt_time = time.time() - t0
    gt_bytes = sum(g.nbytes for _, g in train_cams)
    print(f"GT: {len(train_cams)} train frames ({N_CAM - 1} cams × {N_T} t)"
          f" + {len(test_cams)} held-out cam-0 frames in {gt_time:.0f}s"
          f" ({gt_bytes / 1e9:.2f} GB)")

    # init: surface-informed cloud, as the reference's DyNeRF path provides
    # (fused COLMAP points downsampled to ≤40k, README.md:284 — never
    # uniform noise). A pure-noise init on this scene grows giant
    # degenerate free-space Gaussians whose near-singular 2D covariance
    # overflows the det⁻¹ gradient by ~iteration 1100 — the same blow-up
    # the reference's CUDA math has (its NaN watchdog self-restarts,
    # train.py:263-265) and which its COLMAP inits avoid.
    surf = pts_gt[rng.choice(len(pts_gt), 4000)] + rng.normal(
        0, 0.05, (4000, 3)
    ).astype(np.float32)
    init_pts = np.concatenate(
        [surf, rng.uniform(-1.1, 1.1, (4000, 3))]
    ).astype(np.float32)
    init_cols = rng.uniform(0, 1, (8000, 3)).astype(np.float32)
    state = G.create_from_pcd(jax.random.key(6666), cfg, init_pts,
                              init_cols, 5.0)
    adam_state = adam.init(state.params)

    t1 = time.time()

    def progress(it, stage, m, *_):
        print(f"[{stage} {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f} "
              f"pts={int(m['n_points'])} inst={int(m['num_rendered'])} "
              f"({time.time() - t1:.0f}s)", flush=True)

    state, adam_state, _ = scene_reconstruction(
        cfg, state, adam_state, train_cams, "coarse",
        cfg.opt.coarse_iterations, cameras_extent=5.0, rng_seed=6666,
        log_interval=500, log_fn=progress,
    )
    # fresh per-stage instance budget: the coarse stage's pre-reset fog
    # transient can balloon the grow-only budget (observed 262k → 4.2M);
    # after the iter-3000 opacity reset demand collapses back to ~300k,
    # and inheriting the ballooned K would tax every fine K-sized op 4-8×.
    cfg.tpu.instance_budget = 512 * 1024
    state, adam_state, _ = scene_reconstruction(
        cfg, state, adam_state, train_cams, "fine", cfg.opt.iterations,
        cameras_extent=5.0, rng_seed=6667, log_interval=500,
        log_fn=progress,
    )
    n_points = int(G.count_alive(state))
    wall = time.time() - t1

    sh_deg = int(state.active_sh_degree)

    @jax.jit
    def eval_render(params, st, cam):
        return render_fn(
            params, st, cam, cfg, W, H, "fine", bg, sh_deg
        ).color

    psnrs = []
    for cam, gt in test_cams:
        color = eval_render(state.params, state,
                            CameraArrays.from_camera(cam))
        gt_f = jnp.asarray(
            gt.astype(np.float32).transpose(2, 0, 1) / 255.0
        )
        psnrs.append(float(losses.psnr(color[None], gt_f[None])[0]))
    test_psnr = float(np.mean(psnrs))

    iters = cfg.opt.coarse_iterations + cfg.opt.iterations
    result = {
        "scene": "synthetic-multiview-video (DyNeRF-shaped)",
        "instant4d": bool(args.instant4d),
        "resolution": [W, H],
        "cams_train": N_CAM - 1,
        "timestamps": N_T,
        "holdout": "camera 0 (eval_index=0 convention)",
        "preset_deviation": "opacity_reset_interval 60000 -> "
                            f"{cfg.opt.opacity_reset_interval} (synthetic "
                            "scene falls into the fog minimum without "
                            "resets; see source comment)",
        "batch_size": cfg.opt.batch_size,
        "fine_sampler": True,
        "schedule": {"coarse": cfg.opt.coarse_iterations,
                     "fine": cfg.opt.iterations},
        "scale": args.scale,
        "train_wall_clock_s": round(wall, 1),
        "test_psnr_db": round(test_psnr, 2),
        "final_points": n_points,
        "it_per_s": round(iters / wall, 2),
        # 30-min HyperNeRF/DyNeRF-class GPU envelope (README.md:37) scaled;
        # one v5e-8 host = 8 chips
        "ref_30min_equivalent_s": round(1800 * args.scale, 1),
        "chip_minutes_vs_host_budget": round(
            (wall / 60) / (240 * args.scale), 3
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
