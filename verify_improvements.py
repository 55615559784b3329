#!/usr/bin/env python3
"""Smoke-test the Instant4D fast-train improvements (~1 minute, CPU-runnable).

Parity with reference verify_improvements.py:1-55: build a random 50k-point
cloud, run grid pruning, check the isotropic-scaling broadcast, build
simplified-RGB (DC-only) features, and assert the three ModelParams flags
exist.

    python verify_improvements.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fourdgs_tpu.configs.core import load_config
    from fourdgs_tpu.data.grid_pruning import grid_prune_pointcloud
    from fourdgs_tpu.data.ply import PointCloud
    from fourdgs_tpu.models import gaussians as G

    t0 = time.time()
    rng = np.random.default_rng(0)

    print("=== 1. grid pruning ===")
    pts = rng.normal(0, 0.5, (50_000, 3)).astype(np.float32)
    pcd = PointCloud(
        points=pts,
        colors=rng.uniform(0, 1, (50_000, 3)).astype(np.float32),
        normals=np.zeros((50_000, 3), np.float32),
    )
    pruned = grid_prune_pointcloud(pcd, None)
    reduction = 1 - pruned.points.shape[0] / pts.shape[0]
    print(f"  {pts.shape[0]} → {pruned.points.shape[0]} points "
          f"({reduction*100:.1f}% reduction)")
    assert pruned.points.shape[0] < pts.shape[0]

    print("=== 2. isotropic gaussians ===")
    params = {"scaling": jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)}
    iso = G.get_scaling(params, isotropic=True)
    assert np.allclose(np.asarray(iso[:, 0]), np.asarray(iso[:, 1]))
    assert np.allclose(np.asarray(iso[:, 0]), np.asarray(iso[:, 2]))
    print("  scaling broadcast equal across the three axes ✓")

    print("=== 3. simplified RGB (sh_degree=0) ===")
    cfg = load_config()
    cfg.model.sh_degree = 0
    cfg.tpu.capacity = 1024
    state = G.create_from_pcd(
        jax.random.key(0), cfg, pts[:512],
        rng.uniform(0, 1, (512, 3)).astype(np.float32), 1.0,
    )
    assert state.params["f_rest"].shape[1] == 0
    full = 16 * 3
    dc = 1 * 3
    print(f"  SH coeffs {full//3} → {dc//3} per channel "
          f"(−{(1 - dc/full)*100:.2f}% SH params)")

    print("=== 4. config flags ===")
    cfg = load_config()
    for flag in ("use_grid_pruning", "use_isotropic_gaussian",
                 "use_simplified_rgb"):
        assert hasattr(cfg.model, flag), flag
        print(f"  ModelParams.{flag} ✓")

    print(f"all checks passed in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
