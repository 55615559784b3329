"""Bisect the train step's unaccounted milliseconds on the live chip.

Times jitted subsets of the full train step (render-only, loss-only,
value_and_grad, +adam, +stats) to localize overheads that per-stage
profiling misses (scripts/profile_step.py).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _sync(out):
    import jax

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            _ = leaf.ravel()[0].item()
            return


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from fourdgs_tpu.models import hexplane as hp
    from fourdgs_tpu.render import render
    from fourdgs_tpu.utils import losses

    H = W = 800
    step, state, adam_state, cams, gts = build_workload(height=H, width=W)
    params = state.params
    from fourdgs_tpu.configs.core import load_config
    from scripts.profile_step import _bench_cfg
    cfg = _bench_cfg()
    cfg.tpu.instance_budget = 384 * 1024
    cfg.tpu.payload_bf16 = True
    bg = jnp.zeros(3)
    cam0 = jax.tree.map(lambda x: x[0], cams)

    full_ms = timeit(lambda: step(params, adam_state, state, cams, gts, 1))
    print(f"full train step:            {full_ms:8.2f} ms")

    # 1. render forward only (fine)
    f_fwd = jax.jit(lambda p: render(
        p, state, cam0, cfg, W, H, "fine", bg, 3).color.sum())
    print(f"render fwd only:            {timeit(f_fwd, params):8.2f} ms")

    # 2. render + L1 loss fwd+bwd (no carrier, no aux)
    def l1_loss(p):
        out = render(p, state, cam0, cfg, W, H, "fine", bg, 3)
        return losses.l1_loss(out.color[None], gts[:, :3])

    g1 = jax.jit(jax.grad(l1_loss))
    print(f"L1 fwd+bwd (no carrier):    {timeit(g1, params):8.2f} ms")

    # 3. + hexplane regularization
    def l1_reg(p):
        return l1_loss(p) + hp.hexplane_regularization(
            p["deform"], len(cfg.hidden.multires),
            cfg.hidden.plane_tv_weight, cfg.hidden.time_smoothness_weight,
            cfg.hidden.l1_time_planes)

    g2 = jax.jit(jax.grad(l1_reg))
    print(f"+hexplane reg:              {timeit(g2, params):8.2f} ms")

    # 4. + means2d carrier grad (the densify-stat harvest)
    def l1_carrier(p, carrier):
        out = render(p, state, cam0, cfg, W, H, "fine", bg, 3,
                     means2d_offset=carrier)
        return losses.l1_loss(out.color[None], gts[:, :3])

    g3 = jax.jit(jax.grad(l1_carrier, argnums=(0, 1)))
    carrier = jnp.zeros((params["xyz"].shape[0], 2))
    print(f"+carrier grad:              {timeit(g3, params, carrier):8.2f} ms")

    # 5. + aux outputs (radii, num_rendered, dxyz)
    def l1_aux(p, carrier):
        out = render(p, state, cam0, cfg, W, H, "fine", bg, 3,
                     means2d_offset=carrier)
        l = losses.l1_loss(out.color[None], gts[:, :3])
        return l, (out.radii, out.num_rendered, out.max_tile_len)

    g4 = jax.jit(jax.value_and_grad(l1_aux, argnums=(0, 1), has_aux=True))
    print(f"+aux outputs:               {timeit(g4, params, carrier):8.2f} ms")


if __name__ == "__main__":
    main()
