#!/usr/bin/env python3
"""Measure isolated fwd+bwd cost of train-step components on the real chip.

Each component is timed as jit(grad(sum(component))) with donated-free inputs,
15 iters after 3 warmups. Isolated numbers carry the ~1 ms dispatch floor and
lose cross-component fusion, so treat them as upper bounds / ratios.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=15, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.tree.leaves(out)[0].ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.tree.leaves(out)[0].ravel()[0].item()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import build_workload
    from fourdgs_tpu.configs.core import load_config
    from fourdgs_tpu.models import gaussians as G
    from fourdgs_tpu.models import hexplane as hp
    from fourdgs_tpu.models import deformation as deform_lib
    from fourdgs_tpu.ops.preprocess import preprocess
    from fourdgs_tpu.train import adam as adam_lib

    _, state, adam_state, cams, gts = build_workload()
    params = state.params
    cam = jax.tree.map(lambda x: x[0], cams)
    P = params["xyz"].shape[0]
    cfg = load_config()
    cfg.hidden.multires = (1, 2)
    cfg.hidden.net_width = 64
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False

    xyz = params["xyz"]
    shs = G.get_features(params)

    # -- preprocess fwd+bwd (sh_degree 3)
    def pre_loss(xyz, scaling, rotation, opacity, shs):
        pre = preprocess(
            xyz, jnp.exp(scaling), rotation, shs,
            cam.camera_center, cam.world_view, cam.full_proj,
            cam.tanfovx, cam.tanfovy, 800, 800, 3,
            alive=state.alive, opacities=jax.nn.sigmoid(opacity).reshape(-1),
        )
        return (jnp.sum(pre.means2d) + jnp.sum(pre.conic) + jnp.sum(pre.rgb)
                + jnp.sum(pre.depths))

    f = jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3, 4)))
    ms = timeit(f, xyz, params["scaling"], params["rotation"],
                params["opacity"], shs)
    print(f"preprocess fwd+bwd (P={P}, sh3): {ms:.3f} ms")

    # -- preprocess forward only
    f2 = jax.jit(pre_loss)
    ms = timeit(f2, xyz, params["scaling"], params["rotation"],
                params["opacity"], shs)
    print(f"preprocess fwd only: {ms:.3f} ms")

    # -- hexplane query fwd+bwd (2 scales), scalar t
    t = jnp.float32(0.4)

    def hex_loss(planes, xyz):
        feats = hp.query_hexplane(planes, state.aabb, xyz, t, 2)
        return jnp.sum(feats * feats)

    planes = {k: v for k, v in params["deform"].items()
              if k.startswith("grid_")}
    f3 = jax.jit(jax.grad(hex_loss, argnums=(0, 1)))
    ms = timeit(f3, planes, xyz)
    print(f"hexplane query fwd+bwd (P={P}): {ms:.3f} ms")

    f3b = jax.jit(hex_loss)
    ms = timeit(f3b, planes, xyz)
    print(f"hexplane query fwd only: {ms:.3f} ms")

    # -- full deformation (hexplane + MLP heads) fwd+bwd
    def deform_loss(dparams, xyz, scaling, rotation, opacity, shs):
        tt = jnp.broadcast_to(t, (xyz.shape[0],))
        out = deform_lib.deform(
            dparams, cfg.hidden, state.aabb, xyz, scaling, rotation,
            opacity, shs, tt,
        )
        return sum(jnp.sum(o) for o in out)

    f4 = jax.jit(jax.grad(deform_loss, argnums=(0, 1, 2, 3, 4, 5)))
    ms = timeit(f4, params["deform"], xyz, params["scaling"],
                params["rotation"], params["opacity"], shs)
    print(f"deform (hexplane+MLP) fwd+bwd: {ms:.3f} ms")

    # -- Adam update alone
    lrs = adam_lib.learning_rates(jnp.int32(100), cfg.opt, 1.0)
    lr_tree = adam_lib.lr_tree_for_params(params, lrs)
    g = jax.tree.map(jnp.ones_like, params)

    def adam_step(params, g, st):
        return adam_lib.update(params, g, st, lr_tree)

    f5 = jax.jit(adam_step)
    ms = timeit(f5, params, g, adam_state)
    print(f"adam update: {ms:.3f} ms")


if __name__ == "__main__":
    main()
