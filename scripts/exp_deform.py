"""Experiment: time the deformation (HexPlane + MLP) fwd and fwd+bwd alone.

Separates the deformation network's cost from the rasterizer's so we know how
much of the fine-stage step the field accounts for, and which sub-part
(spatial plane sampling + its backward scatter, temporal matmul, the MLP)
dominates.
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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from fourdgs_tpu.models import deformation as dfm
    from fourdgs_tpu.models import hexplane as hp
    from fourdgs_tpu.configs.core import load_config

    step, state, adam_state, cams, gts = build_workload()
    params = state.params
    cfg = load_config()
    cfg.hidden.multires = (1, 2)
    cfg.hidden.net_width = 64
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False
    cfg.model.sh_degree = 3

    xyz = params["xyz"]
    aabb = state.aabb
    t = jnp.float32(0.37)

    def deform_all(p):
        out = dfm.deform(
            p["deform"], cfg.hidden, aabb,
            xyz, p["scaling"], p["rotation"], p["opacity"],
            jnp.concatenate([p["f_dc"], p["f_rest"]], axis=1),
            t,
        )
        return sum(jnp.sum(o) for o in out)

    f = jax.jit(deform_all)
    print(f"deform fwd:        {timeit(f, params):7.2f} ms")
    g = jax.jit(jax.grad(deform_all))
    print(f"deform fwd+bwd:    {timeit(g, params):7.2f} ms")

    def field_only(p):
        feat = hp.query_hexplane(p["deform"], aabb, xyz, t,
                                 len(cfg.hidden.multires))
        return jnp.sum(feat)

    f2 = jax.jit(field_only)
    print(f"hexplane fwd:      {timeit(f2, params):7.2f} ms")
    g2 = jax.jit(jax.grad(field_only))
    print(f"hexplane fwd+bwd:  {timeit(g2, params):7.2f} ms")

    # spatial planes only (the gather/scatter path)
    def spatial_only(p):
        import numpy as np
        xyzn = hp.normalize_aabb(xyz, aabb)
        tot = 0.0
        for s in range(2):
            for pi, comb in enumerate(hp.COO_COMBS):
                if comb[1] == 3:
                    continue
                plane = p["deform"][f"grid_s{s}_p{pi}"]
                tot = tot + jnp.sum(hp._bilinear_plane(
                    plane, xyzn[:, comb[0]], xyzn[:, comb[1]]))
        return tot

    f3 = jax.jit(spatial_only)
    print(f"spatial planes fwd:     {timeit(f3, params):7.2f} ms")
    g3 = jax.jit(jax.grad(spatial_only))
    print(f"spatial planes fwd+bwd: {timeit(g3, params):7.2f} ms")


if __name__ == "__main__":
    main()
