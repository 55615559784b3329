"""Layout/packing probes on the live chip (round-4 perf work).

Hypotheses to (in)validate:
  H1  [P,3]-shaped arrays are tile-padded in HBM (physical [P,128]), so
      every elementwise pass over small-minor-dim param arrays pays ~42×
      logical traffic — suspected cause of the 3.9 ms Adam and part of
      preprocess.
  H2  Packing the 6 per-Gaussian param leaves into one [P,64] matrix (and
      mirroring moments) collapses Adam to ~bandwidth cost.
  H3  The pre-slot ellipse cull (ops.binning._rect_cull_mask) shrinks true
      instance demand enough to drop the budget a tier (all K-ops scale).

Usage: python scripts/exp_layout.py   (real TPU, nothing else running)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            _ = leaf.ravel()[0].item()
            return


def timeit(fn, *args, iters=30, warmup=3):
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
    import numpy as np

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    P = 65536
    rng = np.random.default_rng(0)

    print("== H1: elementwise pass cost vs minor dim (all logical [P,*]) ==")
    for shape in [(P, 1), (P, 3), (P, 4), (P, 8), (P, 45), (P, 64),
                  (P, 128), (P, 15, 3), (P * 3,)]:
        x = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
        f = jax.jit(lambda a: a * 1.0001 + 0.1)
        ms = timeit(f, x)
        logical = np.prod(shape) * 4 / 1e6
        print(f"  {str(shape):12s} {ms:7.3f} ms   ({logical:6.1f} MB logical)")

    print("== H2: Adam — per-leaf tree vs packed [P,64] ==")
    from bench import build_workload
    from fourdgs_tpu.train import adam as A
    step, state, adam_state, cams, gts = build_workload()
    params = state.params
    from fourdgs_tpu.configs.core import load_config
    cfg = load_config()
    lrs = A.learning_rates(100, cfg.opt, 1.0)
    lr_tree = A.lr_tree_for_params(params, lrs)
    grads = jax.tree.map(jnp.ones_like, params)
    ad = jax.jit(lambda p, g, a: A.update(p, g, a, lr_tree))
    print(f"  tree adam (full params): {timeit(ad, params, grads, adam_state):7.3f} ms")

    # prim-only tree adam (excludes deform subtree)
    prim = {k: v for k, v in params.items() if k != "deform"}
    gprim = {k: v for k, v in grads.items() if k != "deform"}
    mu_p = jax.tree.map(jnp.zeros_like, prim)
    lr_p = {k: lr_tree[k] for k in prim}
    def adam_prim(p, g, mu, nu):
        mu = jax.tree.map(lambda m, gg: 0.9 * m + 0.1 * gg, mu, g)
        nu = jax.tree.map(lambda v, gg: 0.999 * v + 0.001 * gg * gg, nu, g)
        newp = jax.tree.map(
            lambda pp, m, v, lr: pp - lr * m / (jnp.sqrt(v) + 1e-15),
            p, mu, nu, lr_p)
        return newp, mu, nu
    f1 = jax.jit(adam_prim)
    print(f"  tree adam (prim only):   {timeit(f1, prim, gprim, mu_p, mu_p):7.3f} ms")

    # packed [P,64]
    pk = jnp.asarray(rng.uniform(size=(P, 64)).astype(np.float32))
    lrv = jnp.asarray(rng.uniform(size=(64,)).astype(np.float32))
    def adam_packed(p, g, mu, nu):
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        return p - lrv * mu / (jnp.sqrt(nu) + 1e-15), mu, nu
    f2 = jax.jit(adam_packed)
    print(f"  packed [P,64] adam:      {timeit(f2, pk, pk, pk, pk):7.3f} ms")

    # packed with concat/split each step (params stay as leaves)
    def adam_concat(p, g, mu, nu):
        def pack(t):
            return jnp.concatenate(
                [t["xyz"], t["f_dc"].reshape(P, -1),
                 t["f_rest"].reshape(P, -1), t["opacity"],
                 t["scaling"], t["rotation"]], axis=1)
        pp, gg = pack(p), pack(g)
        mu = 0.9 * mu + 0.1 * gg
        nu = 0.999 * nu + 0.001 * gg * gg
        out = pp - mu / (jnp.sqrt(nu) + 1e-15)
        sizes = [3, 3, 45, 1, 3, 4]
        outs = jnp.split(out, np.cumsum(sizes)[:-1], axis=1)
        return dict(zip(("xyz", "f_dc", "f_rest", "opacity", "scaling",
                        "rotation"), outs)), mu, nu
    pk59 = jnp.asarray(rng.uniform(size=(P, 59)).astype(np.float32))
    f3 = jax.jit(adam_concat)
    print(f"  concat-pack adam:        "
          f"{timeit(f3, prim, gprim, pk59, pk59):7.3f} ms")

    print("== H3: pre-slot cull demand on the bench workload ==")
    from fourdgs_tpu.ops.binning import bin_gaussians_fast
    from fourdgs_tpu.ops.preprocess import preprocess
    cam0 = jax.tree.map(lambda x: x[0], cams)
    means3d = params["xyz"]
    scales = jnp.exp(params["scaling"])
    rots = params["rotation"]
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jax.nn.sigmoid(params["opacity"]).reshape(-1)
    from fourdgs_tpu.models import gaussians as _G
    shs = _G.get_features(params)
    pre = jax.jit(lambda: preprocess(
        means3d, scales, rots, shs, cam0.camera_center, cam0.world_view,
        cam0.full_proj, float(cam0.tanfovx), float(cam0.tanfovy),
        800, 800, 3, opacities=opac))()
    K = 384 * 1024
    b_plain = jax.jit(lambda: bin_gaussians_fast(
        pre.tile_min, pre.tile_max, pre.tiles_touched, pre.depths,
        50, 50, K))()
    b_cull = jax.jit(lambda: bin_gaussians_fast(
        pre.tile_min, pre.tile_max, pre.tiles_touched, pre.depths,
        50, 50, K, means2d=pre.means2d, lam_min=pre.lam_min,
        cull_c=pre.cull_c))()
    print(f"  rect demand:      {int(b_plain.num_rendered)}")
    print(f"  post-cull demand: {int(b_cull.num_rendered)}")
    bin_p = jax.jit(lambda tmin, tmax, tt, d: bin_gaussians_fast(
        tmin, tmax, tt, d, 50, 50, K))
    bin_c = jax.jit(lambda tmin, tmax, tt, d: bin_gaussians_fast(
        tmin, tmax, tt, d, 50, 50, K, means2d=pre.means2d,
        lam_min=pre.lam_min, cull_c=pre.cull_c))
    args = (pre.tile_min, pre.tile_max, pre.tiles_touched, pre.depths)
    print(f"  binning plain: {timeit(bin_p, *args):7.3f} ms")
    print(f"  binning cull:  {timeit(bin_c, *args):7.3f} ms")


if __name__ == "__main__":
    main()
