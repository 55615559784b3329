"""Per-stage wall-clock breakdown of the bench train step on the live chip.

Times each pipeline stage in isolation (jitted, warmed) so we know where the
step's milliseconds go: preprocess, binning, payload gather, pallas blend
fwd/bwd, gradient scatter, render fwd+bwd, adam, full train step.

Usage: python scripts/profile_step.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _sync(out):
    """True host sync (block_until_ready is a no-op on the remote backend).

    Pulls ONE leaf only: dispatch is ordered, so the last computation's
    completion implies the rest. Pulling every leaf costs one remote
    round-trip each (~40 ms on the tunnel) and swamps the measurement.
    """
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

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import build_workload
    from fourdgs_tpu.ops import constants as C
    from fourdgs_tpu.ops import pallas_blend as PB
    from fourdgs_tpu.ops.binning import bin_gaussians_fast
    from fourdgs_tpu.ops.preprocess import preprocess

    H = W = 800
    step, state, adam_state, cams, gts = build_workload(height=H, width=W)
    params = state.params

    full_ms = timeit(
        lambda: step(params, adam_state, state, cams, gts, 1), iters=20
    )
    print(f"full train step:      {full_ms:8.2f} ms")

    cam0 = jax.tree.map(lambda x: x[0], cams)
    means3d = params["xyz"]
    scales = jnp.exp(params["scaling"])
    rots = params["rotation"]
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jax.nn.sigmoid(params["opacity"]).reshape(-1)
    from fourdgs_tpu.models import gaussians as _G
    shs = _G.get_features(params)

    pre_f = jax.jit(lambda m, s, r, sh, o: preprocess(
        m, s, r, sh, cam0.camera_center, cam0.world_view, cam0.full_proj,
        float(cam0.tanfovx), float(cam0.tanfovy), W, H, 3, opacities=o))
    print(f"preprocess fwd:       "
          f"{timeit(pre_f, means3d, scales, rots, shs, opac):8.2f} ms")

    pre = pre_f(means3d, scales, rots, shs, opac)
    gx = (W + C.TILE_X - 1) // C.TILE_X
    gy = (H + C.TILE_Y - 1) // C.TILE_Y
    K = 320 * 1024

    bin_f = jax.jit(lambda tmin, tmax, tt, d: bin_gaussians_fast(
        tmin, tmax, tt, d, gx, gy, K))
    print(f"binning:              "
          f"{timeit(bin_f, pre.tile_min, pre.tile_max, pre.tiles_touched, pre.depths):8.2f} ms")

    bins = bin_f(pre.tile_min, pre.tile_max, pre.tiles_touched, pre.depths)
    T = gx * gy
    print(f"  (true demand: {int(bins.num_rendered)})")

    P_n = means3d.shape[0]

    def gather(gid_src):
        table = jnp.concatenate([
            pre.means2d, pre.conic, opac[:, None], pre.rgb,
            pre.depths[:, None], jnp.zeros((P_n, PB.FEAT_ROWS - 10))], axis=1)
        return jnp.take(table, gid_src, axis=0).T

    gather_j = jax.jit(gather)
    print(f"payload gather:       {timeit(gather_j, bins.gauss_id):8.2f} ms")
    feat = gather_j(bins.gauss_id)

    row_off = jnp.asarray([0, 1], jnp.int32)
    bg0 = jnp.zeros(3)
    fwd = jax.jit(lambda f, s, e: PB.blend_pallas(f, s, e, row_off, bg0,
                                                  gx, T, K))
    print(f"blend fwd:            "
          f"{timeit(fwd, feat, bins.tile_start, bins.tile_stop):8.2f} ms")

    def loss_fn(f):
        out5 = PB.blend_pallas(
            f, bins.tile_start, bins.tile_stop, row_off, bg0, gx, T, K
        )
        return jnp.sum(out5[:, :, :4])

    fb = jax.jit(jax.grad(loss_fn))
    print(f"blend fwd+bwd:        {timeit(fb, feat):8.2f} ms")

    # backward of the payload gather: scatter-add with duplicate indices
    gid = bins.gauss_id

    def gather_loss(table):
        rows = jnp.take(table, gid, axis=0)
        return jnp.sum(rows * rows)

    table0 = jnp.zeros((P_n, PB.FEAT_ROWS), jnp.float32)
    gb = jax.jit(jax.grad(gather_loss))
    print(f"gather bwd (scatter): {timeit(gb, table0):8.2f} ms")

    # full render fwd+bwd, coarse + fine stage (raster [+ deformation])
    from fourdgs_tpu.render import render as render_fn
    cfg = _bench_cfg()
    bgc = jnp.zeros(3)

    def render_loss(p, stage):
        out = render_fn(p, state, cam0, cfg, W, H, stage, bgc, 3)
        return jnp.sum(out.color)

    for stg in ("coarse", "fine"):
        f = jax.jit(lambda p, s=stg: jax.grad(
            lambda pp: render_loss(pp, s))(p)["xyz"].sum())
        print(f"render fwd+bwd {stg:6s}:{timeit(f, params):8.2f} ms")

    # adam update alone
    from fourdgs_tpu.train import adam as A
    lrs = A.learning_rates(100, cfg.opt, 1.0)
    lr_tree = A.lr_tree_for_params(params, lrs)
    ad = jax.jit(lambda p, a: A.update(p, jax.tree.map(jnp.ones_like, p), a, lr_tree))
    print(f"adam update:          {timeit(ad, params, adam_state):8.2f} ms")


def _bench_cfg():
    from fourdgs_tpu.configs.core import load_config
    cfg = load_config()
    cfg.tpu.capacity = 65_536
    cfg.tpu.instance_budget = 320 * 1024
    cfg.tpu.tile_budget = 2048
    cfg.tpu.blend_chunk = 256
    cfg.hidden.multires = (1, 2)
    cfg.hidden.net_width = 64
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False
    cfg.model.sh_degree = 3
    cfg.tpu.backend = "pallas"
    return cfg


if __name__ == "__main__":
    main()
