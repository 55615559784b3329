"""True in-step cost of each pipeline component, by ablation.

The remote-attached backend has a ~1 ms per-dispatch floor, so timing stages
as separate jitted calls (profile_step.py) overstates small ops. Here each
measurement is the FULL train step (one dispatch), with ONE component
monkeypatched to a near-zero-cost stand-in; the delta vs the unmodified step
is that component's real in-step cost (fusion context included).

The ablated steps compute WRONG results — timing only.

Usage: python scripts/ablate_step.py   (real TPU, nothing else running)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    import jax

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            _ = leaf.ravel()[0].item()
            return


def time_step(step, args, iters=30, warmup=4):
    for _ in range(warmup):
        _sync(step(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def build(label):
    """Fresh workload + step under the CURRENT (possibly patched) modules."""
    from bench import build_workload

    step, state, adam_state, cams, gts = build_workload()
    args = (state.params, adam_state, state, cams, gts, 1)
    ms = time_step(step, args)
    print(f"{label:34s} {ms:7.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    import fourdgs_tpu.ops.binning as binning
    import fourdgs_tpu.ops.pallas_blend as PB
    import fourdgs_tpu.ops.rasterize as rasterize
    import fourdgs_tpu.train.adam as adam_mod

    results = {}
    base = build("full step (baseline)")
    results["base"] = base

    # -- 1. no tile sort: pass the depth-ordered stream through unsorted
    orig_sort = jax.lax.sort

    def fake_sort(operands, *a, **k):
        return operands
    jax.lax.sort = fake_sort
    results["sort"] = base - build("  - tile sort + depth argsort")
    jax.lax.sort = orig_sort

    # -- 2. no payload gather (feat = tiled copy of one row block)
    orig_take = jnp.take

    def fake_take(arr, idx, axis=None, **k):
        if axis == 0 and idx.ndim == 1 and arr.ndim == 2 and \
                arr.shape[1] == PB.FEAT_ROWS:
            reps = -(-idx.shape[0] // arr.shape[0])
            return jnp.tile(arr, (reps, 1))[:idx.shape[0]]
        return orig_take(arr, idx, axis=axis, **k)
    jnp.take = fake_take
    results["gather"] = base - build("  - payload gather (+its bwd scatter)")
    jnp.take = orig_take

    # -- 3. free blend kernels (keep all data movement, drop kernel time)
    orig_blend = PB.blend_pallas

    def fake_blend(feat, starts, stops, row_off, bg, grid_x, num_tiles,
                   k_pad, interpret=False):
        # shape-correct, touches feat so gather/scatter stay in the graph
        red = jnp.sum(feat.astype(jnp.float32), axis=1) * 1e-9
        out = jnp.zeros((num_tiles, PB.N_PIX, PB.OUT5), jnp.float32)
        return out + red[:PB.OUT5].sum()
    PB.blend_pallas = fake_blend
    results["blend"] = base - build("  - blend fwd+bwd kernels")
    PB.blend_pallas = orig_blend

    # -- 4. free adam
    orig_update = adam_mod.update

    def fake_update(params, grads, state, lr_tree, **k):
        return params, state
    adam_mod.update = fake_update
    results["adam"] = base - build("  - adam update")
    adam_mod.update = orig_update

    # -- 5. no preprocess-chain backward: stop_gradient on the feat table
    orig_rp = rasterize.rasterize_pallas

    def sg_table_rp(*a, **kw):
        return orig_rp(*a, **kw)
    # (covered indirectly: gather ablation removes table bwd too)

    # -- 6. binning entirely (sort + slot expansion + cumsums):
    orig_bin = binning.bin_gaussians_fast

    def fake_bin(tile_min, tile_max, tiles_touched, depths, grid_x, grid_y,
                 budget, **kw):
        K = budget
        T = grid_x * grid_y
        per = max(K // max(T, 1), 1)
        k = jnp.arange(K, dtype=jnp.int32)
        tile = jnp.minimum(k // per, T - 1).astype(jnp.int32)
        bounds = jnp.searchsorted(
            tile, jnp.arange(T + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return binning.BinningOut(
            gauss_id=k % tiles_touched.shape[0],
            tile_id=tile,
            tile_start=bounds[:T],
            tile_stop=bounds[1:],
            num_rendered=jnp.int32(K // 2),
            valid=tile >= 0,
        )
    binning.bin_gaussians_fast = fake_bin
    rasterize.bin_gaussians_fast = fake_bin
    results["binning_all"] = base - build("  - whole binning stage")
    binning.bin_gaussians_fast = orig_bin
    rasterize.bin_gaussians_fast = orig_bin

    print()
    for k, v in results.items():
        if k != "base":
            print(f"{k:14s} {v:7.2f} ms")


if __name__ == "__main__":
    main()
