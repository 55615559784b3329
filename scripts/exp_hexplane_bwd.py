#!/usr/bin/env python3
"""Experiment: spatial-plane backward alternatives to the XLA scatter.

Candidates for d_table [Ra·Rb, 4F] from 65k duplicate-index rows:
  scatter      — jnp.take autodiff (the current path)
  segsum       — sort by cell + compensated blockwise segment sums
                 (the ops.rasterize payload trick, ~4096/16384 segments)
  onehot-mm    — per-block one-hot matmul (XLA, no Pallas): E_blk built
                 [BLK, cells] bf16, dT += E_blkᵀ @ dRows_blk, lax.scan over
                 blocks with a f32 [cells, 4F] carry
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
    import numpy as np

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from fourdgs_tpu.ops.rasterize import _seg_sums_compensated

    N = 65536
    W = 128  # 4F row width
    rng = np.random.default_rng(0)
    d_rows = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))

    for cells in (4096, 16384):
        idx = jnp.asarray(rng.integers(0, cells, N, dtype=np.int32))

        # -- scatter baseline
        def scat(d_rows, idx, cells=cells):
            return jnp.zeros((cells, W), jnp.float32).at[idx].add(d_rows)

        ms = timeit(jax.jit(scat), d_rows, idx)
        print(f"cells={cells}: scatter            {ms:.3f} ms")

        # -- sort + compensated segment sums
        def segsum(d_rows, idx, cells=cells):
            srt_idx, pos = jax.lax.sort(
                (idx, jnp.arange(N, dtype=jnp.int32)), num_keys=1
            )
            ordered = jnp.take(d_rows, pos, axis=0)
            cell_ids = jnp.arange(cells, dtype=jnp.int32)
            starts = jnp.searchsorted(srt_idx, cell_ids)
            stops = jnp.searchsorted(srt_idx, cell_ids, side="right")
            return _seg_sums_compensated(ordered, starts, stops - starts)

        ms = timeit(jax.jit(segsum), d_rows, idx)
        print(f"cells={cells}: sort+segsum        {ms:.3f} ms")

        # -- blocked one-hot matmul via lax.scan (bf16 split2 accuracy)
        BLK = 512

        def onehot(d_rows, idx, cells=cells):
            nb = N // BLK
            idx_b = idx.reshape(nb, BLK)
            hi_b = d_rows.astype(jnp.bfloat16).reshape(nb, BLK, W)
            lo_b = (d_rows - hi_b.astype(jnp.float32).reshape(N, W)).astype(
                jnp.bfloat16
            ).reshape(nb, BLK, W)

            def body(acc, xs):
                ib, hb, lb = xs
                lanes = jax.lax.broadcasted_iota(
                    jnp.int32, (BLK, cells), 1
                )
                E = (lanes == ib[:, None]).astype(jnp.bfloat16)
                mm = lambda v: jax.lax.dot_general(
                    E, v, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                return acc + mm(hb) + mm(lb), None

            acc0 = jnp.zeros((cells, W), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, (idx_b, hi_b, lo_b))
            return acc

        ms = timeit(jax.jit(onehot), d_rows, idx)
        print(f"cells={cells}: onehot-matmul scan {ms:.3f} ms")

        # numerics check vs f64 on CPU-ish: compare segsum to scatter
        a = jax.jit(scat)(d_rows, idx)
        b = jax.jit(segsum)(d_rows, idx)
        c = jax.jit(onehot)(d_rows, idx)
        ref = np.asarray(a, np.float64)
        err_b = float(np.max(np.abs(np.asarray(b) - ref))
                      / (np.abs(ref).max() + 1e-9))
        err_c = float(np.max(np.abs(np.asarray(c) - ref))
                      / (np.abs(ref).max() + 1e-9))
        print(f"cells={cells}: rel err segsum {err_b:.2e}  onehot {err_c:.2e}")


if __name__ == "__main__":
    main()
