"""Experiment: fastest way to materialize the [16, K] payload gather.

The profile shows `jnp.take(table, gauss_id, axis=0).T` at ~6 ms fwd and
~7 ms for its backward scatter — together ~26% of the train step. This
script times candidate replacements on the live chip.
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

    P = 65_536
    K = 384 * 1024
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, K, dtype=np.int32))
    for dt in (jnp.float32, jnp.bfloat16):
        table = jnp.asarray(
            rng.standard_normal((P, 16), dtype=np.float32)
        ).astype(dt)
        tableT = table.T  # [16, P]
        name = dt.__name__

        f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).T)
        print(f"take axis0 + T    ({name}): {timeit(f1, table, idx):7.2f} ms")

        f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        print(f"take axis1 [16,P] ({name}): {timeit(f2, tableT, idx):7.2f} ms")

        f3 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        print(f"take axis0 (no T) ({name}): {timeit(f3, table, idx):7.2f} ms")

        # backward of the current path: scatter-add [K,16] rows into [P,16]
        def bwd(t, i):
            g = jnp.ones((K, 16), dt)
            return jax.lax.scatter_add(
                jnp.zeros((P, 16), dt), i[:, None], g,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1,), inserted_window_dims=(0,),
                    scatter_dims_to_operand_dims=(0,),
                ),
            )
        print(f"scatter-add bwd   ({name}): {timeit(jax.jit(bwd), table, idx):7.2f} ms")

        # segment-sum after a sort by gauss_id
        def seg(t, i):
            g = jnp.ones((K, 16), dt)
            si, order = jax.lax.sort((i, jnp.arange(K, dtype=jnp.int32)),
                                     num_keys=1)
            gs = jnp.take(g, order, axis=0)
            return jax.ops.segment_sum(gs, si, num_segments=P)
        print(f"sort+segsum bwd   ({name}): {timeit(jax.jit(seg), table, idx):7.2f} ms")

    # Pallas in-kernel gather from a VMEM-resident table, if supported
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    table = jnp.asarray(rng.standard_normal((16, P), dtype=np.float32))
    BLK = 2048

    def gk(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[0, :]                       # [BLK] int32
        out_ref[:, :] = jnp.take(tbl_ref[:, :], ids, axis=1)

    try:
        gather_p = pl.pallas_call(
            gk,
            grid=(K // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda t: (0, t)),
                pl.BlockSpec((16, P), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((16, BLK), lambda t: (0, t)),
            out_shape=jax.ShapeDtypeStruct((16, K), jnp.float32),
        )
        fp = jax.jit(lambda i, t: gather_p(i.reshape(1, -1), t))
        r = fp(idx, table)
        ref = jnp.take(table, idx, axis=1)
        err = float(jnp.abs(r - ref).max())
        print(f"pallas vmem-gather: {timeit(fp, idx, table):7.2f} ms  (maxerr {err:.1e})")
    except Exception as e:  # noqa: BLE001
        print(f"pallas vmem-gather: UNSUPPORTED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
