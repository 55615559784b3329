"""Experiment: what makes a 2500-step Pallas grid expensive?

Times minimal kernels at grid=(2500,) with varying output-block counts,
semantics, and grid shapes to locate the per-tile fixed cost seen in the
blend kernels (~1.6 us/tile forward on an EMPTY tile grid).
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


def timeit(fn, *args, iters=50, warmup=3):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 2500
    N = 256

    def blk(ch):
        return pl.BlockSpec((1, N, ch), lambda t, *_: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    # 1. one [256,1] output, parallel semantics
    def k1(o):
        o[0] = jnp.ones((N, 1), jnp.float32)

    for sem in ("parallel", "arbitrary"):
        f = pl.pallas_call(
            k1, grid=(T,), out_specs=blk(1),
            out_shape=jax.ShapeDtypeStruct((T, N, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem,)),
        )
        print(f"1 out blk, {sem:9s}: {timeit(jax.jit(lambda: f())): 6.2f} ms")

    # 2. three output blocks, arbitrary
    def k3(a, b, c):
        a[0] = jnp.ones((N, 3), jnp.float32)
        b[0] = jnp.ones((N, 1), jnp.float32)
        c[0] = jnp.ones((N, 1), jnp.float32)

    f3 = pl.pallas_call(
        k3, grid=(T,), out_specs=[blk(3), blk(1), blk(1)],
        out_shape=[jax.ShapeDtypeStruct((T, N, 3), jnp.float32),
                   jax.ShapeDtypeStruct((T, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((T, N, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    print(f"3 out blks, arbitrary: {timeit(jax.jit(lambda: f3())): 6.2f} ms")

    # 3. one [256,5] output
    f5 = pl.pallas_call(
        k1, grid=(T,), out_specs=blk(5),
        out_shape=jax.ShapeDtypeStruct((T, N, 5), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def k5(o):
        o[0] = jnp.ones((N, 5), jnp.float32)

    f5 = pl.pallas_call(
        k5, grid=(T,), out_specs=blk(5),
        out_shape=jax.ShapeDtypeStruct((T, N, 5), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    print(f"1 out blk[5], arbitrary: {timeit(jax.jit(lambda: f5())): 6.2f} ms")

    # 4. pair tiles: grid T/2, block (2, N, 5)
    def kp(o):
        o[:] = jnp.ones((2, N, 5), jnp.float32)

    fp = pl.pallas_call(
        kp, grid=(T // 2,),
        out_specs=pl.BlockSpec((2, N, 5), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N, 5), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    print(f"paired grid/2 blk[2,5]:  {timeit(jax.jit(lambda: fp())): 6.2f} ms")

    # 5. iota work per tile (tri matrix + pixel coords) on 1-blk kernel
    def kw(o):
        i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (i < j).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        px = (sub % 16).astype(jnp.float32)
        o[0] = px + tri[0:1, 0:1] * jnp.ones((N, 1), jnp.float32)

    fw = pl.pallas_call(
        kw, grid=(T,), out_specs=blk(1),
        out_shape=jax.ShapeDtypeStruct((T, N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    print(f"1 blk + tri/px iotas:    {timeit(jax.jit(lambda: fw())): 6.2f} ms")

    # 6. with a while_loop that runs 0 iterations + scalar prefetch reads
    def kwl(s_ref, o):
        t = pl.program_id(0)
        start = s_ref[t]

        def cond(c):
            return c < start

        def body(c):
            return c + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
        o[0] = jnp.ones((N, 1), jnp.float32)

    import numpy as np
    zs = jnp.zeros((T,), jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T,), in_specs=[], out_specs=blk(1),
    )
    fwl = pl.pallas_call(
        kwl, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    print(f"1 blk + 0-iter while:    {timeit(jax.jit(fwl), zs): 6.2f} ms")


if __name__ == "__main__":
    main()
