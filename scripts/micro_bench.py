"""Micro-benchmarks for the binning/gather/scatter primitives on the live chip.

Compares lowering strategies for the three data-movement stages that dominate
the train step (scripts/profile_step.py): the instance sort, the payload row
gather, and the gradient segment reduction.
"""

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, iters=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    P = 65_536
    K = 1 << 19
    T = 2500
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, P, K), jnp.int32)
    tile = jnp.asarray(np.sort(rng.integers(0, T + 1, K)), jnp.int32)
    tile_u = jnp.asarray(rng.integers(0, T + 1, K), jnp.int32)
    rank = jnp.asarray(rng.integers(0, P, K), jnp.int32)
    table = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
    drows = jnp.asarray(rng.normal(size=(K, 16)), jnp.float32)

    # --- sort variants ---
    s_a = jax.jit(lambda t, r: jax.lax.sort((t, r), num_keys=1, is_stable=True))
    print(f"sort (key,payload):   {timeit(s_a, tile_u, rank):8.2f} ms")

    def packed(t, k):
        key = (t << 19) | k
        s = jax.lax.sort(key, is_stable=False)
        return s >> 19, s & (K - 1)
    s_b = jax.jit(packed)
    k_iota = jnp.arange(K, dtype=jnp.int32)
    print(f"sort packed int32:    {timeit(s_b, tile_u, k_iota):8.2f} ms")

    # --- gather variants ---
    g_a = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"gather [P,16] f32:    {timeit(g_a, table, gid):8.2f} ms")
    table_bf = table.astype(jnp.bfloat16)
    print(f"gather [P,16] bf16:   {timeit(g_a, table_bf, gid):8.2f} ms")
    table128 = jnp.tile(table, (1, 8))
    print(f"gather [P,128] f32:   {timeit(g_a, table128, gid):8.2f} ms")
    table8 = table[:, :8]
    print(f"gather [P,8] f32:     {timeit(g_a, table8, gid):8.2f} ms")

    def g_cols(t, i):
        return jnp.stack([jnp.take(t[:, c], i) for c in range(16)])
    g_c = jax.jit(g_cols)
    print(f"gather 16x 1-D:       {timeit(g_c, table, gid):8.2f} ms")

    def g_T(t, i):
        return jnp.take(t.T, i, axis=1)
    print(f"gather transposed:    {timeit(jax.jit(g_T), table, gid):8.2f} ms")

    # --- scatter/segment-sum variants ---
    sc_a = jax.jit(lambda d, i: jnp.zeros((P, 16)).at[i].add(d))
    print(f"scatter-add dup idx:  {timeit(sc_a, drows, gid):8.2f} ms")

    uniq = jnp.asarray(rng.permutation(K), jnp.int32)
    sc_b = jax.jit(lambda d, i: jnp.zeros((K, 16)).at[i].set(
        d, unique_indices=True, mode="drop"))
    print(f"scatter-set uniq idx: {timeit(sc_b, drows, uniq):8.2f} ms")

    starts = jnp.asarray(np.sort(rng.integers(0, K, P)), jnp.int32)
    stops = jnp.minimum(starts + 8, K)

    def cumsum_diff(d, a, b):
        c = jnp.cumsum(d, axis=0)
        top = jnp.take(c, jnp.maximum(b - 1, 0), axis=0)
        bot = jnp.where((a > 0)[:, None], jnp.take(c, jnp.maximum(a - 1, 0), axis=0), 0.0)
        return jnp.where((b > a)[:, None], top - bot, 0.0)
    print(f"cumsum-diff segsum:   {timeit(jax.jit(cumsum_diff), drows, starts, stops):8.2f} ms")

    seg = jnp.asarray(np.sort(rng.integers(0, P, K)), jnp.int32)
    sg = jax.jit(lambda d, s: jax.ops.segment_sum(
        d, s, num_segments=P, indices_are_sorted=True))
    print(f"segment_sum sorted:   {timeit(sg, drows, seg):8.2f} ms")


if __name__ == "__main__":
    main()
