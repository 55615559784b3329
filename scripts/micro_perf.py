"""Micro-benchmarks for rasterizer data-movement candidates on the live chip.

Times the individual XLA ops that the profile shows dominating the step
(sort, gather, transpose, scatter) at several budgets, plus candidate
replacements (axis-1 gather, permutation-gather + contiguous segment-sum).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _sync(out):
    """True host sync: block_until_ready is a no-op on the remote-attached
    backend, so fetch one element of every output buffer."""
    import jax

    for leaf in jax.tree.leaves(out):
        _ = leaf.ravel()[0].item() if hasattr(leaf, "ravel") else leaf


def timeit(fn, *args, iters=20, warmup=2):
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

    rng = np.random.default_rng(0)
    P = 65_536
    for K in (1 << 19, 320 * 1024, 1 << 18):
        print(f"--- K = {K} ---")
        keys = jnp.asarray(rng.integers(0, 2500, K, dtype=np.int32))
        pay = jnp.asarray(rng.integers(0, K, K, dtype=np.int32))
        srt = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                                is_stable=True))
        print(f"sort (i32 key + i32 payload): {timeit(srt, keys, pay):7.2f} ms")

        # candidate: pack (tile << slot_bits | slot) into ONE int32 key,
        # sort payload-free (stability implied by the slot bits), then
        # unpack + one K-gather to recover gauss_id
        slot_bits = int(np.ceil(np.log2(K)))
        packed = (keys.astype(jnp.int32) << slot_bits) | jnp.arange(
            K, dtype=jnp.int32
        )
        gid_slot_tbl = jnp.asarray(rng.integers(0, P, K, dtype=np.int32))

        def packed_sort(pk, gs):
            s = jax.lax.sort(pk, is_stable=False)
            slot = s & ((1 << slot_bits) - 1)
            return s >> slot_bits, jnp.take(gs, slot)
        ps = jax.jit(packed_sort)
        print(f"packed 1-key sort + unpack:   "
              f"{timeit(ps, packed, gid_slot_tbl):7.2f} ms")

        gid = jnp.asarray(rng.integers(0, P, K, dtype=np.int32))
        table = jnp.asarray(rng.uniform(0, 1, (P, 16)).astype(np.float32))
        g_row = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        print(f"row gather  [K,16]<-[P,16]:   {timeit(g_row, table, gid):7.2f} ms")
        g_rowT = jax.jit(lambda t, i: jnp.take(t, i, axis=0).T)
        print(f"row gather + transpose:       {timeit(g_rowT, table, gid):7.2f} ms")
        tableT = table.T
        g_lane = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        print(f"lane gather [16,K]<-[16,P]:   {timeit(g_lane, tableT, gid):7.2f} ms")

        rows = jnp.asarray(rng.uniform(0, 1, (K, 16)).astype(np.float32))
        sc = jax.jit(lambda r, i: jnp.zeros((P, 16)).at[i].add(r))
        print(f"scatter-add [P,16]<-[K,16]:   {timeit(sc, rows, gid):7.2f} ms")

        # permutation-gather + contiguous segment-sum alternative:
        # invert a permutation, gather rows into segment order, diff-of-cumsum
        perm = jnp.asarray(rng.permutation(K).astype(np.int32))
        def seg_reduce(r, inv, starts, stops):
            ordered = jnp.take(r, inv, axis=0)
            cs = jnp.cumsum(ordered, axis=0)
            csz = jnp.concatenate([jnp.zeros((1, 16)), cs], axis=0)
            return jnp.take(csz, stops, axis=0) - jnp.take(csz, starts, axis=0)
        bounds = jnp.sort(jnp.asarray(
            rng.integers(0, K, P + 1, dtype=np.int32)))
        starts_, stops_ = bounds[:-1], bounds[1:]
        segf = jax.jit(seg_reduce)
        print(f"perm-gather+cumsum segsum:    "
              f"{timeit(segf, rows, perm, starts_, stops_):7.2f} ms")

        tr = jax.jit(lambda x: x.T + 0.0)
        big = jnp.asarray(rng.uniform(0, 1, (16, K)).astype(np.float32))
        print(f"transpose [16,K]->[K,16]:     {timeit(tr, big):7.2f} ms")

        segsum = jax.jit(lambda r, i: jax.ops.segment_sum(r, i, num_segments=P))
        sorted_gid = jnp.sort(gid)
        print(f"segment_sum sorted ids:       {timeit(segsum, rows, sorted_gid):7.2f} ms")


if __name__ == "__main__":
    main()
