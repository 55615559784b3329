#!/usr/bin/env python3
"""Experiment: hexplane spatial-plane sampling cost + candidate replacements.

Isolated numbers carry the ~1 ms dispatch floor; compare deltas, not
absolutes. N=65536, scales (64, 128), F=32 — the bench workload shape.
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

    from fourdgs_tpu.models import hexplane as hp

    N = 65536
    F = 32
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
    aabb = jnp.asarray(np.array([[1.2, 1.2, 1.2], [-1.2, -1.2, -1.2]],
                                np.float32))
    t = jnp.float32(0.37)
    key = jax.random.key(0)
    from fourdgs_tpu.configs.core import KPlanesConfig
    kcfg = KPlanesConfig()
    params = hp.init_hexplane(key, kcfg, (1, 2))

    # 0) full query fwd / fwd+bwd (the production entry)
    def qloss(params, xyz):
        f = hp.query_hexplane(params, aabb, xyz, t, 2)
        return jnp.sum(f * f)

    print(f"full query fwd: {timeit(jax.jit(qloss), params, xyz):.3f} ms")
    g = jax.jit(jax.grad(qloss, argnums=(0, 1)))
    print(f"full query fwd+bwd: {timeit(g, params, xyz):.3f} ms")

    # 1) ONLY the 6 spatial gathers (dummy product to one scalar)
    def spatial_only(params, xyz):
        xyzn = hp.normalize_aabb(xyz, aabb)
        tot = 0.0
        for s in range(2):
            for p, comb in enumerate(hp.COO_COMBS):
                if comb[1] == 3:
                    continue
                v = hp._bilinear_plane(
                    params[f"grid_s{s}_p{p}"], xyzn[:, comb[0]],
                    xyzn[:, comb[1]],
                )
                tot = tot + jnp.sum(v * v)
        return tot

    print(f"6 spatial planes fwd: "
          f"{timeit(jax.jit(spatial_only), params, xyz):.3f} ms")
    g1 = jax.jit(jax.grad(spatial_only, argnums=(0, 1)))
    print(f"6 spatial planes fwd+bwd: {timeit(g1, params, xyz):.3f} ms")

    # 2) ONLY the 6 temporal tslice matmuls
    def temporal_only(params, xyz):
        xyzn = hp.normalize_aabb(xyz, aabb)
        tot = 0.0
        for s in range(2):
            for p, comb in enumerate(hp.COO_COMBS):
                if comb[1] != 3:
                    continue
                v = hp._bilinear_tslice(
                    params[f"grid_s{s}_p{p}"], xyzn[:, comb[0]], t
                )
                tot = tot + jnp.sum(v * v)
        return tot

    print(f"6 temporal tslice fwd: "
          f"{timeit(jax.jit(temporal_only), params, xyz):.3f} ms")
    g2 = jax.jit(jax.grad(temporal_only, argnums=(0, 1)))
    print(f"6 temporal tslice fwd+bwd: {timeit(g2, params, xyz):.3f} ms")

    # 3) spatial gathers with a bf16 stacked table (half row bytes)
    def spatial_bf16(params, xyz):
        xyzn = hp.normalize_aabb(xyz, aabb)
        tot = 0.0
        for s in range(2):
            for p, comb in enumerate(hp.COO_COMBS):
                if comb[1] == 3:
                    continue
                plane = params[f"grid_s{s}_p{p}"]
                Ra, Rb, F_ = plane.shape
                u = xyzn[:, comb[0]]
                v_ = xyzn[:, comb[1]]
                x = jnp.clip((u + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
                y = jnp.clip((v_ + 1.0) * 0.5 * (Rb - 1), 0.0, Rb - 1)
                x0 = jnp.clip(jnp.floor(x), 0, Ra - 1).astype(jnp.int32)
                y0 = jnp.clip(jnp.floor(y), 0, Rb - 1).astype(jnp.int32)
                wx = ((x - x0.astype(x.dtype))
                      * (x0 < Ra - 1).astype(x.dtype))[:, None]
                wy = ((y - y0.astype(y.dtype))
                      * (y0 < Rb - 1).astype(y.dtype))[:, None]
                sb = jnp.pad(plane[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
                sa = jnp.pad(plane[1:, :, :], ((0, 1), (0, 0), (0, 0)))
                sab = jnp.pad(plane[1:, 1:, :], ((0, 1), (0, 1), (0, 0)))
                stacked = jnp.concatenate(
                    [plane, sb, sa, sab], axis=-1
                ).reshape(Ra * Rb, 4 * F_).astype(jnp.bfloat16)
                rows = jnp.take(stacked, x0 * Rb + y0, axis=0).astype(
                    jnp.float32
                )
                out = (rows[:, :F_] * (1 - wx) * (1 - wy)
                       + rows[:, F_:2 * F_] * (1 - wx) * wy
                       + rows[:, 2 * F_:3 * F_] * wx * (1 - wy)
                       + rows[:, 3 * F_:] * wx * wy)
                tot = tot + jnp.sum(out * out)
        return tot

    print(f"6 spatial bf16-table fwd: "
          f"{timeit(jax.jit(spatial_bf16), params, xyz):.3f} ms")
    g3 = jax.jit(jax.grad(spatial_bf16, argnums=(0, 1)))
    print(f"6 spatial bf16-table fwd+bwd: {timeit(g3, params, xyz):.3f} ms")

    # 4) ONE fused gather across all 6 spatial planes (concat tables + offset
    # indices): tests per-op overhead vs per-row cost
    def spatial_fused(params, xyz):
        xyzn = hp.normalize_aabb(xyz, aabb)
        tables = []
        idxs = []
        wxs = []
        wys = []
        off = 0
        for s in range(2):
            for p, comb in enumerate(hp.COO_COMBS):
                if comb[1] == 3:
                    continue
                plane = params[f"grid_s{s}_p{p}"]
                Ra, Rb, F_ = plane.shape
                u = xyzn[:, comb[0]]
                v_ = xyzn[:, comb[1]]
                x = jnp.clip((u + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
                y = jnp.clip((v_ + 1.0) * 0.5 * (Rb - 1), 0.0, Rb - 1)
                x0 = jnp.clip(jnp.floor(x), 0, Ra - 1).astype(jnp.int32)
                y0 = jnp.clip(jnp.floor(y), 0, Rb - 1).astype(jnp.int32)
                wxs.append(((x - x0.astype(x.dtype))
                            * (x0 < Ra - 1).astype(x.dtype))[:, None])
                wys.append(((y - y0.astype(y.dtype))
                            * (y0 < Rb - 1).astype(y.dtype))[:, None])
                sb = jnp.pad(plane[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
                sa = jnp.pad(plane[1:, :, :], ((0, 1), (0, 0), (0, 0)))
                sab = jnp.pad(plane[1:, 1:, :], ((0, 1), (0, 1), (0, 0)))
                tables.append(jnp.concatenate(
                    [plane, sb, sa, sab], axis=-1
                ).reshape(Ra * Rb, 4 * F_))
                idxs.append(off + x0 * Rb + y0)
                off += Ra * Rb
        big = jnp.concatenate(tables, axis=0)          # [off, 4F]
        idx = jnp.concatenate(idxs)                    # [6N]
        rows = jnp.take(big, idx, axis=0)              # [6N, 4F]
        tot = 0.0
        for i in range(6):
            F_ = F
            r = rows[i * N:(i + 1) * N]
            wx, wy = wxs[i], wys[i]
            out = (r[:, :F_] * (1 - wx) * (1 - wy)
                   + r[:, F_:2 * F_] * (1 - wx) * wy
                   + r[:, 2 * F_:3 * F_] * wx * (1 - wy)
                   + r[:, 3 * F_:] * wx * wy)
            tot = tot + jnp.sum(out * out)
        return tot

    print(f"6 spatial ONE-gather fwd: "
          f"{timeit(jax.jit(spatial_fused), params, xyz):.3f} ms")
    g4 = jax.jit(jax.grad(spatial_fused, argnums=(0, 1)))
    print(f"6 spatial ONE-gather fwd+bwd: {timeit(g4, params, xyz):.3f} ms")


if __name__ == "__main__":
    main()
