"""Experiment: bilinear plane sample via ONE row gather from a 4F-stacked,
corner-shifted table — 1 scatter row per point in the backward instead of 4.

Exactness: with border clamping, whenever a shifted corner would read past
the edge its bilinear weight is exactly 0 (x0 == Ra−1 ⇒ wx == 0), so
zero-padding the shifted copies changes nothing.
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

    from fourdgs_tpu.models.hexplane import _bilinear_plane

    N = 65_536
    F = 32
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))

    def stacked_sample(p, uu, vv):
        Ra, Rb, Fc = p.shape
        x = jnp.clip((uu + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
        y = jnp.clip((vv + 1.0) * 0.5 * (Rb - 1), 0.0, Rb - 1)
        x0 = jnp.clip(jnp.floor(x), 0, Ra - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(y), 0, Rb - 1).astype(jnp.int32)
        wx = (x - x0.astype(x.dtype))[:, None]
        wy = (y - y0.astype(y.dtype))[:, None]
        sb = jnp.pad(p[:, 1:, :], ((0, 0), (0, 1), (0, 0)))      # b+1
        sa = jnp.pad(p[1:, :, :], ((0, 1), (0, 0), (0, 0)))      # a+1
        sab = jnp.pad(p[1:, 1:, :], ((0, 1), (0, 1), (0, 0)))    # a+1,b+1
        stacked = jnp.concatenate([p, sb, sa, sab], axis=-1).reshape(
            Ra * Rb, 4 * Fc
        )
        rows = jnp.take(stacked, x0 * Rb + y0, axis=0)           # [N, 4F]
        return (
            rows[:, :Fc] * (1 - wx) * (1 - wy)
            + rows[:, Fc:2 * Fc] * (1 - wx) * wy
            + rows[:, 2 * Fc:3 * Fc] * wx * (1 - wy)
            + rows[:, 3 * Fc:] * wx * wy
        )

    for R in (64, 128):
        plane = jnp.asarray(rng.standard_normal((R, R, F)).astype(np.float32))

        fc = jax.jit(lambda p: jnp.sum(_bilinear_plane(p, u, v) ** 2))
        fs = jax.jit(lambda p: jnp.sum(stacked_sample(p, u, v) ** 2))
        a, b = fc(plane), fs(plane)
        print(f"R={R} val cur {float(a):.3f} stk {float(b):.3f}")
        print(f"R={R} fwd  cur: {timeit(fc, plane):5.2f} ms   "
              f"stk: {timeit(fs, plane):5.2f} ms")
        gc = jax.jit(jax.grad(lambda p: jnp.sum(_bilinear_plane(p, u, v) ** 2)))
        gs = jax.jit(jax.grad(lambda p: jnp.sum(stacked_sample(p, u, v) ** 2)))
        err = float(jnp.abs(gc(plane) - gs(plane)).max())
        print(f"R={R} grad maxerr {err:.2e}")
        print(f"R={R} bwd  cur: {timeit(gc, plane):5.2f} ms   "
              f"stk: {timeit(gs, plane):5.2f} ms")

    # u/v gradient parity too (feeds xyz)
    plane = jnp.asarray(rng.standard_normal((64, 64, F)).astype(np.float32))
    gu_c = jax.jit(jax.grad(lambda uu: jnp.sum(_bilinear_plane(plane, uu, v) ** 2)))
    gu_s = jax.jit(jax.grad(lambda uu: jnp.sum(stacked_sample(plane, uu, v) ** 2)))
    err = float(jnp.abs(gu_c(u) - gu_s(u)).max())
    rel = err / float(jnp.abs(gu_c(u)).max())
    print(f"du maxerr {err:.2e} (rel {rel:.2e})")
    print(f"du bwd cur: {timeit(gu_c, u):5.2f} ms  stk: {timeit(gu_s, u):5.2f} ms")


if __name__ == "__main__":
    main()
