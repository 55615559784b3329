"""Experiment: bilinear plane sampling via ONE windowed (2,2,F) gather.

The trace shows the hexplane spatial backward as 24 separate scatter-adds
(~0.46 ms each, cost per update ROW, not per element). If the 4 corner
gathers collapse into one (2,2,F)-window gather from a padded plane, XLA's
AD gives one windowed scatter per plane — 6 scatters instead of 24.
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

    N = 65_536
    F = 32
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))

    for R in (64, 128):
        plane = jnp.asarray(
            rng.standard_normal((R, R, F)).astype(np.float32)
        )

        def current(p, uu, vv):
            from fourdgs_tpu.models.hexplane import _bilinear_plane
            return jnp.sum(_bilinear_plane(p, uu, vv) ** 2)

        def windowed(p, uu, vv):
            Ra, Rb, _ = p.shape
            x = jnp.clip((uu + 1.0) * 0.5 * (Ra - 1), 0.0, Ra - 1)
            y = jnp.clip((vv + 1.0) * 0.5 * (Rb - 1), 0.0, Rb - 1)
            x0 = jnp.clip(jnp.floor(x), 0, Ra - 1).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor(y), 0, Rb - 1).astype(jnp.int32)
            wx = x - x0.astype(x.dtype)
            wy = y - y0.astype(y.dtype)
            pad = jnp.pad(p, ((0, 1), (0, 1), (0, 0)))
            # one gather of a (2,2,F) window per point
            corners = pad[x0[:, None], y0[:, None], :]  # probe simple adv idx
            del corners
            starts = jnp.stack([x0, y0], axis=-1)
            win = jax.lax.gather(
                pad, starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3),
                    collapsed_slice_dims=(),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(2, 2, F),
            )  # [N, 2, 2, F]
            w = jnp.stack(
                [(1 - wx) * (1 - wy), (1 - wx) * wy, wx * (1 - wy), wx * wy],
                axis=-1,
            ).reshape(N, 2, 2)[..., None]
            # weight layout: [x0y0, x0y1, x1y0, x1y1] reshaped to (2,2)
            w = jnp.stack([
                jnp.stack([(1 - wx) * (1 - wy), (1 - wx) * wy], axis=-1),
                jnp.stack([wx * (1 - wy), wx * wy], axis=-1),
            ], axis=1)[..., None]
            out = jnp.sum(win * w, axis=(1, 2))
            return jnp.sum(out ** 2)

        # correctness
        a = jax.jit(current)(plane, u, v)
        b = jax.jit(windowed)(plane, u, v)
        print(f"R={R} val current {float(a):.4f} windowed {float(b):.4f}")

        fc = jax.jit(lambda p: current(p, u, v))
        fw = jax.jit(lambda p: windowed(p, u, v))
        print(f"R={R} fwd  current: {timeit(fc, plane):6.2f} ms  "
              f"windowed: {timeit(fw, plane):6.2f} ms")
        gc = jax.jit(jax.grad(lambda p: current(p, u, v)))
        gw = jax.jit(jax.grad(lambda p: windowed(p, u, v)))
        ga = gc(plane); gb = gw(plane)
        err = float(jnp.abs(ga - gb).max())
        print(f"R={R} grad maxerr {err:.2e}")
        print(f"R={R} bwd  current: {timeit(gc, plane):6.2f} ms  "
              f"windowed: {timeit(gw, plane):6.2f} ms")


if __name__ == "__main__":
    main()
