"""Experiment: per-tile fixed overhead of the Pallas blend kernels.

Runs the forward/backward kernels on (a) an all-empty tile grid and (b) the
bench-scale instance distribution, separating per-tile fixed cost from
per-chunk compute. Informs whether tile-pairing / ring-deepening is worth it.
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

    from fourdgs_tpu.ops import pallas_blend as PB

    T, gx = 2500, 50
    K = 384 * 1024
    rng = np.random.default_rng(0)
    feat = np.zeros((16, K), np.float32)
    feat[0] = rng.uniform(0, 800, K)
    feat[1] = rng.uniform(0, 800, K)
    feat[2] = rng.uniform(0.01, 0.3, K)
    feat[4] = rng.uniform(0.01, 0.3, K)
    feat[5] = rng.uniform(0.3, 0.9, K)
    feat[6:10] = rng.uniform(0, 1, (4, K))
    jfeat = jnp.asarray(feat)
    row = jnp.asarray([0, 1], np.int32)
    bg = jnp.zeros(3)

    def run(starts, stops, label):
        s = jnp.asarray(starts)
        e = jnp.asarray(stops)
        f = jax.jit(lambda ff: PB.blend_pallas(ff, s, e, row, bg, gx, T, K))
        t_f = timeit(f, jfeat)

        def loss(ff):
            col, dep, _ = PB.blend_pallas(ff, s, e, row, bg, gx, T, K)
            return jnp.sum(col)
        g = jax.jit(jax.grad(loss))
        t_b = timeit(g, jfeat)
        n_inst = int((stops - starts).sum())
        print(f"{label:28s} fwd {t_f:6.2f} ms  fwd+bwd {t_b:6.2f} ms  "
              f"({n_inst} inst)")

    # all tiles empty
    z = np.zeros(T, np.int32)
    run(z, z, "empty (pure per-tile cost)")

    # uniform ~98 instances per tile (bench-like)
    lens = np.full(T, 98, np.int32)
    stops = np.cumsum(lens).astype(np.int32)
    starts = (stops - lens).astype(np.int32)
    run(starts, stops, "uniform 98/tile")

    # uniform 256/tile (2 chunks)
    lens = np.full(T, 128, np.int32)
    stops = np.cumsum(lens).astype(np.int32)
    starts = (stops - lens).astype(np.int32)
    run(starts, stops, "uniform 128/tile")


if __name__ == "__main__":
    main()
