"""3-nearest-neighbor mean squared distance (simple-knn / distCUDA2 equivalent).

The reference uses a CUDA Morton-code KNN (submodules/simple-knn/simple_knn.cu)
exactly once, to set initial log-scales from the local point density
(gaussian_model.py:148-149). On TPU an exact chunked O(P²) scan is simpler,
deterministic, and fast enough for the ≤40k-point init clouds the pipeline
uses (README.md:284 caps init at 40k): 40k² distance evaluations is ~10 GFLOP,
well under a millisecond-scale matmul on the MXU.

The pairwise distance is computed as a Gram matrix on the MXU
(‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b) rather than elementwise differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_sq_dist_3nn(points: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """For each point, the mean of squared distances to its 3 nearest others.

    Exact equivalent of ``simple_knn._C.distCUDA2`` (spatial.cu:15-26).
    ``points``: [P, 3] float32. Returns [P] float32.
    """
    P = points.shape[0]
    n_pad = (-P) % chunk
    q = jnp.pad(points, ((0, n_pad), (0, 0)))
    sq = jnp.sum(points * points, axis=-1)  # [P]
    sq_q = jnp.pad(sq, (0, n_pad), constant_values=jnp.inf)

    def one_chunk(args):
        qc, sqc, base = args
        # [chunk, P] squared distances via the MXU Gram trick
        d2 = sqc[:, None] + sq[None, :] - 2.0 * (qc @ points.T)
        # mask self-distance (exact index match survives padding)
        idx = base + jnp.arange(chunk)
        d2 = jnp.where(idx[:, None] == jnp.arange(P)[None, :], jnp.inf, d2)
        neg_top3, _ = jax.lax.top_k(-d2, 3)
        return jnp.mean(jnp.maximum(-neg_top3, 0.0), axis=-1)

    n_chunks = q.shape[0] // chunk
    out = jax.lax.map(
        one_chunk,
        (
            q.reshape(n_chunks, chunk, 3),
            sq_q.reshape(n_chunks, chunk),
            jnp.arange(n_chunks) * chunk,
        ),
    )
    return out.reshape(-1)[:P]
