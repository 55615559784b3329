#!/usr/bin/env python3
"""Multi-process (2-host simulation) smoke test of the multihost stack.

Run as one rank of a 2-process CPU 'pod':

    python scripts/multihost_smoke.py <rank> [coordinator_port]

Each process: jax.distributed bring-up (gloo collectives) →
make_hybrid_mesh(data=2, model=1) over the 2 global devices →
process-local batch slice + host_local_batch assembly → ONE step of the
production sharded trainer (fourdgs_tpu.parallel.trainer, Pallas interpret
on CPU) → prints "RANK <r> OK loss=<v>". Both ranks must print identical
losses (the step is replicated-deterministic).

tests/test_parallel.py::TestMultiProcess launches both ranks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    rank = int(sys.argv[1])
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 29517

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fourdgs_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from fourdgs_tpu.parallel import trainer
    from fourdgs_tpu.render import CameraArrays
    from fourdgs_tpu.train import adam

    mesh = multihost.make_hybrid_mesh(2, 1)

    cfg = ge._tiny_cfg(capacity=256)
    cfg.opt.lambda_dssim = 0.0  # single model shard → no row gather needed
    state = ge._tiny_scene(cfg, n_points=128)
    adam_state = adam.init(state.params)
    state = trainer.replicate(mesh, state)
    adam_state = trainer.replicate(mesh, adam_state)

    size = 32
    global_batch = 2
    sl = multihost.local_batch_slice(global_batch, mesh)
    assert sl == slice(rank, rank + 1), sl

    # each process materializes ONLY its own cameras/images
    cams_local = [
        CameraArrays.from_camera(ge._camera(time=i / 2, size=size))
        for i in range(global_batch)
    ][sl]
    cams_local = jax.tree.map(lambda *xs: jnp.stack(xs), *cams_local)
    rng = np.random.default_rng(7 + rank)
    gts_local = rng.uniform(0, 1, (sl.stop - sl.start, 3, size, size)).astype(
        np.float32
    )
    cams, gts = multihost.host_local_batch(mesh, cams_local, gts_local)

    step = trainer.make_sharded_train_step(
        cfg, mesh, size, size, "fine", active_sh_degree=1, interpret=True
    )
    new_params, new_adam, new_state, metrics = step(
        state.params, adam_state, state, cams, gts, 1
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    delta = float(jnp.abs(
        new_params["xyz"].addressable_data(0)
        - state.params["xyz"].addressable_data(0)
    ).max())
    assert delta > 0.0
    print(f"RANK {rank} OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
