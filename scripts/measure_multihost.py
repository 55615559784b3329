#!/usr/bin/env python3
"""Measure (not assert) the host-axis scaling claim (VERDICT r4 #5).

Three measurements over the REAL 2-process jax.distributed (gloo) lane the
multi-host stack uses on CPU hosts:

  1. per-step wall time of a STEP-SHAPED compiled program — ~30 ms of
     local matmul compute (standing in for render fwd+bwd; Pallas cannot
     run non-interpreted on CPU) followed by the data-parallel grad psum,
     the production step's exact collective pattern — at 2 processes vs
     the identical per-process workload on 1 process: the delta IS the
     cross-process overhead per step.
  2. the parameter-gradient allreduce alone: a jitted psum over a
     bench-shaped ~17 MB f32 gradient tree (65536×59 prim floats + 2 MB
     deform), timed across the 2-process mesh → effective allreduce GB/s.
  3. the same psum on 1 process (no-op baseline, isolates dispatch).

Writes MULTIHOST.json. Run with no args (spawns both ranks of itself).

Interpretation against the ≥80%-at-N≥2-hosts target: hosts map to the
'data' axis; per-step cross-host traffic is ONE grad allreduce. Projected
host-axis efficiency = t_step / (t_step + t_allreduce_17MB) for the real
34 ms TPU step — reported in the JSON alongside the raw gloo numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 12
GRAD_PRIM = (65536, 59)
GRAD_DEFORM = 500_000  # f32 count ≈ 2 MB


def rank_main(rank: int, nprocs: int, port: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        from fourdgs_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=rank,
        )
    import jax.numpy as jnp
    import numpy as np

    from fourdgs_tpu.parallel import multihost

    mesh = multihost.make_hybrid_mesh(nprocs, 1)
    rng = np.random.default_rng(7)  # same data every rank (replicated step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    tree = {
        "prim": rep(jnp.asarray(
            rng.standard_normal(GRAD_PRIM, dtype=np.float32)
        )),
        "deform": rep(jnp.asarray(
            rng.standard_normal(GRAD_DEFORM, dtype=np.float32)
        )),
    }
    tspec = jax.tree.map(lambda _: P(), tree)

    # -- a STEP-SHAPED program: ~30 ms of compiled local compute (matmul
    # chain standing in for render fwd+bwd; the Pallas kernels cannot run
    # non-interpreted on CPU) followed by the data-parallel grad psum —
    # the exact collective pattern of the production sharded step.
    W = rep(jnp.asarray(rng.standard_normal((2048, 2048), np.float32)))

    @jax.jit
    def steplike(w, t):
        def body(w, t):
            x = w
            for _ in range(6):
                x = jnp.tanh(x @ w * 1e-2)
            g = jax.tree.map(lambda v: v + x[0, 0] * 0, t)
            g = jax.tree.map(
                lambda v: jax.lax.psum(v, ("data", "model")), g
            )
            return x, g
        return shard_map(
            body, mesh=mesh, in_specs=(P(), tspec),
            out_specs=(P(), tspec),
        )(w, t)

    x, g = steplike(W, tree)
    _ = float(x.addressable_data(0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        x, g = steplike(x, g)
    _ = float(x.addressable_data(0).ravel()[0])
    step_ms = (time.perf_counter() - t0) / STEPS * 1e3
    loss = float(jax.tree.leaves(g)[0].addressable_data(0).ravel()[0])

    # -- the grad-tree allreduce ALONE (the only cross-host traffic)
    @jax.jit
    def allreduce(t):
        return shard_map(
            lambda tt: jax.tree.map(
                lambda v: jax.lax.psum(v, ("data", "model")), tt
            ),
            mesh=mesh, in_specs=(tspec,), out_specs=tspec,
        )(t)

    out = allreduce(tree)
    _ = float(jax.tree.leaves(out)[0].addressable_data(0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = allreduce(out)
    _ = float(jax.tree.leaves(out)[0].addressable_data(0).ravel()[0])
    psum_ms = (time.perf_counter() - t0) / STEPS * 1e3

    print(json.dumps({
        "rank": rank, "nprocs": nprocs, "loss": loss,
        "step_ms": round(step_ms, 2), "psum17MB_ms": round(psum_ms, 2),
    }), flush=True)


def main():
    if len(sys.argv) > 1:
        rank_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
        return

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, "..")

    def launch(nprocs, port):
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 str(r), str(nprocs), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=root,
            )
            for r in range(nprocs)
        ]
        outs = []
        for p in procs:
            so, se = p.communicate(timeout=1200)
            assert p.returncode == 0, se[-2000:]
            outs.append(json.loads(
                [l for l in so.splitlines() if l.startswith("{")][-1]
            ))
        return outs

    r1 = launch(1, 29611)
    r2 = launch(2, 29613)

    import os as _os

    grad_mb = (GRAD_PRIM[0] * GRAD_PRIM[1] + GRAD_DEFORM) * 4 / 1e6
    step1 = r1[0]["step_ms"]
    step2 = max(o["step_ms"] for o in r2)
    psum2 = max(o["psum17MB_ms"] for o in r2)
    ncpu = _os.cpu_count() or 1
    # effective one-direction allreduce rate: ring moves 2·(N-1)/N·bytes
    gloo_gbps = 2 * (grad_mb / 1e3) / (psum2 / 1e3) / 2
    tpu_step_ms = 30.0  # bench.py wall at HEAD; see BENCH_r05.json
    dcn_gbps = 25.0     # nominal per-host DCN
    psum_dcn_ms = grad_mb / 1e3 / dcn_gbps * 1e3
    result = {
        "grad_tree_mb": round(grad_mb, 1),
        "host_cpus": ncpu,
        "single_process": r1,
        "two_process": r2,
        "step_ms_1p": step1,
        "step_ms_2p_worst": step2,
        "cross_process_overhead_ms": round(step2 - step1, 2),
        "step_note": (
            f"this host has {ncpu} CPUs: two ranks OVERSUBSCRIBE the local "
            "compute, so the 1p→2p step delta is dominated by core "
            "contention, not collectives — a floor, not a projection. On "
            "real multi-host TPU pods each host has its own chips."
        ),
        "psum17MB_ms_2p_gloo": psum2,
        "gloo_allreduce_gbps": round(gloo_gbps, 2),
        # the ≥80%-at-N≥2-hosts target: per-step cross-host traffic is ONE
        # grad allreduce. Projection vs the measured TPU step at (a) this
        # gloo-loopback rate (pessimistic floor) and (b) nominal 25 GB/s
        # DCN (the production transport).
        "tpu_step_ms_assumed": tpu_step_ms,
        "projected_host_axis_efficiency_at_gloo_rate": round(
            tpu_step_ms / (tpu_step_ms + psum2), 3
        ),
        "psum17MB_ms_at_25GBps_dcn": round(psum_dcn_ms, 2),
        "projected_host_axis_efficiency_at_dcn_rate": round(
            tpu_step_ms / (tpu_step_ms + psum_dcn_ms), 3
        ),
        "losses_match": len({round(o["loss"], 6) for o in r2}) == 1,
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(root, "MULTIHOST.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("wrote MULTIHOST.json")


if __name__ == "__main__":
    main()
