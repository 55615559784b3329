"""Multi-host (multi-process) mesh construction and runtime initialization.

The reference has no distributed backend at all (SURVEY.md §5.8: no
torch.distributed / NCCL / MPI anywhere; "multi-GPU" is independent
processes per scene, scripts/train_dnerf.sh). This module is the TPU-native
capability the build adds on top: one SPMD program over all hosts of a pod
slice, with

  - ``initialize()``       — jax.distributed runtime bring-up (one call per
                             process, before any other JAX API touches
                             devices);
  - ``make_hybrid_mesh()`` — a ('data','model') mesh laid out so the 'model'
                             (tile-slab) axis stays INSIDE each host's ICI
                             domain and the 'data' axis spans hosts over DCN.
                             The row all-gather and the per-step grad psum of
                             fourdgs_tpu.parallel.trainer then ride ICI; DCN
                             only carries the 'data'-axis portion of the
                             parameter-gradient psum, once per step;
  - ``local_batch_slice()``— which cameras of the global batch this process
                             must materialize (process-local data loading:
                             each host decodes only its own shard), and
  - ``host_local_batch()`` — assembling a globally-sharded device batch from
                             per-host arrays via
                             jax.make_array_from_process_local_data.

Single-process fallback: every function degrades to the single-host
behavior when jax.process_count() == 1, so the same trainer code serves
`python train.py --mesh data=2,model=4` on one host and
`N×(python train.py --mesh ... --distributed)` on a multi-host slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the cross-host runtime (idempotent).

    On TPU pods the three arguments are discovered from the metadata
    server and may be omitted; on CPU/GPU test rigs pass them explicitly
    (e.g. coordinator_address="127.0.0.1:1234", num_processes=2,
    process_id=<rank>). Must run before any computation touches devices.
    """
    global _initialized
    if _initialized:
        return
    # CPU test rigs: cross-process collectives ride gloo. Checked via the
    # config string, NOT jax.default_backend() — that would initialize the
    # backend, which must not happen before jax.distributed.initialize.
    if "cpu" in (jax.config.jax_platforms or ""):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        # no-arg form autodiscovers on TPU pods (metadata server); explicit
        # args serve CPU/GPU rigs. Never touch jax.default_backend() here —
        # backend initialization must come after distributed bring-up.
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except (RuntimeError, ValueError) as e:
        if kwargs:
            raise  # explicit multi-process request must not fail silently
        print(f"jax.distributed.initialize skipped (single-process): {e}")


_initialized = False


def make_hybrid_mesh(n_data: int, n_model: int) -> Mesh:
    """A ('data','model') mesh over ALL processes' devices.

    Layout rule (the scaling-book recipe): the axis with per-step
    all-gathers ('model' — tile-row slabs exchange color rows for SSIM)
    must be contiguous within a host's ICI domain; 'data' (one psum per
    step) may span DCN. With L local devices per process and H processes:

      - n_model must divide L (slabs never straddle hosts);
      - n_data * n_model must equal H * L (every device used).

    Single-process (H == 1) degrades to parallel.mesh.make_mesh.
    """
    procs = jax.process_count()
    local = jax.local_device_count()
    total = procs * local
    if procs == 1:
        # single process: allow a subset of the local devices
        from fourdgs_tpu.parallel.mesh import make_mesh

        return make_mesh(n_data, n_model)
    if n_data * n_model != total:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {total} devices "
            f"({procs} processes x {local} local)"
        )
    if n_model > local or local % n_model != 0:
        raise ValueError(
            f"model axis {n_model} must divide the {local} local devices "
            "so tile slabs stay inside one host's ICI domain"
        )
    # jax.devices() is globally ordered by (process_index, local index):
    # reshaping [H*L] -> [n_data, n_model] with n_model | L keeps each
    # 'model' row inside one process.
    dev = np.asarray(jax.devices()).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """The slice of the global camera batch whose pixels land on THIS
    process — load/decode only these images host-side.

    The 'data' axis is laid out process-major (make_hybrid_mesh), so the
    global batch splits into contiguous per-process runs.
    """
    procs = jax.process_count()
    if procs == 1:
        return slice(0, global_batch)
    if global_batch % procs != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {procs} processes"
        )
    per = global_batch // procs
    r = jax.process_index()
    return slice(r * per, (r + 1) * per)


def host_local_batch(mesh: Mesh, local_cams, local_gts, spec_gts=None):
    """Assemble the globally-shaped, 'data'-sharded device batch from this
    process's local arrays (the slice from local_batch_slice).

    Single-process: equivalent to trainer.place_batch.
    """
    from fourdgs_tpu.parallel import trainer

    if jax.process_count() == 1:
        return trainer.place_batch(mesh, local_cams, local_gts)
    cam_sharding = NamedSharding(mesh, P("data"))
    if spec_gts is None:
        spec_gts = P("data", None, "model", None)
    gt_sharding = NamedSharding(mesh, spec_gts)
    cams = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            cam_sharding, np.asarray(x)
        ),
        local_cams,
    )
    # interleaved tile-row assignment (trainer.interleave_gt_rows): the
    # model axis is host-local in the hybrid mesh, so the permutation is
    # process-local too
    local_gts = np.asarray(
        trainer.interleave_gt_rows(
            jnp.asarray(local_gts), mesh.shape["model"]
        )
    )
    gts = jax.make_array_from_process_local_data(gt_sharding, local_gts)
    return cams, gts
