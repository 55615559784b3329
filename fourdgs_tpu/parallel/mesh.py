"""Multi-chip sharding: mesh construction + sharded training step.

The reference is single-GPU, single-process (SURVEY.md §2.7 — its only
"multi-GPU" is shell scripts pinning independent scenes to devices). The
TPU-native design replaces that with SPMD over a ``jax.sharding.Mesh``:

  axes ('data', 'model'):
    data  — the per-step camera batch (the reference's sequential Python
            micro-batch, train.py:197-209, becomes a sharded vmap; parameter
            gradients all-reduce over ICI automatically)
    model — the [P, ...] Gaussian primitive tensors and their Adam moments
            (the 4DGS analog of tensor parallelism; densification stats and
            free-list scatters stay local to each shard)

HexPlane/MLP parameters are replicated (a few MB; their gradients psum over
both axes). Partitioning is expressed through jit shardings — XLA GSPMD
inserts the collectives; the binning sort's cross-shard exchange is an
all-gather today (a Pallas ring variant is the planned optimization, see
SURVEY.md §7 hard parts: "sort at scale").
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fourdgs_tpu.configs.core import Config


def make_mesh(n_data: int = 1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def gaussian_param_spec(params: dict[str, Any]) -> dict[str, Any]:
    """PartitionSpecs: primitive [P,...] leaves sharded on 'model', the
    deformation net replicated."""
    spec: dict[str, Any] = {}
    for k, v in params.items():
        if k == "deform":
            spec[k] = jax.tree.map(lambda _: P(), v)
        else:
            spec[k] = P("model")
    return spec


def state_spec(state) -> Any:
    """Spec for the full GaussianState pytree ([P] stats on 'model')."""
    from fourdgs_tpu.models.gaussians import GaussianState

    return GaussianState(
        params=gaussian_param_spec(state.params),
        alive=P("model"),
        max_radii2d=P("model"),
        xyz_gradient_accum=P("model"),
        denom=P("model"),
        deformation_accum=P("model"),
        deformation_table=P("model"),
        aabb=P(),
        active_sh_degree=P(),
        spatial_lr_scale=None,
    )


def adam_spec(adam_state, param_spec) -> Any:
    from fourdgs_tpu.train.adam import AdamState

    return AdamState(mu=param_spec, nu=param_spec, count=P())


def shard_state(mesh: Mesh, state, adam_state):
    """Place state + optimizer on the mesh with the canonical shardings."""
    def to_sharding(spec_tree, value_tree):
        return jax.tree.map(
            lambda v, s: jax.device_put(
                v, NamedSharding(mesh, s if s is not None else P())
            ) if isinstance(v, jnp.ndarray) else v,
            value_tree, spec_tree,
            is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
        )

    sspec = state_spec(state)
    pspec = gaussian_param_spec(state.params)
    new_state = to_sharding(sspec, state)
    new_adam = to_sharding(adam_spec(adam_state, pspec), adam_state)
    return new_state, new_adam


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    width: int,
    height: int,
    stage: str,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
):
    """The single-chip train step wrapped with mesh shardings.

    Camera batch sharded over 'data' (batch size must divide by the data
    axis), primitive tensors over 'model'; gradient all-reduce and the
    binning exchange are inserted by GSPMD.
    """
    from fourdgs_tpu.render import CameraArrays
    from fourdgs_tpu.train.loop import make_train_step

    # Input placement (shard_state + shard_batch) carries the partitioning;
    # jit propagates operand shardings under GSPMD and inserts collectives.
    return make_train_step(
        cfg, width, height, stage, active_sh_degree, spatial_lr_scale
    )


def shard_batch(mesh: Mesh, batch_cams, gts):
    """Place a camera batch on the 'data' axis."""
    data_sharding = NamedSharding(mesh, P("data"))
    cams = jax.tree.map(lambda x: jax.device_put(x, data_sharding), batch_cams)
    return cams, jax.device_put(gts, data_sharding)
