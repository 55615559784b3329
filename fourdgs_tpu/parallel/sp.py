"""Tile-row-sharded rendering: the sequence/context-parallel analog for 4DGS.

SURVEY.md §2.7: the reference's only "length" scaling axis is its 16×16 tile
decomposition on one GPU. Here the tile grid itself is partitioned across the
mesh 'model' axis: each device owns a horizontal slab of tile rows and runs
the **entire local pipeline** — preprocess (replicated compute over P),
rect-clip to its slab, local binning/sort, local Pallas blend — with zero
cross-device traffic in the rasterizer. The only collectives in the sharded
training step are the parameter-gradient psums that shard_map's transpose
inserts for the replicated parameter inputs (riding ICI), plus the scalar
loss psum.

Combined with the 'data' axis (cameras of the micro-batch), this gives the
dp × sp mesh described in the survey's plan. Primitive ('model'-on-P)
sharding of preprocess is the planned third axis — preprocess is ~4% of the
step, so slab sharding carries the scaling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved across JAX versions
    from jax import shard_map as _shard_map_mod  # noqa: F401

    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops.rasterize import rasterize_pallas


def make_sp_render_loss(
    cfg: Config,
    mesh: Mesh,
    width: int,
    height: int,
    stage: str,
    active_sh_degree: int,
    interpret: bool = False,
):
    """Build loss(params, state, cams, gts) with rows sharded over 'model'
    and the camera batch sharded over 'data'.

    Requires height % (16 · model_axis) == 0 and batch % data_axis == 0
    (pad the batch / image rows to satisfy; standard resolutions do).
    """
    from fourdgs_tpu.models import deformation as deform_lib
    from fourdgs_tpu.models import gaussians as G

    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    grid_y = (height + C.TILE_Y - 1) // C.TILE_Y
    if grid_y % n_model != 0:
        raise ValueError(
            f"tile rows {grid_y} not divisible by model axis {n_model}"
        )
    rows_per = grid_y // n_model
    slab_h = rows_per * C.TILE_Y
    bg = jnp.array(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
    )

    def render_slab(params, state, cam, row_offset):
        xyz = params["xyz"]
        scaling = params["scaling"]
        rotation = params["rotation"]
        opacity = params["opacity"]
        shs = G.get_features(params)
        if stage == "fine":
            t = jnp.broadcast_to(cam.time, (xyz.shape[0],))
            xyz, scaling, rotation, opacity, shs = deform_lib.deform(
                params["deform"], cfg.hidden, state.aabb,
                xyz, scaling, rotation, opacity, shs, t,
            )
        scales_act = jnp.exp(scaling)
        if cfg.model.use_isotropic_gaussian:
            scales_act = jnp.repeat(scales_act[:, :1], 3, axis=1)
        rot_act = rotation / jnp.maximum(
            jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
        )
        out = rasterize_pallas(
            xyz, scales_act, rot_act, jax.nn.sigmoid(opacity), shs,
            cam.camera_center, cam.world_view, cam.full_proj,
            cam.tanfovx, cam.tanfovy, width, height,
            active_sh_degree, bg,
            instance_budget=cfg.tpu.instance_budget,
            alive=state.alive,
            interpret=interpret,
            tile_row_offset=row_offset,
            tile_rows=rows_per,
        )
        return out.color  # [3, slab_h, W]

    def shard_fn(params, state, cams, gts):
        # cams: local batch pytree [B_local,...]; gts: [B_local, 3, slab_h, W]
        row_offset = jax.lax.axis_index("model") * rows_per
        B_local = gts.shape[0]
        local_abs = 0.0
        for i in range(B_local):
            cam_i = jax.tree.map(lambda x: x[i], cams)
            color = render_slab(params, state, cam_i, row_offset)
            local_abs = local_abs + jnp.sum(
                jnp.abs(color[:, : gts.shape[2]] - gts[i])
            )
        total = jax.lax.psum(local_abs, ("data", "model"))
        n_px = 3 * height * width * B_local * n_data
        return total / n_px

    state_specs_cache = {}

    def loss_fn(params, state, cams, gts):
        from fourdgs_tpu.parallel.mesh import gaussian_param_spec, state_spec

        pspec = jax.tree.map(
            lambda _: P(), params,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        sspec = jax.tree.map(
            lambda _: P(), state,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        cam_spec = jax.tree.map(lambda _: P("data"), cams)
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(pspec, sspec, cam_spec, P("data", None, "model", None)),
            out_specs=P(),
            # pallas_call doesn't declare varying-mesh-axes metadata
            check_vma=False,
        )(params, state, cams, gts)

    return loss_fn
