"""Render API: assemble rasterizer inputs, apply deformation, rasterize.

Equivalent of the reference render function (gaussian_renderer/__init__.py:18-138):

  - stage "coarse": rasterize the raw canonical parameters
  - stage "fine": warp raw parameters through the deformation network at the
    camera's timestamp, then rasterize
  - activations (exp / normalize / sigmoid) are applied **after** deformation
    (gaussian_renderer/__init__.py:97-99)
  - returns color/depth/alpha plus radii and the means2D gradient carrier for
    densification stats

All camera quantities arrive as arrays (one compiled program serves every
camera at a given resolution); width/height/sh_degree/stage are static.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.models import deformation as deform_lib
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models.gaussians import GaussianState
from fourdgs_tpu.ops.reference import rasterize_reference
from fourdgs_tpu.ops.tiled import rasterize_tiled


class CameraArrays(NamedTuple):
    """Traced camera data (stacks/shards along a batch axis as a pytree)."""

    world_view: jnp.ndarray     # [4,4]
    full_proj: jnp.ndarray      # [4,4]
    camera_center: jnp.ndarray  # [3]
    tanfovx: jnp.ndarray        # []
    tanfovy: jnp.ndarray        # []
    time: jnp.ndarray           # []

    @staticmethod
    def from_camera(cam) -> "CameraArrays":
        return CameraArrays(
            world_view=jnp.asarray(cam.world_view),
            full_proj=jnp.asarray(cam.full_proj),
            camera_center=jnp.asarray(cam.camera_center),
            tanfovx=jnp.asarray(cam.tanfovx, jnp.float32),
            tanfovy=jnp.asarray(cam.tanfovy, jnp.float32),
            time=jnp.asarray(cam.time, jnp.float32),
        )


class RenderOut(NamedTuple):
    color: jnp.ndarray
    depth: jnp.ndarray
    alpha: jnp.ndarray
    radii: jnp.ndarray
    num_rendered: jnp.ndarray
    max_tile_len: jnp.ndarray
    dxyz_abs: jnp.ndarray  # [P,3] |Δxyz| for the deformation accumulator


def render(
    params: dict[str, Any],
    state: GaussianState,
    cam: CameraArrays,
    cfg: Config,
    width: int,
    height: int,
    stage: str,
    bg: jnp.ndarray,
    active_sh_degree: int,
    means2d_offset: jnp.ndarray | None = None,
    backend: str | None = None,
    tile_space: bool = False,
) -> RenderOut:
    """Render one camera.

    ``params`` is passed separately from ``state`` so jax.grad can
    differentiate w.r.t. the optimized pytree while the rest of the state
    (alive mask, aabb, ...) stays auxiliary.

    ``tile_space=True`` returns the rasterizer's native tile layout:
    ``color`` holds the PACKED [T, 256, 5] block (r, g, b, depth, t_fin)
    and depth/alpha are [T, 256, 1] views — the training loss consumes the
    packed block directly (column-masked against a 5-wide tiled GT), so
    the per-step tile→image transpose and every slice/pad around the
    Pallas custom VJP disappear. Non-pallas backends tile their image
    output for layout parity (they are the CPU/test backends; the extra
    transpose is fine there).
    """
    xyz = params["xyz"]
    scaling = params["scaling"]
    rotation = params["rotation"]
    opacity = params["opacity"]
    shs = G.get_features(params)
    P = xyz.shape[0]

    if stage == "fine":
        # scalar camera time (the reference broadcasts to [P,1],
        # gaussian_renderer/__init__.py:52; here the scalar enables the
        # hexplane temporal-plane matmul fast path)
        xyz, scaling, rotation, opacity, shs = deform_lib.deform(
            params["deform"], cfg.hidden, state.aabb,
            xyz, scaling, rotation, opacity, shs, cam.time,
        )
    elif stage != "coarse":
        raise ValueError(f"unknown stage {stage!r}")
    dxyz_abs = jnp.abs(xyz - params["xyz"])

    # Activations after deformation (gaussian_renderer/__init__.py:97-99).
    scales_act = jnp.exp(scaling)
    if cfg.model.use_isotropic_gaussian:
        scales_act = jnp.repeat(scales_act[:, :1], 3, axis=1)
    rot_act = rotation / jnp.maximum(
        jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
    )
    opacity_act = jax.nn.sigmoid(opacity)

    backend = backend or cfg.tpu.backend
    if backend == "pallas":
        from fourdgs_tpu.ops.rasterize import rasterize_pallas

        # Mosaic kernels need a TPU; fall back to the interpreter on CPU
        # hosts (tests, dry runs) automatically.
        interpret = cfg.tpu.pallas_interpret or jax.default_backend() == "cpu"

        out = rasterize_pallas(
            xyz, scales_act, rot_act, opacity_act, shs,
            camera_center=cam.camera_center,
            world_view=cam.world_view,
            full_proj=cam.full_proj,
            tanfovx=cam.tanfovx,
            tanfovy=cam.tanfovy,
            width=width,
            height=height,
            sh_degree=active_sh_degree,
            bg=bg,
            means2d_offset=means2d_offset,
            instance_budget=cfg.tpu.instance_budget,
            alive=state.alive,
            interpret=interpret,
            payload_dtype=(jnp.bfloat16 if cfg.tpu.payload_bf16
                           else jnp.float32),
            tile_space=tile_space,
            ellipse_tile_cull=cfg.tpu.ellipse_tile_cull,
        )
        return RenderOut(
            color=out.color, depth=out.depth, alpha=out.alpha,
            radii=out.radii, num_rendered=out.num_rendered,
            max_tile_len=out.max_tile_len, dxyz_abs=dxyz_abs,
        )
    common = dict(
        camera_center=cam.camera_center,
        world_view=cam.world_view,
        full_proj=cam.full_proj,
        tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy,
        width=width,
        height=height,
        sh_degree=active_sh_degree,
        bg=bg,
        means2d_offset=means2d_offset,
    )
    if backend == "tile":
        out = rasterize_tiled(
            xyz, scales_act, rot_act, opacity_act, shs,
            instance_budget=cfg.tpu.instance_budget,
            tile_budget=cfg.tpu.tile_budget,
            chunk=cfg.tpu.blend_chunk,
            alive=state.alive,
            **common,
        )
        color, depth, alpha = out.color, out.depth, out.alpha
        if tile_space:
            color, depth, alpha = _pack_tiles(color, depth, alpha)
        return RenderOut(
            color=color, depth=depth, alpha=alpha,
            radii=out.radii, num_rendered=out.num_rendered,
            max_tile_len=out.max_tile_len, dxyz_abs=dxyz_abs,
        )
    elif backend == "reference":
        out = rasterize_reference(
            xyz, scales_act, rot_act, opacity_act, shs,
            alive_mask=state.alive,
            **common,
        )
        color, depth, alpha = out.color, out.depth, out.alpha
        if tile_space:
            color, depth, alpha = _pack_tiles(color, depth, alpha)
        return RenderOut(
            color=color, depth=depth, alpha=alpha,
            radii=out.radii,
            num_rendered=jnp.int32(0), max_tile_len=jnp.int32(0),
            dxyz_abs=dxyz_abs,
        )
    raise ValueError(f"unknown backend {backend!r}")


def _pack_tiles(color, depth, alpha):
    """Image-space (color, depth, alpha) → the pallas backend's packed
    channel-major tile-space contract: color = [T, 5, 256]
    (r, g, b, depth, t_fin)."""
    from fourdgs_tpu.utils.losses import tile_image

    tc, td, ta = map(tile_image, (color, depth, alpha))
    packed = jnp.concatenate([tc, td, 1.0 - ta], axis=1)
    return packed, td, ta
