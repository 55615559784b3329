"""The sharded end-to-end trainer: one shard_map'd train step over a mesh.

SURVEY.md §2.7 / BASELINE north star: the reference is single-GPU
(train.py:197-209 renders the micro-batch sequentially); the TPU build scales
with SPMD over a ``Mesh(('data', 'model'))``:

  data  — cameras of the micro-batch (batch_size must divide the axis)
  model — horizontal slabs of tile rows (the SP/CP analog for splatting:
          each device rasterizes its rows against the full primitive set
          with zero cross-device traffic inside the rasterizer)

Primitive parameters are **replicated by default**: every slab's preprocess
reads all P Gaussians anyway, so sharding [P] tensors forces a per-step
all-gather right before the first use — replication is the
communication-optimal layout at 4DGS scales (≤360k × ~60 floats ≈ 86 MB).
What the mesh buys is the pixel-dominated work: rasterize forward+backward,
which is >80% of the step.

``cfg.tpu.shard_primitives`` enables the **[P]-sharded fallback** (SURVEY
§2.7's primitive-sharding analog, VERDICT r3 #6): per-Gaussian parameters
AND their Adam moments live sharded on 'model' (axis 0); each step
all-gathers the parameters over 'model' before preprocess, and autodiff's
transpose of that gather is exactly the reduce-scatter that returns each
shard its own gradient slice — the FSDP/ZeRO-3 pattern. Per-step cost: one
param-sized all-gather (~29 MB at cap) + the (already present) grad psum;
per-device memory for params+moments drops from 3·S to 3·S/n_model + S
transient. CROSSOVER: replication is faster below ~2M primitives on 16 GB
v5e chips (86 MB × 3 ≪ HBM; the all-gather adds ~0.1 ms/step on ICI);
sharding wins when P×59 floats×3 (params+μ+ν, f32) approaches a chip's free
HBM after activations — ~5M primitives on v5e (merged multi-scene models,
merge_many_4dgs.py), or any capacity where replicated moments would OOM.

Inside one jitted shard_map step, each device:
  1. renders its (cameras × tile-row slab) block through the production
     Pallas pipeline, with the means2D gradient carrier;
  2. computes its additive share of the loss — L1 on local pixels, D-SSIM on
     the row-gathered image (11×11 windows straddle slab boundaries, so the
     color rows are all-gathered over 'model' and the gather's transpose
     routes pixel gradients back to the owning slab), fine-stage hexplane
     regularization on the replicated field;
  3. takes jax.grad of that local share; the parameter gradients are then
     psum'd over ('data','model') — the only parameter-sized collective;
  4. applies Adam replicated (3 ms of redundant compute beats communicating
     86 MB of update state), accumulates densification statistics from the
     psum'd viewspace gradients, and returns replicated outputs.

Densify/prune/opacity-reset run between steps as the ordinary jitted
maintenance on the replicated state — deterministic, hence consistent across
devices without communication.

Multi-host: the same code runs under ``jax.distributed.initialize`` via
fourdgs_tpu.parallel.multihost — make_hybrid_mesh puts 'data' on the
DCN/host axis and 'model' on ICI so the row all-gather and grad psum ride
ICI.

Grad-psum / backward overlap: the parameter-gradient psum is emitted as
one tail collective with no consumer until Adam; XLA's TPU
latency-hiding scheduler (async collectives, default-on) is free to
start it as soon as each gradient leaf is complete — i.e. the hexplane /
MLP / preprocess grads' reduce can overlap the still-running blend
backward custom-call, since Mosaic kernels are opaque to fusion but not
to scheduling. We deliberately do NOT hand-chunk the psum: the tree is
~17 MB (0.1 ms on ICI, sub-ms on DCN — measured in MULTIHOST.json), so
even fully exposed it is <1% of the step; hand-splitting it would add
per-collective latency for nothing. This honors the BASELINE "overlapped
with the backward tile pass" intent the cheap way: keep the collective
small and let the scheduler hide it.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.models import deformation as deform_lib
from fourdgs_tpu.models import densify as dens
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models import hexplane as hp
from fourdgs_tpu.ops import constants as C
from fourdgs_tpu.ops.rasterize import rasterize_pallas
from fourdgs_tpu.train import adam
from fourdgs_tpu.utils import losses


def batch_specs(mesh: Mesh, cams, gts):
    """PartitionSpecs for a camera batch: batch over 'data', gt rows over
    'model' (slab rows)."""
    cam_spec = jax.tree.map(lambda _: P("data"), cams)
    return cam_spec, P("data", None, "model", None)


def interleave_gt_rows(gts, n_model: int):
    """Reorder a [B, C, H, W] GT so the contiguous H-split over 'model'
    hands shard s the INTERLEAVED tile rows {s, s+N, ...}.

    Tile-row assignment is interleaved for load balance (instance demand is
    strongly center-skewed: the middle 1/2-slab of the bench scene holds
    76% of the duplicated instances, so contiguous slabs run the sharded
    step at the slowest shard's ~62% efficiency while interleaved rows are
    balanced by construction). Shard-local tile row j = global row
    s + j·N; this permutation makes gts[..., s*slab_h + j*16 + p, :] the
    pixels of global tile row s + j·N.
    """
    if n_model == 1:
        return gts
    B, Cc, H, W = gts.shape
    ty = C.TILE_Y
    grid_y = -(-H // ty)
    if grid_y % n_model != 0 or H % ty != 0:
        # shapes the sharded step would reject anyway (its own check
        # raises); leave the batch untouched here
        return gts
    rows_per = grid_y // n_model
    g = gts.reshape(B, Cc, rows_per, n_model, ty, W)
    # (j, s) → destination (s, j)
    return g.transpose(0, 1, 3, 2, 4, 5).reshape(B, Cc, H, W)


def deinterleave_rows(img, n_model: int):
    """Inverse of :func:`interleave_gt_rows` on a [..., H, W] image whose H
    is the shard-major concatenation of interleaved tile rows (the
    all-gathered color in the SSIM path)."""
    if n_model == 1:
        return img
    *lead, H, W = img.shape
    ty = C.TILE_Y
    grid_y = H // ty
    rows_per = grid_y // n_model
    g = img.reshape(*lead, n_model, rows_per, ty, W)
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead),
                                     len(lead) + 2, len(lead) + 3]
    return g.transpose(perm).reshape(*lead, H, W)


def place_batch(mesh: Mesh, cams, gts):
    cam_spec, gt_spec = batch_specs(mesh, cams, gts)
    cams = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), cams
    )
    gts = interleave_gt_rows(gts, mesh.shape["model"])
    gts = jax.device_put(gts, NamedSharding(mesh, gt_spec))
    return cams, gts


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, s) if isinstance(x, jnp.ndarray) else x,
        tree,
    )


# Per-Gaussian parameter leaves ([P, ...], shardable on 'model'); "deform"
# (the field/MLP subtree) is pixel-independent of P and stays replicated.
PRIM_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


def _prim_param_specs(params, shard: bool):
    """PartitionSpec tree for a params dict: prim leaves on 'model' when
    sharding, deform subtree replicated."""
    out = {}
    for key, val in params.items():
        if key in PRIM_KEYS:
            out[key] = P("model") if shard else P()
        else:
            out[key] = jax.tree.map(lambda _: P(), val)
    return out


def shard_primitives(mesh: Mesh, params_or_moments):
    """Place a params-shaped pytree with prim leaves sharded on 'model'."""
    out = {}
    for key, val in params_or_moments.items():
        spec = P("model") if key in PRIM_KEYS else P()
        out[key] = jax.tree.map(
            lambda x, s=spec: jax.device_put(x, NamedSharding(mesh, s)), val
        )
    return out


def unshard_primitives(mesh: Mesh, params_or_moments):
    """Gather a prim-sharded params-shaped pytree back to replicated (for
    maintenance/densify surgery and checkpointing)."""
    return replicate(mesh, params_or_moments)


def shard_adam(mesh: Mesh, adam_state):
    """Shard an AdamState's moments like the params (count replicated)."""
    return adam_state._replace(
        mu=shard_primitives(mesh, adam_state.mu),
        nu=shard_primitives(mesh, adam_state.nu),
        count=jax.device_put(
            adam_state.count, NamedSharding(mesh, P())
        ),
    )


def unshard_adam(mesh: Mesh, adam_state):
    return adam_state._replace(
        mu=unshard_primitives(mesh, adam_state.mu),
        nu=unshard_primitives(mesh, adam_state.nu),
    )


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    width: int,
    height: int,
    stage: str,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    interpret: bool | None = None,
) -> Callable:
    """Build the jitted dp×sp train step (same contract as
    fourdgs_tpu.train.loop.make_train_step).

    Requirements: gts [B, 3, H, W] with B % mesh.shape['data'] == 0 and the
    tile-row count (⌈H/16⌉) % mesh.shape['model'] == 0.
    """
    n_data = mesh.shape["data"]
    n_sp = mesh.shape["model"]
    shard_prim = bool(getattr(cfg.tpu, "shard_primitives", False))
    grid_y = (height + C.TILE_Y - 1) // C.TILE_Y
    if grid_y % n_sp != 0:
        raise ValueError(
            f"tile rows {grid_y} not divisible by model axis {n_sp}"
        )
    rows_per = grid_y // n_sp
    slab_h = rows_per * C.TILE_Y
    if shard_prim and cfg.tpu.capacity % n_sp != 0:
        raise ValueError(
            f"shard_primitives needs capacity {cfg.tpu.capacity} divisible "
            f"by model axis {n_sp}"
        )
    if interpret is None:
        interpret = cfg.tpu.pallas_interpret or jax.default_backend() == "cpu"
    bg = jnp.array(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
    )

    shard_pre = bool(getattr(cfg.tpu, "shard_preprocess", False)) and n_sp > 1
    if (shard_pre or shard_prim) and cfg.tpu.capacity % n_sp != 0:
        raise ValueError(
            f"sharded preprocess/primitives need capacity {cfg.tpu.capacity} "
            f"divisible by model axis {n_sp}"
        )
    payload_dt = jnp.bfloat16 if cfg.tpu.payload_bf16 else jnp.float32

    def _deform_act(params, state, cam, prim):
        """Deformation + activations on a (possibly sliced) prim set."""
        xyz, scaling, rotation, opacity, shs = prim
        if stage == "fine":
            t = jnp.broadcast_to(cam.time, (xyz.shape[0],))
            xyz_d, scaling, rotation, opacity, shs = deform_lib.deform(
                params["deform"], cfg.hidden, state.aabb,
                xyz, scaling, rotation, opacity, shs, t,
            )
        else:
            xyz_d = xyz
        dxyz_abs = jnp.abs(xyz_d - xyz)
        scales_act = jnp.exp(scaling)
        if cfg.model.use_isotropic_gaussian:
            scales_act = jnp.repeat(scales_act[:, :1], 3, axis=1)
        rot_act = rotation / jnp.maximum(
            jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
        )
        return (xyz_d, scales_act, rot_act, jax.nn.sigmoid(opacity), shs,
                dxyz_abs)

    def render_slab(params, state, cam, carrier, row_offset):
        prim = (params["xyz"], params["scaling"], params["rotation"],
                params["opacity"], G.get_features(params))
        if not shard_pre:
            (xyz, scales_act, rot_act, opac, shs,
             dxyz_abs) = _deform_act(params, state, cam, prim)
            out = rasterize_pallas(
                xyz, scales_act, rot_act, opac, shs,
                cam.camera_center, cam.world_view, cam.full_proj,
                cam.tanfovx, cam.tanfovy, width, height,
                active_sh_degree, bg,
                instance_budget=cfg.tpu.instance_budget,
                means2d_offset=carrier,
                alive=state.alive,
                interpret=interpret,
                tile_row_offset=row_offset,
                tile_rows=rows_per,
                tile_row_stride=n_sp,
                payload_dtype=payload_dt,
                ellipse_tile_cull=cfg.tpu.ellipse_tile_cull,
            )
            return out, dxyz_abs

        # 'model'-SHARDED deformation + preprocess (SURVEY §2.7 / VERDICT r4
        # #4): each shard deforms + preprocesses only its [P/N] slice of the
        # primitive set, builds the packed 16-column payload table, and
        # all-gathers table + rect ints over 'model' (~4.5 MB at 65k — ICI
        # noise). Binning/blend stay local to the shard's tile rows. The
        # all_gather's autodiff transpose is the reduce-scatter that routes
        # every shard's table gradients back to the slice owner, so under
        # shard_primitives no parameter all-gather is needed at all.
        from fourdgs_tpu.ops.preprocess import preprocess
        from fourdgs_tpu.ops.rasterize import build_table, \
            rasterize_from_table

        if shard_prim:
            prim_l = prim                       # already the local slice
            P_l = prim[0].shape[0]
            i = jax.lax.axis_index("model")
        else:
            P_full = prim[0].shape[0]
            P_l = P_full // n_sp
            i = jax.lax.axis_index("model")
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * P_l, P_l, 0)
            prim_l = tuple(sl(x) for x in prim)
        sl_aux = lambda x: jax.lax.dynamic_slice_in_dim(
            x, i * P_l, P_l, 0
        )
        alive_l = sl_aux(state.alive)
        carrier_l = sl_aux(carrier)
        (xyz, scales_act, rot_act, opac_l, shs,
         dxyz_l) = _deform_act(params, state, cam, prim_l)
        opac_l = opac_l.reshape(-1)
        pre = preprocess(
            xyz, scales_act, rot_act, shs,
            cam.camera_center, cam.world_view, cam.full_proj,
            cam.tanfovx, cam.tanfovy, width, height, active_sh_degree,
            alive=alive_l, opacities=opac_l,
        )
        means2d_l = pre.means2d + carrier_l
        table_l = build_table(pre, opac_l, means2d_l, payload_dt)
        ints_l = jnp.concatenate(
            [pre.tile_min, pre.tile_max, pre.tiles_touched[:, None],
             pre.radii[:, None]], axis=1,
        )                                               # [P/N, 6] int32
        ag = lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True)
        table = ag(table_l)
        ints = jax.lax.stop_gradient(ag(ints_l))
        depths = jax.lax.stop_gradient(
            ag(jax.lax.stop_gradient(pre.depths))
        )
        dxyz_abs = jax.lax.stop_gradient(ag(dxyz_l))
        out = rasterize_from_table(
            table, ints[:, 0:2], ints[:, 2:4], ints[:, 4],
            depths, ints[:, 5], table[:, 0:2].astype(jnp.float32),
            width, height, bg, cfg.tpu.instance_budget,
            interpret=interpret,
            tile_row_offset=row_offset,
            tile_rows=rows_per,
            tile_row_stride=n_sp,
            tile_space=False,
        )
        return out, dxyz_abs

    def local_loss(params, carrier, state, cams, gts):
        """This device's ADDITIVE share of the global loss: psum over
        ('data','model') of this value == the single-device loss."""
        if shard_prim and not shard_pre:
            # [P]-sharded mode: gather prim params over 'model' for the
            # render; autodiff's transpose of this gather is the
            # reduce-scatter that hands each shard its gradient slice.
            # (Under shard_preprocess the gather happens AFTER deformation
            # + preprocess on the 16-column attribute table instead — no
            # parameter-sized gather at all.)
            params = {
                key: (jax.lax.all_gather(val, "model", axis=0, tiled=True)
                      if key in PRIM_KEYS else val)
                for key, val in params.items()
            }
        # interleaved tile-row assignment: this shard owns global rows
        # {axis_index + j·n_sp} (see interleave_gt_rows for why)
        row_offset = jax.lax.axis_index("model")
        B_local = gts.shape[0]
        B_total = B_local * n_data
        colors = []
        radii_l = []
        nrend = jnp.int32(0)
        tlen = jnp.int32(0)
        dxyz = 0.0
        for i in range(B_local):
            cam_i = jax.tree.map(lambda x: x[i], cams)
            out, dxyz_abs = render_slab(
                params, state, cam_i, carrier[i], row_offset
            )
            colors.append(out.color[:, :slab_h])
            radii_l.append(out.radii)
            nrend = jnp.maximum(nrend, out.num_rendered)
            tlen = jnp.maximum(tlen, out.max_tile_len)
            dxyz = dxyz + dxyz_abs / B_total
        colors = jnp.stack(colors)              # [B_local, 3, slab_h, W]
        gts = gts[:, :3]
        # L1 on local pixels: sum/(global count) is an additive share
        l1_share = jnp.sum(jnp.abs(colors - gts)) / (
            B_total * 3 * height * width
        )
        loss = l1_share
        if stage == "fine" and cfg.hidden.time_smoothness_weight != 0:
            # replicated compute → divide so the psum counts it once
            loss = loss + hp.hexplane_regularization(
                params["deform"], len(cfg.hidden.multires),
                cfg.hidden.plane_tv_weight,
                cfg.hidden.time_smoothness_weight,
                cfg.hidden.l1_time_planes,
            ) / (n_data * n_sp)
        # per-camera squared error (for PSNR): [B_local]
        sq = jnp.sum((colors - gts) ** 2, axis=(1, 2, 3))
        if cfg.opt.lambda_dssim != 0:
            # 11×11 SSIM windows straddle row boundaries: gather the rows
            # (all_gather transpose routes grads back to the owning shard)
            # and undo the interleaved row order before the window conv
            full_c = deinterleave_rows(
                jax.lax.all_gather(colors, "model", axis=2, tiled=True),
                n_sp,
            )
            full_g = deinterleave_rows(
                jax.lax.all_gather(gts, "model", axis=2, tiled=True),
                n_sp,
            )
            ssim_term = (1.0 - losses.ssim(
                full_c[:, :, :height], full_g[:, :, :height]
            ))
            loss = loss + cfg.opt.lambda_dssim * ssim_term * (
                B_local / (B_total * n_sp)
            )
        aux = (l1_share, sq, jnp.stack(radii_l), nrend, tlen, dxyz)
        return loss, aux

    def shard_step(params, adam_state, state, cams, gts, step):
        B_local = gts.shape[0]
        # under prim sharding params["xyz"] is the LOCAL [P/n_sp] shard;
        # the carrier (viewspace-grad harvest) spans the full primitive set
        Pn = params["xyz"].shape[0] * (n_sp if shard_prim else 1)
        carrier = jnp.zeros((B_local, Pn, 2), jnp.float32)
        (loss_sh, aux), (g_params, g_carrier) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(params, carrier, state, cams, gts)
        l1_sh, sq, radii_l, nrend, tlen, dxyz = aux

        # the ONLY parameter-sized collective of the step. Prim-sharded
        # leaves already carry the 'model'-axis reduction (the all_gather
        # transpose is a reduce-scatter), so they psum over 'data' alone.
        if shard_prim:
            g_params = {
                key: jax.lax.psum(
                    val, "data" if key in PRIM_KEYS else ("data", "model")
                )
                for key, val in g_params.items()
            }
        else:
            g_params = jax.lax.psum(g_params, ("data", "model"))
        loss = jax.lax.psum(loss_sh, ("data", "model"))
        l1 = jax.lax.psum(l1_sh, ("data", "model"))
        # viewspace-grad stats: sum over batch + both axes (train.py:266-268)
        vs_grad = jax.lax.psum(
            jnp.sum(g_carrier, axis=0), ("data", "model")
        )
        # per-camera mse over the full image, then mean over all cameras
        sq_full = jax.lax.psum(sq, "model")
        mse = sq_full / (3 * height * width)
        psnr = jax.lax.pmean(
            jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))), "data"
        )
        radii = jax.lax.pmax(jnp.max(radii_l, axis=0), "data")
        nrend = jax.lax.pmax(nrend, ("data", "model"))
        tlen = jax.lax.pmax(tlen, ("data", "model"))
        dxyz = jax.lax.psum(dxyz, "data")

        lrs = adam.learning_rates(step, cfg.opt, spatial_lr_scale)
        lr_tree = adam.lr_tree_for_params(params, lrs)
        new_params, new_adam = adam.update(
            params, g_params, adam_state, lr_tree
        )
        state = dens.add_densification_stats(
            state, vs_grad, radii, width, height
        )
        state = state._replace(
            deformation_accum=state.deformation_accum + dxyz
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "psnr": psnr,
            "num_rendered": nrend,
            "max_tile_len": tlen,
            "n_points": G.count_alive(state),
        }
        return new_params, new_adam, state, metrics

    rep = P()

    def specs_like(tree, spec):
        return jax.tree.map(
            lambda _: spec, tree, is_leaf=lambda x: isinstance(x, jnp.ndarray)
        )

    @jax.jit
    def train_step(params, adam_state, state, cams, gts, step):
        if shard_prim:
            pspec = _prim_param_specs(params, True)
            aspec = adam_state._replace(
                mu=_prim_param_specs(adam_state.mu, True),
                nu=_prim_param_specs(adam_state.nu, True),
                count=rep,
            )
        else:
            pspec = specs_like(params, rep)
            aspec = specs_like(adam_state, rep)
        sspec = specs_like(state, rep)
        if shard_prim:
            # state carries its own (sharded) params reference; spec it to
            # match so no silent per-step reshard/gather happens (the step
            # itself only reads state.alive/aabb/stats, all replicated)
            sspec = sspec._replace(params=_prim_param_specs(params, True))
        cam_spec = specs_like(cams, P("data"))
        return shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(pspec, aspec, sspec, cam_spec,
                      P("data", None, "model", None), rep),
            out_specs=(pspec, aspec, sspec, specs_like(
                {"loss": 0, "l1": 0, "psnr": 0, "num_rendered": 0,
                 "max_tile_len": 0, "n_points": 0}, rep)),
            # check_vma=True is not currently possible: pallas_call out_shapes
            # can carry vma, but the Pallas HLO interpreter (our CPU test
            # path) rejects kernel-internal mixing of varying refs with
            # unvarying program ids ("Primitive dynamic_slice requires
            # varying manual axes to match ... open an issue"). The 2x2
            # leaf-for-leaf parity test (tests/test_parallel.py) is the
            # compensating control for shard_map transpose correctness.
            check_vma=False,
        )(params, adam_state, state, cams, gts, step)

    return train_step
