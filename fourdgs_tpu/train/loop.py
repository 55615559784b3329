"""Training loop: the TPU-native scene_reconstruction.

Reimplements train.py:43-401 of the reference with the hot path fully jitted:

- ``train_step``: render a camera batch (vmapped tiled rasterizer), L1 +
  fine-stage grid regulation (+ optional D-SSIM), backward, Adam with the
  per-group LR schedules, densification-stat accumulation — one compiled
  XLA program, no host syncs inside.
- ``maintenance``: clone/split/prune/opacity-reset as separate jitted calls
  gated by the host on the reference's exact schedule (train.py:346-372:
  densify while P<360k every densification_interval after densify_from_iter;
  prune while P>200k; thresholds linearly annealed in the fine stage;
  size_threshold 20 only after the first opacity reset).
- batching replicates the reference's random-pop-without-replacement camera
  stack (train.py:166-177); zerostamp_init restricts the coarse stage to
  timestamp-0 cameras (train.py:101-107).

The reference's per-iteration Python work (``.item()`` logging, viewer
polling) throttles its GPU; here metrics return as device arrays and are
materialized only every ``log_interval`` iterations.
"""

from __future__ import annotations

import random as pyrandom
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.configs.core import Config
from fourdgs_tpu.models import densify as dens
from fourdgs_tpu.models import gaussians as G
from fourdgs_tpu.models import hexplane as hp
from fourdgs_tpu.models.gaussians import GaussianState
from fourdgs_tpu.render import CameraArrays, render
from fourdgs_tpu.train import adam
from fourdgs_tpu.utils import losses
from fourdgs_tpu.utils.debug_images import should_save_progress as debug_images_due
from fourdgs_tpu.utils.timer import DetailedTimer

# Hard cap on instance-budget recompiles per stage: with ×2 geometric growth
# this spans a 16× demand range, and bounds remote-TPU recompile stalls.
_MAX_BUDGET_GROWTHS = 4


def make_train_step(
    cfg: Config, width: int, height: int, stage: str, active_sh_degree: int,
    spatial_lr_scale: float = 1.0, track_grads: bool = False,
) -> Callable:
    """Build the jitted train step for a (resolution, stage, sh_degree).

    ``spatial_lr_scale`` is closed over statically (it is fixed per scene,
    gaussian_model.py:138) so the LR schedule constants fold at trace time.
    """

    bg = jnp.array(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
    )

    # The loss runs in TILE space (channel-major [T, 5, 256] packed blocks,
    # the rasterizer's native output layout): the GT is tiled once per step
    # outside the gradient, so the tile→image transpose and its backward
    # re-tile drop out of the hot path (~3 ms/step at 800×800 on v5e).
    # λ_dssim ≠ 0 stays tile-space too — losses.ssim_tiles evaluates the
    # 11×11 window on halo-rolled tile blocks (exact vs the image-space
    # conv) — except when the tile grid is padded (H or W not a multiple
    # of 16), where the zero-padding pixels would pollute the windows; that
    # case keeps the image path.
    padded = (height % 16 != 0) or (width % 16 != 0)
    tile_mode = cfg.opt.lambda_dssim == 0 or not padded
    n_px = 3 * height * width
    n_tiles = (-(-height // 16)) * (-(-width // 16))

    def loss_fn(params, carrier, state, cams, gts_in):
        def render_one(cam, off):
            out = render(
                params, state, cam, cfg, width, height, stage, bg,
                active_sh_degree, means2d_offset=off, tile_space=tile_mode,
            )
            return out.color, (out.radii, out.num_rendered, out.max_tile_len,
                               out.dxyz_abs)
        # Unrolled loop over the (small, static) camera batch rather than
        # vmap: batch sizes are 1-4 (reference configs), the reference itself
        # renders the micro-batch sequentially (train.py:197-209), and
        # keeping the Pallas custom_vjp out of vmap keeps XLA compile times
        # sane on the remote-compile TPU path.
        B = gts_in.shape[0]
        # pre-tiled GT fast path: [B, T, C, 256] channel-major tile blocks
        # (uint8 C=3 from the pre-tiled device cache, float C=5 prepadded)
        # — the in-jit image→tile relayout measured ~3.7 ms/step at
        # 800×800, so callers pre-tile whenever the loss runs tile-space.
        tiled_in = (
            tile_mode and gts_in.ndim == 4 and gts_in.shape[1] == n_tiles
            and gts_in.shape[3] == 256
        )
        if not tiled_in and gts_in.dtype == jnp.uint8:
            # loader format: uint8 [B,H,W,C] — normalize and transpose
            # INSIDE the jitted step so it fuses with the loss tiling
            # instead of costing a separate host-side dispatch
            gts_in = gts_in.astype(jnp.float32).transpose(0, 3, 1, 2) / 255.0
        per_cam = [
            render_one(jax.tree.map(lambda x: x[i], cams), carrier[i])
            for i in range(B)
        ]
        colors = jnp.stack([c for c, _ in per_cam])
        aux = jax.tree.map(lambda *xs: jnp.stack(xs), *[a for _, a in per_cam])
        gts_img = None if tiled_in else gts_in[:, :3]
        if tile_mode:
            # colors is the PACKED channel-major [B, T, 5, 256] block
            # (r, g, b, depth, t_fin); tile the GT 5-wide in the same
            # layout and mask the depth/t_fin channels so the cotangent
            # reaches the Pallas VJP with no slice/pad layout ops. Pixels
            # ride the 256-lane minor dim, so every op here is lane-dense
            # AND the arrays are dense in HBM (a pixel-major [.., 256, 5]
            # block pads 5 → 128 lanes: 25× physical traffic — measured
            # 1.4 ms/step in this very fusion).
            if tiled_in:
                if gts_in.dtype == jnp.uint8:
                    g = gts_in.astype(jnp.float32) / 255.0  # [B,T,3,256]
                    gts_cmp = jnp.pad(
                        g, ((0, 0), (0, 0), (0, 2), (0, 0))
                    )
                else:
                    gts_cmp = gts_in                        # [B,T,5,256]
            else:
                gts_cmp = jnp.stack(
                    [losses.tile_image(g, pad_cols=2) for g in gts_img]
                )
            m = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0])[:, None]
            if padded:
                m = m * losses.tile_pixel_mask(height, width)
            diff = (colors - gts_cmp) * jnp.broadcast_to(
                m, gts_cmp.shape[1:]
            )
            # identical values to the image-space mean (padding pixels and
            # the non-color channels are masked out; the denominator counts
            # true color pixels only)
            l1 = jnp.sum(jnp.abs(diff)) / (B * n_px)
            mse = jnp.sum(diff * diff, axis=(1, 2, 3)) / n_px
            psnr = jnp.mean(
                20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))
            )
        else:
            l1 = losses.l1_loss(colors, gts_img)
            psnr = jnp.mean(losses.psnr(colors, gts_img))
        loss = l1
        if stage == "fine" and cfg.hidden.time_smoothness_weight != 0:
            loss = loss + hp.hexplane_regularization(
                params["deform"], len(cfg.hidden.multires),
                cfg.hidden.plane_tv_weight,
                cfg.hidden.time_smoothness_weight,
                cfg.hidden.l1_time_planes,
            )
        if cfg.opt.lambda_dssim != 0:
            if tile_mode:
                gy = -(-height // 16)
                gx = -(-width // 16)
                dssim_term = 1.0 - losses.ssim_tiles(
                    colors[:, :, 0:3], gts_cmp[:, :, 0:3], gx, gy
                )
            else:
                dssim_term = 1.0 - losses.ssim(colors, gts_img)
            loss = loss + cfg.opt.lambda_dssim * dssim_term
        return loss, (l1, psnr, aux)

    def step_core(params, adam_state, state: GaussianState, cams, gts, step):
        B = gts.shape[0]
        P = params["xyz"].shape[0]
        carrier = jnp.zeros((B, P, 2), jnp.float32)
        (loss, (l1, psnr, aux)), (g_params, g_carrier) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, carrier, state, cams, gts)

        radii_b, num_rendered_b, tile_len_b, dxyz_b = aux
        radii = jnp.max(radii_b, axis=0)                  # train.py:229 max over batch
        vs_grad = jnp.sum(g_carrier, axis=0)              # train.py:266-268 sum over batch

        if cfg.tpu.sanitize_grads:
            # containment (see ops/rasterize._gathered_payload_bwd): keep a
            # localized fp blow-up from reaching Adam's squared moments of
            # SHARED parameters; identity for every finite gradient.
            g_params = jax.tree.map(
                lambda g: jnp.clip(
                    jnp.nan_to_num(g, nan=0.0, posinf=1e12, neginf=-1e12),
                    -1e12, 1e12,
                ),
                g_params,
            )
        lrs = adam.learning_rates(step, cfg.opt, spatial_lr_scale)
        lr_tree = adam.lr_tree_for_params(params, lrs)
        new_params, new_adam = adam.update(params, g_params, adam_state, lr_tree)

        # densification stats (train.py:346-349) — cheap, always accumulated
        state = dens.add_densification_stats(state, vs_grad, radii, width, height)
        state = state._replace(
            deformation_accum=state.deformation_accum + jnp.mean(dxyz_b, axis=0)
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "psnr": psnr,
            "num_rendered": jnp.max(num_rendered_b),
            "max_tile_len": jnp.max(tile_len_b),
            "n_points": G.count_alive(state),
        }
        if track_grads:
            from fourdgs_tpu.utils.gradient_tracker import compute_grad_stats

            metrics["grad_stats"] = compute_grad_stats(g_params)
            metrics["vs_grad_norm"] = jnp.linalg.norm(vs_grad, axis=-1)
        return new_params, new_adam, state, metrics

    train_step = jax.jit(step_core)
    train_step.core = step_core  # undecorated body, for make_train_scan
    return train_step


def make_train_scan(
    cfg: Config, width: int, height: int, stage: str, active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
) -> Callable:
    """Multi-step fused train program: ``lax.scan`` over N train steps.

    On the remote-attached TPU every jitted call pays a ~2-3 ms host
    dispatch latency that the 30 ms step cannot hide (measured wall-vs-
    device gap, docs/PERF.md). Scanning N steps inside ONE program
    amortizes that to ~3/N ms/step. The camera batch is gathered from the
    device-resident caches *inside* the program (one [N, B] int32 index
    upload per chunk), so chunks also drop the per-leaf camera-tree
    dispatches.

    Signature: (params, adam_state, state, cams_all, gt_all, idx, step0)
    where ``idx`` is int32 [n_steps, B] into the caches and ``step0`` is the
    1-based iteration number of the chunk's first step. n_steps is a static
    shape: one compile per distinct chunk length (the training loop clamps
    chunks to the gate cadences, so only a handful of lengths occur).
    Returns (params, adam_state, state, metrics) with metrics stacked [n].
    """
    step_core = make_train_step(
        cfg, width, height, stage, active_sh_degree,
        spatial_lr_scale=spatial_lr_scale,
    ).core

    @jax.jit
    def train_scan(params, adam_state, state, cams_all, gt_all, idx, step0):
        def body(carry, xs):
            params, adam_state, state = carry
            i, idx_i = xs
            gts = jnp.take(gt_all, idx_i, axis=0)
            cams = jax.tree.map(
                lambda x: jnp.take(x, idx_i, axis=0), cams_all
            )
            new_params, new_adam, new_state, metrics = step_core(
                params, adam_state, state, cams, gts, step0 + i
            )
            new_state = new_state._replace(params=new_params)
            return (new_params, new_adam, new_state), metrics

        n = idx.shape[0]
        (params, adam_state, state), ms = jax.lax.scan(
            body, (params, adam_state, state),
            (jnp.arange(n, dtype=jnp.int32), idx),
        )
        return params, adam_state, state, ms

    return train_scan


def make_maintenance(cfg: Config):
    """Jitted densify/prune/reset wrappers over fourdgs_tpu.models.densify."""

    iso = cfg.model.use_isotropic_gaussian

    @jax.jit
    def densify_fn(key, state, mu, nu, grad_threshold, opacity_threshold,
                   extent, size_threshold_on):
        grads = dens.compute_grads(state)
        moments = (mu, nu)
        state, moments, n_cloned = dens.densify_and_clone(
            state, moments, grads, grad_threshold, extent,
            cfg.opt.percent_dense, isotropic=iso,
        )
        state, moments, n_split = dens.densify_and_split(
            key, state, moments, grads, grad_threshold, extent,
            cfg.opt.percent_dense, isotropic=iso,
        )
        return state, moments[0], moments[1], n_cloned + n_split

    @jax.jit
    def prune_fn(state, opacity_threshold, extent, size_threshold_on):
        # size_threshold 20 applies only after the first opacity reset
        # (train.py:361-364); traced as a 0/1 flag.
        return dens.prune(
            state, opacity_threshold, extent, size_threshold_on, isotropic=iso
        )

    @jax.jit
    def reset_fn(state, mu, nu):
        state, (mu, nu) = dens.reset_opacity(state, (mu, nu))
        return state, mu, nu

    return densify_fn, prune_fn, reset_fn


@dataclass
class TrainLog:
    iterations: list = field(default_factory=list)
    ema_loss: float = 0.0
    ema_psnr: float = 0.0


def scene_reconstruction(
    cfg: Config,
    state: GaussianState,
    adam_state: adam.AdamState,
    train_cameras: list,          # list of (graphics.Camera, gt ndarray [C,H,W])
    stage: str,
    train_iter: int,
    cameras_extent: float,
    timer: DetailedTimer | None = None,
    rng_seed: int = 6666,
    log_interval: int = 50,
    log_fn: Callable | None = None,
    max_sh_degree: int | None = None,
    extra_log_iters: frozenset | set = frozenset(),
    gradient_tracker=None,
    mesh=None,
    debug_mode: bool = False,
    viewer=None,
    model_path: str = "",
    source_path: str = "",
    event_log=None,
) -> tuple[GaussianState, adam.AdamState, TrainLog]:
    """Train one stage (coarse or fine). Returns updated state + optimizer.

    Cameras must share one resolution (per-resolution compiled programs, as
    in all the reference's dataset configs).

    ``mesh``: an optional ('data','model') jax.sharding.Mesh — the stage then
    runs the production dp×sp sharded step (fourdgs_tpu.parallel.trainer):
    state/optimizer replicated, camera batch on 'data', tile-row slabs on
    'model'. Maintenance (densify/prune/reset) stays replicated-deterministic.

    ``debug_mode``: every 100 iterations save a render|GT panel of the
    batch's first camera under <model_path>/debug_images (reference
    train.py:212-219); ``cfg.model.render_process`` saves GT|render|depth
    progress frames on the dense early schedule (train.py:325-331).
    ``viewer``: an optional fourdgs_tpu.viewer.NetworkGUI polled once per
    iteration (train.py:117-142).
    """
    if not train_cameras:
        return state, adam_state, TrainLog()
    opt = cfg.opt
    ptrainer = None
    shard_prim = False
    if mesh is not None:
        from fourdgs_tpu.parallel import trainer as ptrainer
        if gradient_tracker is not None:
            raise ValueError(
                "gradient tracking is not supported under a mesh; run the "
                "tracker on a single-device stage"
            )
        state = ptrainer.replicate(mesh, state)
        adam_state = ptrainer.replicate(mesh, adam_state)
        shard_prim = cfg.tpu.shard_primitives
        if shard_prim:
            # [P]-sharded fallback: params + Adam moments live sharded on
            # 'model' (parallel.trainer docstring / VERDICT r3 #6).
            state = state._replace(
                params=ptrainer.shard_primitives(mesh, state.params)
            )
            adam_state = ptrainer.shard_adam(mesh, adam_state)

    def _prim_resharded(sharded: bool):
        """Move params+moments between sharded and replicated layouts —
        maintenance (densify surgery) and checkpointing run replicated."""
        nonlocal state, adam_state
        if not shard_prim:
            return
        if sharded:
            state = state._replace(
                params=ptrainer.shard_primitives(mesh, state.params)
            )
            adam_state = ptrainer.shard_adam(mesh, adam_state)
        else:
            state = state._replace(
                params=ptrainer.unshard_primitives(mesh, state.params)
            )
            adam_state = ptrainer.unshard_adam(mesh, adam_state)
    max_sh = cfg.model.sh_degree if max_sh_degree is None else max_sh_degree
    img0 = train_cameras[0][1]
    if img0.ndim == 3 and img0.shape[-1] in (3, 4):   # HWC uint8 loader format
        height, width = img0.shape[:2]
    else:                                             # CHW float format
        height, width = img0.shape[-2:]
    rng = pyrandom.Random(rng_seed)
    key = jax.random.key(rng_seed)

    # zerostamp_init: coarse stage trains only timestamp-0 cameras
    # (train.py:101-107, get_stamp_list).
    cams = train_cameras
    if stage == "coarse" and opt.zerostamp_init:
        t0 = cams[0][0].time
        cams = [c for c in cams if abs(c[0].time - t0) < 1e-9]

    cam_arrays = [CameraArrays.from_camera(c) for c, _ in cams]
    # uint8 HWC, float CHW, or lazy callables (data.dynerf.ImageRef)
    gt_list = [g if callable(g) else np.asarray(g) for _, g in cams]

    densify_fn, prune_fn, reset_fn = make_maintenance(cfg)
    train_steps: dict[int, Callable] = {}
    train_scans: dict[tuple, Callable] = {}
    budget_growths = 0

    stack: list[int] = []
    log = TrainLog()
    B = opt.batch_size
    if mesh is not None and B % mesh.shape["data"] != 0:
        # the camera batch shards over 'data'; round up rather than pad with
        # duplicate cameras (a bigger batch keeps the loss semantics exact)
        B = -(-B // mesh.shape["data"]) * mesh.shape["data"]
        print(f"[mesh] batch_size {opt.batch_size} -> {B} "
              f"(multiple of data axis {mesh.shape['data']})")

    # FineSampler (utils/loader_utils.py:23-52): temporally-correlated epoch
    # ordering with replay, for camera-major multi-view video datasets
    # (opt.custom_sampler, train.py:96-100). n_poses inferred from distinct
    # camera centers.
    fine_order: list[int] = []
    use_fine = opt.custom_sampler in ("fine", "FineSampler", True)
    n_poses = 0
    if use_fine:
        centers = {tuple(np.round(c.camera_center, 5)) for c, _ in cams}
        n_poses = max(len(centers), 1)
        use_fine = len(cams) % n_poses == 0 and n_poses < len(cams)
        if not use_fine:
            # The reference's FineSampler is an explicit opt-in
            # (utils/loader_utils.py:23-52); never decline it silently —
            # warn when the camera-major inference fails.
            print(
                f"[sampler] WARNING: custom_sampler={opt.custom_sampler!r} "
                f"requested but the camera-major layout could not be "
                f"inferred ({len(cams)} cameras, {n_poses} distinct "
                f"centers); falling back to random-stack sampling"
            )

    def draw_batch() -> list[int]:
        nonlocal stack, fine_order
        idx = []
        if use_fine:
            from fourdgs_tpu.data.samplers import fine_sampler_order

            for _ in range(B):
                if not fine_order:
                    fine_order = fine_sampler_order(len(cams), n_poses, rng)
                idx.append(fine_order.pop(0))
            return idx
        # default: random pop without replacement, stack refilled
        # (train.py:166-177)
        for _ in range(B):
            if not stack:
                stack = list(range(len(cams)))
            idx.append(stack.pop(rng.randrange(len(stack))))
        return idx

    # Native prefetch (data.fastloader): when GT images are lazy path-backed
    # refs, batch t+1 decodes on C++ threads while step t runs on the TPU —
    # the reference's DataLoader num_workers role (train.py:91-94).
    prefetcher = None
    if gt_list and callable(gt_list[0]) and hasattr(gt_list[0], "path"):
        from fourdgs_tpu.data.fastloader import PrefetchPool

        prefetcher = PrefetchPool(n_threads=8)

    # Device-resident camera/GT caches: when every GT is an in-memory array
    # that fits HBM, per-iteration host→device traffic shrinks from
    # (camera matrices + a full image upload) to ONE [B] int32 index — the
    # remote-attached TPU pays per-transfer latency, so this is worth
    # several ms/step. Lazy/video datasets (callable refs) and mesh runs
    # keep the streaming path.
    GT_CACHE_CAP = 2 << 30
    cams_dev = None
    gt_cache = None
    if mesh is None and gt_list and not any(callable(g) for g in gt_list):
        if sum(g.nbytes for g in gt_list) <= GT_CACHE_CAP:
            cams_dev = jax.tree.map(lambda *xs: jnp.stack(xs), *cam_arrays)
            tile_ok = (cfg.opt.lambda_dssim == 0
                       or (height % 16 == 0 and width % 16 == 0))
            if tile_ok and gt_list[0].dtype == np.uint8:
                # pre-tile to channel-major [T, 3, 256] uint8 blocks: the
                # tile-space loss consumes them directly and the in-jit
                # image→tile relayout (~3.7 ms/step at 800×800) disappears
                gt_cache = jnp.asarray(np.stack(
                    [losses.tile_image_np(g) for g in gt_list]
                ))
            else:
                gt_cache = jnp.asarray(np.stack(gt_list))

    pending_idx = draw_batch()
    if prefetcher:
        prefetcher.submit_batch([gt_list[i] for i in pending_idx])

    # active_sh_degree tracked HOST-side: it changes only on the 1000-iter
    # annealing cadence (train.py:149-150), so pulling it from the device
    # every step (a device→host sync serializing dispatch — the very
    # throttling this loop exists to avoid) is never necessary. The device
    # copy in ``state`` is still updated for checkpoint fidelity.
    sh_deg = int(state.active_sh_degree)
    spatial_lr = float(state.spatial_lr_scale)

    # -- debug/progress/viewer render path: separate jitted renders, built
    # lazily per (stage, resolution, sh degree) and invoked only on their
    # (sparse) cadences so the hot step stays image-output-free.
    _dbg_cache: dict[tuple, Callable] = {}
    _t_start = time.time()

    def _aux_render(cur_state, cam_arr, w, h):
        key_ = (w, h, sh_deg)
        if key_ not in _dbg_cache:
            bg = jnp.array([1.0, 1.0, 1.0] if cfg.model.white_background
                           else [0.0, 0.0, 0.0])

            def f(params, st, cam, _w=w, _h=h, _sh=sh_deg):
                out = render(params, st, cam, cfg, _w, _h, stage, bg, _sh)
                return out.color, out.depth
            _dbg_cache[key_] = jax.jit(f)
        return _dbg_cache[key_](cur_state.params, cur_state, cam_arr)

    def _gt_np(g):
        g = np.asarray(g() if callable(g) else g)
        if g.dtype == np.uint8:
            g = g.astype(np.float32).transpose(2, 0, 1) / 255.0
        return g[:3]

    # -- fused multi-step dispatch (cfg.tpu.scan_steps): when the GT lives in
    # the device cache and nothing host-side needs per-iteration values, run
    # up to scan_steps iterations as ONE jitted lax.scan program
    # (make_train_scan) — the remote-attached TPU pays ~2-3 ms dispatch
    # latency per call, which a 30 ms step cannot hide. Chunks are clamped so
    # no host gate (logging, SH annealing, densify/prune/reset cadence,
    # budget check, debug imagery) ever falls strictly inside a chunk.
    scan_ok = (
        cfg.tpu.scan_steps > 1 and mesh is None and gt_cache is not None
        and gradient_tracker is None and viewer is None
    )

    def _gate_after(j: int) -> bool:
        """Host work required immediately after step j completes."""
        due = (
            j % log_interval == 0 or j in extra_log_iters or j == train_iter
            or j % opt.densification_interval == 0
        )
        if j < opt.densify_until_iter:
            due = (due or j % opt.pruning_interval == 0
                   or j % opt.opacity_reset_interval == 0)
        if debug_mode and j % 100 == 0:
            due = True
        if cfg.model.render_process and debug_images_due(j):
            due = True
        return due

    def _gate_before(j: int) -> bool:
        """Host work required immediately before step j runs."""
        return j % 1000 == 0  # SH annealing (train.py:149-150)

    iteration = 0
    while iteration < train_iter:
        iteration += 1
        if viewer is not None:
            def _viewer_render(vcam):
                color, _ = _aux_render(
                    state, CameraArrays.from_camera(vcam),
                    vcam.width, vcam.height,
                )
                return np.asarray(color)
            viewer.poll(_viewer_render, source_path,
                        training_done=iteration == train_iter)
        if timer:
            timer.start_iteration(iteration)
            timer.start_timer(f"{stage}_data_loading")
        # SH annealing every 1000 iters (train.py:149-150)
        if iteration % 1000 == 0:
            state = G.one_up_sh_degree(state, max_sh)
            sh_deg = min(sh_deg + 1, max_sh)

        # chunk length: longest run of steps with no host gate strictly inside
        n_chunk = 1
        if scan_ok:
            while (n_chunk < cfg.tpu.scan_steps
                   and iteration + n_chunk <= train_iter
                   and not _gate_after(iteration + n_chunk - 1)
                   and not _gate_before(iteration + n_chunk)):
                n_chunk += 1

        batch_idx = pending_idx
        if n_chunk > 1:
            chunk_idx = [batch_idx]
            for _ in range(n_chunk - 1):
                chunk_idx.append(draw_batch())
            pending_idx = draw_batch()
            if sh_deg not in train_scans:
                train_scans[sh_deg] = make_train_scan(
                    cfg, width, height, stage, sh_deg,
                    spatial_lr_scale=spatial_lr,
                )
            if timer:
                timer.end_timer(f"{stage}_data_loading")
                timer.start_timer(f"{stage}_render")
            idx_dev = jnp.asarray(np.asarray(chunk_idx, np.int32))
            new_params, adam_state, new_state, ms = train_scans[sh_deg](
                state.params, adam_state, state, cams_dev, gt_cache,
                idx_dev, iteration,
            )
            state = new_state._replace(params=new_params)
            metrics = {
                k: (jnp.max(v) if k in ("num_rendered", "max_tile_len")
                    else v[-1])
                for k, v in ms.items()
            }
            batch_idx = chunk_idx[-1]
            iteration += n_chunk - 1   # post-step host work sees the last it
        elif gt_cache is not None:
            idx_dev = jnp.asarray(np.asarray(batch_idx, np.int32))
            gts = jnp.take(gt_cache, idx_dev, axis=0)
            batch_cams = jax.tree.map(
                lambda x: jnp.take(x, idx_dev, axis=0), cams_dev
            )
            pending_idx = draw_batch()
        else:
            if prefetcher:
                gts_np = prefetcher.wait_batch()
            else:
                gts_np = np.stack([
                    g() if callable(g) else g
                    for g in (gt_list[i] for i in batch_idx)
                ])
            batch_cams = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[cam_arrays[i] for i in batch_idx]
            )
            pending_idx = draw_batch()
            if prefetcher:
                prefetcher.submit_batch([gt_list[i] for i in pending_idx])
            gts = jnp.asarray(gts_np)
        if n_chunk == 1:
            if gts.dtype == jnp.uint8 and mesh is not None:
                # the sharded trainer expects float CHW; the single-device
                # step converts uint8 inside the jit instead
                gts = gts.astype(jnp.float32).transpose(0, 3, 1, 2) / 255.0
            if timer:
                timer.end_timer(f"{stage}_data_loading")
                timer.start_timer(f"{stage}_render")

            if sh_deg not in train_steps:
                if mesh is not None:
                    train_steps[sh_deg] = ptrainer.make_sharded_train_step(
                        cfg, mesh, width, height, stage, sh_deg,
                        spatial_lr_scale=spatial_lr,
                    )
                else:
                    train_steps[sh_deg] = make_train_step(
                        cfg, width, height, stage, sh_deg,
                        spatial_lr_scale=spatial_lr,
                        track_grads=gradient_tracker is not None,
                    )
            if mesh is not None:
                batch_cams, gts = ptrainer.place_batch(mesh, batch_cams, gts)
            adam_state, state, metrics = _run_step(
                train_steps[sh_deg], state, adam_state, batch_cams, gts,
                iteration,
            )

        # debug panels every 100 iters (train.py:212-219) + progress frames
        # on the dense early schedule (train.py:325-331)
        if debug_mode and iteration % 100 == 0:
            from fourdgs_tpu.utils import debug_images

            color, _ = _aux_render(state, cam_arrays[batch_idx[0]],
                                   width, height)
            debug_images.save_debug_image(
                np.asarray(color), _gt_np(gt_list[batch_idx[0]]),
                stage, iteration, float(cam_arrays[batch_idx[0]].time),
                model_path,
            )
        if cfg.model.render_process and debug_images_due(iteration):
            from fourdgs_tpu.utils import debug_images

            color, depth = _aux_render(state, cam_arrays[batch_idx[0]],
                                       width, height)
            debug_images.render_training_image(
                np.asarray(color), _gt_np(gt_list[batch_idx[0]]),
                np.asarray(depth), stage, iteration,
                time.time() - _t_start, model_path,
            )

        # Instance-budget growth: the TPU pipeline uses a static duplicated-
        # instance budget; when demand approaches it, grow and recompile —
        # the design replacement for CUDA's dynamic num_rendered allocation
        # (SURVEY.md §7 hard parts). Checked on the densify cadence to avoid
        # per-step host syncs. Growth is GEOMETRIC (×2) with a hard per-stage
        # cap, so at most min(log₂ range, cap) recompiles can ever fire in a
        # run, and each growth is recorded to events.jsonl so wall-clock
        # artifacts are attributable (verdict r3 weak #6).
        if iteration % opt.densification_interval == 0:
            demand = int(metrics["num_rendered"])
            budget = cfg.tpu.instance_budget
            if demand > 0.7 * budget and budget < cfg.tpu.instance_budget_max:
                if budget_growths >= _MAX_BUDGET_GROWTHS:
                    if budget_growths == _MAX_BUDGET_GROWTHS:
                        budget_growths += 1
                        print(
                            f"[budget] growth cap ({_MAX_BUDGET_GROWTHS}) "
                            f"reached at {stage} it {iteration}; demand "
                            f"{demand} stays on budget {budget} (overflow "
                            "drops instances rather than recompiling)"
                        )
                else:
                    # chase demand with 1.6× headroom, but never more than
                    # 4× in one growth: a transient demand spike (e.g. the
                    # untrained deformation heads inflating scales at
                    # fine-stage start) must not permanently commit the
                    # run to a huge-K program — overflow truncation drops
                    # the deepest instances gracefully until demand
                    # normalizes or the next growth fires.
                    new_budget = min(
                        max(budget * 2, int(demand * 1.6)), budget * 4,
                        max(cfg.tpu.instance_budget_max, budget),
                    )
                    new_budget = -(-new_budget // 65536) * 65536
                    cfg.tpu.instance_budget = new_budget
                    train_steps.clear()
                    train_scans.clear()
                    budget_growths += 1
                    print(
                        f"[budget] instances {demand} > 70% of {budget}; "
                        f"growing to {new_budget} (recompile "
                        f"{budget_growths}/{_MAX_BUDGET_GROWTHS})"
                    )
                    if event_log is not None:
                        event_log.add_scalar(
                            "budget/demand", demand, iteration
                        )
                        event_log.add_scalar(
                            "budget/instance_budget", new_budget, iteration
                        )
        if gradient_tracker is not None:
            grad_stats = metrics.pop("grad_stats", None)
            metrics.pop("vs_grad_norm", None)
            if iteration % gradient_tracker.record_interval == 0:
                gradient_tracker.record(
                    iteration, stage, jax.tree.map(float, grad_stats)
                )
        if timer:
            timer.end_timer(f"{stage}_render")
            timer.start_timer(f"{stage}_densification")

        # Densification / pruning / opacity reset on the reference schedule.
        if iteration < opt.densify_until_iter:
            if stage == "coarse":
                opacity_threshold = opt.opacity_threshold_coarse
                densify_threshold = opt.densify_grad_threshold_coarse
            else:
                frac = iteration / opt.densify_until_iter
                opacity_threshold = opt.opacity_threshold_fine_init - frac * (
                    opt.opacity_threshold_fine_init - opt.opacity_threshold_fine_after
                )
                densify_threshold = opt.densify_grad_threshold_fine_init - frac * (
                    opt.densify_grad_threshold_fine_init - opt.densify_grad_threshold_after
                )
            size_on = jnp.asarray(iteration > opt.opacity_reset_interval)
            densify_due = (
                iteration > opt.densify_from_iter
                and iteration % opt.densification_interval == 0
            )
            prune_due = (
                iteration > opt.pruning_from_iter
                and iteration % opt.pruning_interval == 0
            )
            # host sync on the live point count only when a gate needs it
            n_points = (
                int(metrics["n_points"]) if (densify_due or prune_due) else 0
            )
            reset_due = iteration % opt.opacity_reset_interval == 0
            if ((densify_due and n_points < 360_000)
                    or (prune_due and n_points > 200_000) or reset_due):
                _prim_resharded(False)
            # Capacity growth: when densification has filled 60% of the
            # current [P]-array capacity, double it toward cfg.tpu.capacity
            # BEFORE densifying so clone/split always see free slots. A
            # host-side pad + shape-retrace; ≤ log2(capacity/init) per run.
            # Gated on the same n_points < 360_000 condition as densify so
            # the growth always runs inside the _prim_resharded(False)/(True)
            # bracket (growth past the densify cap would be useless anyway
            # and, under shard_primitives, would leave the params replicated).
            cur_cap = state.params["xyz"].shape[0]
            if (densify_due and n_points < 360_000
                    and n_points > 0.6 * cur_cap
                    and cur_cap < cfg.tpu.capacity):
                new_cap = min(cur_cap * 2, cfg.tpu.capacity)
                state, adam_state = G.grow_capacity(
                    state, adam_state, new_cap
                )
                if mesh is not None:
                    state = ptrainer.replicate(mesh, state)
                    adam_state = ptrainer.replicate(mesh, adam_state)
                print(f"[capacity] {n_points} alive > 60% of {cur_cap}; "
                      f"growing to {new_cap} (retrace)")
                if event_log is not None:
                    event_log.add_scalar(
                        "budget/capacity", new_cap, iteration
                    )
            if densify_due and n_points < 360_000:
                key, sub = jax.random.split(key)
                state, mu, nu, _ = densify_fn(
                    sub, state, adam_state.mu, adam_state.nu,
                    jnp.float32(densify_threshold),
                    jnp.float32(opacity_threshold),
                    jnp.float32(cameras_extent), size_on,
                )
                adam_state = adam_state._replace(mu=mu, nu=nu)
            if prune_due and n_points > 200_000:
                state, _ = prune_fn(
                    state, jnp.float32(opacity_threshold),
                    jnp.float32(cameras_extent), size_on,
                )
            if reset_due:
                state, mu, nu = reset_fn(state, adam_state.mu, adam_state.nu)
                adam_state = adam_state._replace(mu=mu, nu=nu)
            if ((densify_due and n_points < 360_000)
                    or (prune_due and n_points > 200_000) or reset_due):
                _prim_resharded(True)
        if timer:
            timer.end_timer(f"{stage}_densification")

        if (iteration % log_interval == 0 or iteration == train_iter
                or iteration in extra_log_iters):
            if timer:
                timer.start_timer(f"{stage}_logging")
            m = {k: float(v) for k, v in metrics.items()}
            log.ema_loss = 0.4 * m["loss"] + 0.6 * log.ema_loss
            log.ema_psnr = 0.4 * m["psnr"] + 0.6 * log.ema_psnr
            log.iterations.append({"iter": iteration, "stage": stage, **m})
            if timer:
                timer.log_iteration(
                    iteration=iteration, loss=m["loss"], psnr=m["psnr"],
                    l1_loss=m["l1"], stage=stage,
                    total_points=int(m["n_points"]),
                    ema_loss=log.ema_loss, ema_psnr=log.ema_psnr,
                )
            if log_fn:
                log_fn(iteration, stage, m, state, adam_state)
            if np.isnan(m["loss"]):
                # NaN watchdog (train.py:263-265) — surface it, don't
                # re-exec; first dump a replayable snapshot of the
                # rasterizer inputs (parity with the reference's
                # snapshot_fw.dump forensics,
                # diff_gaussian_rasterization/__init__.py:83-90).
                from fourdgs_tpu.utils import forensics

                snap = forensics.dump_snapshot(
                    model_path, f"nan_{stage}_{iteration}",
                    state.params, state=state,
                    cams=batch_cams if n_chunk == 1 else None,
                    metrics=m,
                    extra={
                        "iteration": iteration,
                        "instance_budget": cfg.tpu.instance_budget,
                        "capacity": state.params["xyz"].shape[0],
                        "batch_idx": np.asarray(batch_idx),
                    },
                )
                raise FloatingPointError(
                    f"loss is NaN at {stage} iteration {iteration}"
                    + (f"; forensic snapshot: {snap}" if snap else "")
                )
            if timer:
                timer.end_timer(f"{stage}_logging")
        if timer:
            timer.end_iteration(iteration, stage)

    # hand back replicated arrays (checkpointing and any follow-on stage
    # start from the replicated layout)
    _prim_resharded(False)
    return state, adam_state, log


def _run_step(step_fn, state, adam_state, batch_cams, gts, iteration):
    """Invoke the jitted step; params threaded explicitly through state."""
    new_params, new_adam, new_state, metrics = step_fn(
        state.params, adam_state, state, batch_cams, gts, iteration
    )
    return new_adam, new_state._replace(params=new_params), metrics
