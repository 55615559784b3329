"""Pallas TPU tile-blend kernels: the hot path of the rasterizer.

TPU-native replacement for the CUDA forward/backward render kernels
(reference cuda_rasterizer/forward.cu:261-409, backward.cu:398-557). Design:

- The binning stage leaves a **flat, depth-sorted, tile-grouped COMPACT
  payload** ``feat [16, K]`` (attribute-major) in HBM. Tile t owns instances
  [start_t, stop_t) with **no alignment padding** — the payload, and with it
  every per-instance XLA op (sort, gather, gradient scatter), is sized by the
  true instance demand, not a chunk-padded layout. The kernels instead DMA
  CHUNK-aligned *windows* [⌊start/CHUNK⌋·CHUNK, stop) and mask the out-of-range
  lanes, trading a few masked lanes per tile for a ~1.5× smaller payload.
- The forward kernel runs a 1-D grid over tiles. Each program DMAs its
  window in CHUNK-instance chunks, evaluates α for all 16×16 = 256 pixels at
  once (pixels on sublanes, instances on lanes), composes transmittance with
  a Hillis-Steele prefix product along the lane axis (the associative-scan
  form of the CUDA serial loop), and early-exits once every pixel saturates
  (T < 1e-4, forward.cu:352-354). Work ∝ actual instance counts.
- The backward kernel re-walks the same chunks front-to-back, recovering the
  suffix sums S_i = C_total − prefix_i (the associative form of the CUDA
  back-to-front accum_rec recurrence, backward.cu:442-522) and accumulates
  per-instance gradients into a flat [16, K] buffer. Because a boundary chunk
  is shared by two consecutive tiles, gradient chunks are accumulated
  read-modify-write; the TPU grid is sequential (dimension_semantics
  "arbitrary"), so this is race-free — the deterministic replacement for the
  CUDA atomicAdd (backward.cu:523-554). The buffer is zero-initialised via
  input/output aliasing, and per-Gaussian reduction is a plain XLA
  scatter-add outside the kernel.

feat rows (f32): 0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity 6:r 7:g 8:b
9:depth 10..15:pad. Per-tile output block: [256 pixels, 8] with columns
0-2 = pre-background color sum, 3 = depth sum, 4 = final transmittance.
Gradient feat rows mirror the payload layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourdgs_tpu.ops import constants as C

N_PIX = C.TILE_X * C.TILE_Y  # 256
FEAT_ROWS = 16
OUT_COLS = 8
CHUNK = 128  # instances per chunk == DMA window alignment (lane-dim multiple)


def _shift_right(x, s, fill):
    """result[:, i] = x[:, i-s] for i >= s else fill (lane axis)."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < s, fill, rolled)


def _prefix_prod(x):
    """Hillis-Steele inclusive prefix product along the lane axis."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x * _shift_right(x, s, 1.0)
        s *= 2
    return x


def _prefix_sum(x):
    """Hillis-Steele inclusive prefix sum along the lane axis."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + _shift_right(x, s, 0.0)
        s *= 2
    return x


def _pixel_coords(t, grid_x, row_offset=0):
    """Pixel-center coordinates of tile t: ([256,1], [256,1]) floats.

    ``row_offset`` shifts the tile row — used by the tile-row-sharded
    multi-chip path where each device rasterizes a horizontal slab of the
    image but tile indices are slab-local (fourdgs_tpu.parallel.sp).
    """
    tx = t % grid_x
    ty = t // grid_x + row_offset
    sub = jax.lax.broadcasted_iota(jnp.int32, (N_PIX, 1), 0)
    pxf = (tx * C.TILE_X + sub % C.TILE_X).astype(jnp.float32)
    pyf = (ty * C.TILE_Y + sub // C.TILE_X).astype(jnp.float32)
    return pxf, pyf


def _chunk_alpha(buf, pxf, pyf, off, start, stop):
    """α [256, CH] for one chunk (exact CUDA gating, forward.cu:340-354).

    ``off`` is the chunk's global instance offset; lanes outside the tile's
    [start, stop) range are masked (the window-alignment lanes).
    Returns (alpha_capped, alpha_raw, exp_power, keep, dx, dy).
    """
    x = buf[0:1, :]
    y = buf[1:2, :]
    ca = buf[2:3, :]
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[5:6, :]
    dx = pxf - x                      # [256, CH]
    dy = pyf - y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    exp_power = jnp.exp(power)
    alpha_raw = op * exp_power
    alpha = jnp.minimum(alpha_raw, C.ALPHA_CAP)
    lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    g = off + lane
    keep = (
        (power <= 0.0)
        & (alpha >= C.ALPHA_FLOOR)
        & (g >= start)
        & (g < stop)
    )
    return jnp.where(keep, alpha, 0.0), alpha_raw, exp_power, keep, dx, dy


def make_forward(grid_x: int, num_tiles: int, k_pad: int,
                 interpret: bool = False, feat_dtype=jnp.float32):
    """Forward pallas_call: (starts, stops, feat) → out [T, 256, 8].

    ``feat_dtype`` may be bfloat16: payload DMA/gather bytes halve; all
    in-kernel math stays float32 (upcast after load)."""

    def kernel(starts_ref, stops_ref, row_ref, feat_ref, out_ref, buf, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        stop = stops_ref[t]
        pxf, pyf = _pixel_coords(t, grid_x, row_ref[0])
        off0 = (start // CHUNK) * CHUNK
        n_chunks = jnp.where(stop > start, pl.cdiv(stop - off0, CHUNK), 0)

        def cond(carry):
            c, T_v, _, _, _, _ = carry
            return (c < n_chunks) & (jnp.max(T_v) >= C.T_STOP)

        def body(carry):
            c, T_v, col_r, col_g, col_b, dep = carry
            off = pl.multiple_of(off0 + c * CHUNK, CHUNK)
            cp = pltpu.make_async_copy(
                feat_ref.at[:, pl.ds(off, CHUNK)], buf, sem
            )
            cp.start()
            cp.wait()
            cur = buf[:].astype(jnp.float32)
            alpha, _, _, _, _, _ = _chunk_alpha(
                cur, pxf, pyf, off, start, stop
            )
            one_minus = 1.0 - alpha
            p_incl = _prefix_prod(one_minus)                    # [256, CH]
            t_incl = T_v * p_incl
            t_excl = T_v * _shift_right(p_incl, 1, 1.0)
            contrib = t_incl >= C.T_STOP
            w = jnp.where(contrib, alpha * t_excl, 0.0)
            r = cur[6:7, :]
            g = cur[7:8, :]
            b = cur[8:9, :]
            z = cur[9:10, :]
            col_r = col_r + jnp.sum(w * r, axis=1, keepdims=True)
            col_g = col_g + jnp.sum(w * g, axis=1, keepdims=True)
            col_b = col_b + jnp.sum(w * b, axis=1, keepdims=True)
            dep = dep + jnp.sum(w * z, axis=1, keepdims=True)
            # product over contributing factors == p_incl at the last
            # contributing lane; p_incl is monotone non-increasing, so the
            # masked min computes it (Mosaic has no reduce_prod)
            T_new = T_v * jnp.min(
                jnp.where(contrib, p_incl, 1.0), axis=1, keepdims=True
            )
            return c + 1, T_new, col_r, col_g, col_b, dep

        zero = jnp.zeros((N_PIX, 1), jnp.float32)
        init = (jnp.int32(0), jnp.ones((N_PIX, 1), jnp.float32),
                zero, zero, zero, zero)
        _, T_fin, col_r, col_g, col_b, dep = jax.lax.while_loop(
            cond, body, init
        )
        out_ref[0] = jnp.concatenate(
            [col_r, col_g, col_b, dep, T_fin,
             jnp.zeros((N_PIX, OUT_COLS - 5), jnp.float32)],
            axis=1,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, N_PIX, OUT_COLS), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((FEAT_ROWS, CHUNK), feat_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, N_PIX, OUT_COLS), jnp.float32
        ),
        interpret=interpret,
    )


def make_backward(grid_x: int, num_tiles: int, k_pad: int,
                  interpret: bool = False, feat_dtype=jnp.float32):
    """Backward pallas_call: cotangents + saved outputs → per-instance grads.

    dα math (matches backward.cu:442-522 + the background/alpha term):
      dL/dc_i   = w_i · g_col
      dL/dα_i   = T_i·(c_i·g_col + z_i·g_dep)
                  − (S_i·g_col + S_i^z·g_dep + T_fin·g_Tfin)/(1−α_i)
      with suffix sums S_i = C_total − Σ_{j≤i} c_j w_j.
      dL/dpower = α_raw · dL/dα  (uncapped, as the CUDA backward)
      dL/dop    = exp(power)·dL/dα;  conic/mean grads via dpower.

    Boundary chunks shared between consecutive tiles are accumulated
    read-modify-write against the zero-initialised aliased output.
    """

    def kernel(starts_ref, stops_ref, row_ref, feat_ref, outsv_ref, gout_ref,
               dzero_ref, dfeat_ref, buf, dbuf, sem, rsem, wsem):
        del dzero_ref  # aliased with dfeat_ref; only the output ref is used
        t = pl.program_id(0)
        start = starts_ref[t]
        stop = stops_ref[t]
        pxf, pyf = _pixel_coords(t, grid_x, row_ref[0])
        off0 = (start // CHUNK) * CHUNK
        n_chunks = jnp.where(stop > start, pl.cdiv(stop - off0, CHUNK), 0)

        c_tot_r = outsv_ref[0, :, 0:1]
        c_tot_g = outsv_ref[0, :, 1:2]
        c_tot_b = outsv_ref[0, :, 2:3]
        d_tot = outsv_ref[0, :, 3:4]
        t_fin = outsv_ref[0, :, 4:5]
        g_r = gout_ref[0, :, 0:1]
        g_g = gout_ref[0, :, 1:2]
        g_b = gout_ref[0, :, 2:3]
        g_d = gout_ref[0, :, 3:4]
        g_T = gout_ref[0, :, 4:5]

        def body(c, carry):
            T_v, a_r, a_g, a_b, a_d = carry
            off = pl.multiple_of(off0 + c * CHUNK, CHUNK)
            cp = pltpu.make_async_copy(
                feat_ref.at[:, pl.ds(off, CHUNK)], buf, sem
            )
            cp.start()
            # overlap the payload read with the gradient-chunk read
            rp = pltpu.make_async_copy(
                dfeat_ref.at[:, pl.ds(off, CHUNK)], dbuf, rsem
            )
            rp.start()
            cp.wait()
            fbuf = buf[:].astype(jnp.float32)
            alpha, alpha_raw, exp_power, keep, dx, dy = _chunk_alpha(
                fbuf, pxf, pyf, off, start, stop
            )
            one_minus = 1.0 - alpha
            p_incl = _prefix_prod(one_minus)
            t_incl = T_v * p_incl
            t_excl = T_v * _shift_right(p_incl, 1, 1.0)
            contrib = t_incl >= C.T_STOP
            w = jnp.where(contrib, alpha * t_excl, 0.0)   # [256, CH]

            r = fbuf[6:7, :]
            g = fbuf[7:8, :]
            b = fbuf[8:9, :]
            z = fbuf[9:10, :]
            pw_r = _prefix_sum(w * r) + a_r
            pw_g = _prefix_sum(w * g) + a_g
            pw_b = _prefix_sum(w * b) + a_b
            pw_d = _prefix_sum(w * z) + a_d
            s_r = c_tot_r - pw_r       # suffix sums AFTER instance i
            s_g = c_tot_g - pw_g
            s_b = c_tot_b - pw_b
            s_d = d_tot - pw_d

            inv_om = 1.0 / jnp.maximum(one_minus, 1e-6)
            dalpha_px = (
                t_excl * (r * g_r + g * g_g + b * g_b + z * g_d)
                - inv_om * (s_r * g_r + s_g * g_g + s_b * g_b + s_d * g_d)
                - inv_om * t_fin * g_T
            )
            # skipped instances get no gradient (CUDA re-applies skip gates)
            dalpha_px = jnp.where(contrib & keep, dalpha_px, 0.0)
            dpower_px = alpha_raw * dalpha_px
            ca = fbuf[2:3, :]
            cb = fbuf[3:4, :]
            cc = fbuf[4:5, :]
            d_op = jnp.sum(exp_power * dalpha_px, axis=0, keepdims=True)
            d_a = jnp.sum(-0.5 * dx * dx * dpower_px, axis=0, keepdims=True)
            d_b = jnp.sum(-dx * dy * dpower_px, axis=0, keepdims=True)
            d_c = jnp.sum(-0.5 * dy * dy * dpower_px, axis=0, keepdims=True)
            d_x = jnp.sum((ca * dx + cb * dy) * dpower_px, axis=0,
                          keepdims=True)
            d_y = jnp.sum((cc * dy + cb * dx) * dpower_px, axis=0,
                          keepdims=True)
            d_r = jnp.sum(w * g_r, axis=0, keepdims=True)
            d_g = jnp.sum(w * g_g, axis=0, keepdims=True)
            d_b2 = jnp.sum(w * g_b, axis=0, keepdims=True)
            d_z = jnp.sum(w * g_d, axis=0, keepdims=True)
            zero = jnp.zeros_like(d_x)
            grads = jnp.concatenate(
                [d_x, d_y, d_a, d_b, d_c, d_op, d_r, d_g, d_b2, d_z,
                 zero, zero, zero, zero, zero, zero], axis=0)
            rp.wait()
            dbuf[:, :] = dbuf[:, :] + grads
            wp = pltpu.make_async_copy(
                dbuf, dfeat_ref.at[:, pl.ds(off, CHUNK)], wsem
            )
            wp.start()
            wp.wait()

            T_new = T_v * jnp.min(
                jnp.where(contrib, p_incl, 1.0), axis=1, keepdims=True
            )
            return (T_new, pw_r[:, -1:], pw_g[:, -1:], pw_b[:, -1:],
                    pw_d[:, -1:])

        zero = jnp.zeros((N_PIX, 1), jnp.float32)
        init = (jnp.ones((N_PIX, 1), jnp.float32), zero, zero, zero, zero)
        jax.lax.fori_loop(0, n_chunks, body, init)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # feat
            pl.BlockSpec(
                (1, N_PIX, OUT_COLS), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                       # saved outputs
            pl.BlockSpec(
                (1, N_PIX, OUT_COLS), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                       # cotangents
            pl.BlockSpec(memory_space=pltpu.ANY),    # dfeat zeros (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # dfeat [16, K]
        scratch_shapes=[
            pltpu.VMEM((FEAT_ROWS, CHUNK), feat_dtype),
            pltpu.VMEM((FEAT_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT_ROWS, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # sequential grid: the RMW
            # boundary-chunk accumulation relies on tile order
        ),
        # operand order: 3 prefetch scalars, feat, outsv, gout, dzeros → the
        # zeros buffer (index 6) aliases the dfeat output so accumulation
        # starts from zero
        input_output_aliases={6: 0},
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper over (feat, starts, stops) → per-tile output blocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_pallas(feat, starts, stops, row_off, grid_x: int, num_tiles: int,
                 k_pad: int, interpret: bool = False):
    """feat [16,K], starts/stops [T], row_off [1] → out [T, 256, 8]."""
    return make_forward(grid_x, num_tiles, k_pad, interpret, feat.dtype)(
        starts, stops, row_off, feat
    )


def _blend_fwd(feat, starts, stops, row_off, grid_x, num_tiles, k_pad,
               interpret=False):
    out = make_forward(grid_x, num_tiles, k_pad, interpret, feat.dtype)(
        starts, stops, row_off, feat
    )
    return out, (feat, starts, stops, row_off, out)


def _blend_bwd(grid_x, num_tiles, k_pad, interpret, res, g_out):
    import numpy as np

    feat, starts, stops, row_off, out = res
    dzero = jnp.zeros((FEAT_ROWS, k_pad), jnp.float32)
    dfeat = make_backward(grid_x, num_tiles, k_pad, interpret, feat.dtype)(
        starts, stops, row_off, feat, out, g_out, dzero
    )
    # cotangent dtype must match the primal (bf16 payload mode)
    dfeat = dfeat.astype(feat.dtype)
    # integer operands carry symbolic-zero float0 cotangents
    zero_of = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return dfeat, zero_of(starts), zero_of(stops), zero_of(row_off)


blend_pallas.defvjp(_blend_fwd, _blend_bwd)
