"""Pallas TPU tile-blend kernels: the hot path of the rasterizer.

TPU-native replacement for the CUDA forward/backward render kernels
(reference cuda_rasterizer/forward.cu:261-409, backward.cu:398-557). Design:

- The binning stage leaves a **flat, depth-sorted, tile-grouped COMPACT
  payload** ``feat [16, K]`` (attribute-major) in HBM. Tile t owns instances
  [start_t, stop_t) with **no alignment padding** — the payload, and with it
  every per-instance XLA op (sort, gather, gradient scatter), is sized by the
  true instance demand, not a chunk-padded layout. For the kernels it is
  re-laid out into CHUNK-sized blocks ([K/CHUNK+1, 16, CHUNK],
  :func:`to_blocked`); each tile's windows start at ⌊start/ALIGN⌋·ALIGN
  (ALIGN=8): a chunk DMAs its covering block *pair* and extracts the
  contiguous [16, CHUNK] window with a dynamic lane roll. 128-aligned
  windows wasted ~½ chunk of masked lanes per tile (measured 4098 → 3173
  processed chunks on the bench scene); 8-alignment leaves ≤7.
- **MXU prefix scans.** The CUDA kernel's serial per-pixel transmittance
  recurrence (forward.cu:340-360) is an associative scan. Instead of a
  Hillis-Steele roll chain (log₂·CHUNK VPU passes over [256, CHUNK]), both
  kernels compute prefix quantities as a single [256,CHUNK]×[CHUNK,CHUNK]
  triangular matmul on the MXU — transmittance in log space
  (T_excl = T·exp(Σ_{j<i} log(1−α_j))), gradient suffix sums directly. The
  color accumulation Σᵢ wᵢ·(r,g,b,z)ᵢ is one [256,CHUNK]×[CHUNK,4] matmul.
  All matmuls run at Precision.HIGHEST (bf16x6 passes ≈ f32-exact).
- **Pipelined DMA.** Tile ranges are contiguous in the payload
  (stop_t == start_{t+1}), so while a chunk is blended the next chunk —
  the tile's next window chunk, or across the tile boundary the next tile's
  first chunk — is already in flight into the other half of a 2-buffer ring
  (per-buffer DMA semaphores; ring state carried across grid steps in SMEM).
  The grid is sequential ("arbitrary"), which makes this exact.
- The forward kernel evaluates α for all 16×16 = 256 pixels at once (pixels
  on sublanes, instances on lanes) and early-exits a tile once every pixel
  saturates (T < 1e-4, forward.cu:352-354). Work ∝ actual instance counts.
- The backward kernel re-walks the same chunks front-to-back with the same
  early exit, recovering per-instance suffix sums via ONE combined scalar
  per pixel (S_comb = Σ_q S_q·g_q — the four per-channel suffix sums of
  backward.cu:442-522 collapse because the cotangents are per-pixel
  constants), and accumulates per-instance gradients into a blocked
  [K/CHUNK+1, 16, CHUNK] buffer through TWO rolling VMEM accumulators
  covering blocks [CURB, CURB+2): each window's grads split across them by
  a dynamic roll, and a block is flushed exactly once when every window
  over it has passed (window starts are monotone across the sequential
  grid) — the deterministic, race-free replacement for CUDA's atomicAdd
  (backward.cu:523-554). Untouched blocks keep the zero-initialised
  (input/output aliased) buffer; per-Gaussian reduction is a plain XLA
  scatter-add outside the kernel.

feat rows (f32 or bf16): 0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity
6:r 7:g 8:b 9:depth 10..15:pad (sublane alignment). Per-tile output block: [256 pixels, 8] with
columns 0-2 = pre-background color sum, 3 = depth sum, 4 = final
transmittance. Gradient feat rows mirror the payload layout.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourdgs_tpu.ops import constants as C

N_PIX = C.TILE_X * C.TILE_Y  # 256
FEAT_ROWS = 16  # 10 attrs + 6 pad rows (Mosaic DMA slices need
# sublane-aligned row counts: 8 for f32, 16 for bf16 payloads)
OUT_COLS = 8  # layout of the NumPy kernel simulations in tests
OUT5 = 5      # packed kernel output columns: r, g, b, depth, t_fin
# instances per chunk == DMA window alignment (lane-dim multiple).
# Env-overridable for perf experiments (bigger chunks amortize loop/DMA
# overhead but grow the per-instance triangular-scan matmul linearly).
CHUNK = int(os.environ.get("FOURDGS_BLEND_CHUNK", "128"))

# Matmul precision for the in-kernel scans. Mosaic supports only DEFAULT
# (bf16 single pass — too lossy for the log-transmittance sums) and
# HIGHEST (bf16x6, ~f32-exact) inside kernels; HIGH raises
# NotImplementedError at lowering. Keep HIGHEST.
_HI = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("FOURDGS_BLEND_PRECISION", "highest").lower()]


# Prefix-scan implementation inside the kernels:
#   "split2" (default): Dekker hi/lo bf16 split + two single-pass DEFAULT
#     matmuls — 3× less MXU time than HIGHEST with ~16-bit mantissa scan
#     accuracy (measured: +1.0 Mpx/s end-to-end; forward color error vs the
#     exact-f32 sim ≤ ~2e-4 under heavy saturation, gradient parity vs the
#     oracle stays within the 4e-3 test bar — the flagged accuracy trade).
#   "matmul": f32 triangular [256,CH]×[CH,CH] MXU matmul at HIGHEST
#     (bf16x6, ~f32-exact) — the strict-parity fallback.
#   "roll": Hillis-Steele lane-roll chain on the VPU (measured 2.4 Mpx/s
#     SLOWER on v5e — cross-lane permutes are expensive; kept for record).
_SCAN = os.environ.get("FOURDGS_BLEND_SCAN", "split2").lower()
# Cross-sublane reduction strategy in the backward kernel: "vpu" = ten
# jnp.sum sublane reductions; "mxu" = two lane-major [8,256]×[256,CH]
# moment/cotangent matmuls + per-lane fixups (lhs built lane-major so no
# per-chunk relayout is needed).
_REDUCE = os.environ.get("FOURDGS_BLEND_REDUCE", "vpu").lower()
# Chunk-final transmittance: "lane" = masked 128-lane min reduction;
# "mxu" = T_v·exp(Σ_contrib lg) via a tiny masked-log matmul (the contrib
# lanes form a prefix, so the masked log-sum IS the frozen-T semantic).
_TMIN = os.environ.get("FOURDGS_BLEND_TMIN", "lane").lower()
# Tiles processed per grid step. The sequential grid carries a fixed
# per-STEP pipeline cost (~0.35 µs/output block: block bookkeeping +
# revolving-buffer logistics), which at 2500 tiles is ~1 ms per kernel;
# batching TPS tiles into one step divides that floor by TPS. The DMA
# ring, T-stop early exit, and the backward's rolling block flush are
# per-tile state in SMEM/registers, so the fusion is purely structural.
TPS = int(os.environ.get("FOURDGS_BLEND_TPS", "2"))


def _t_new_mxu(lg, contrib, keep, T_v):
    """T after this chunk via MXU: T_v·exp(Σ_{kept∧contrib} log(1−α)).

    t_incl is monotone non-increasing along lanes, so contributing lanes
    form a prefix and the masked log-sum equals log(t_incl) at the last
    contributing lane — the value the lane-min otherwise extracts.
    Masked lanes have lg == 0 already (α == 0); the extra ∧keep guard is
    free. Single-pass bf16 hi/lo split like :func:`_scan_matmul`.
    """
    lg_m = jnp.where(contrib & keep, lg, 0.0)
    ones = jnp.ones((CHUNK, 8), jnp.bfloat16)
    hi = lg_m.astype(jnp.bfloat16)
    lo = (lg_m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = lambda a: jax.lax.dot_general(
        a, ones, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    s = mm(hi) + mm(lo)
    return T_v * jnp.exp(s[:, 0:1])


def _scan_matmul(x, tri):
    """x @ tri (the prefix-scan contraction) under the _SCAN strategy.

    "matmul": f32 operands at HIGHEST — bf16x6, ~f32-exact, 6 MXU passes.
    "split2": Dekker two-term split — hi = bf16(x), lo = bf16(x − hi) —
    and TWO single-pass bf16 matmuls at DEFAULT. tri is exactly 0/1, so
    products are exact and the f32 accumulator sees x to ~16 mantissa
    bits: scan error ≤ |Σx|·2⁻¹⁶ (for the log-transmittance scan the live
    range |Σlg| ≤ −ln(T_STOP) ≈ 9.2 bounds it at ~1.4e-4). 3× less MXU
    time than HIGHEST on the kernels' dominant op.
    """
    if _SCAN == "split2":
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        tri_bf = tri.astype(jnp.bfloat16)
        mm = lambda a: jax.lax.dot_general(
            a, tri_bf, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        return mm(hi) + mm(lo)
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _prefix_prod_incl_roll(x):
    """Per-lane inclusive product scan via 7 static lane rolls (VPU)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < CHUNK:
        x = x * jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 1.0)
        k *= 2
    return x


def _prefix_sum_incl_roll(x):
    """Per-lane inclusive sum scan via 7 static lane rolls (VPU)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < CHUNK:
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 0.0)
        k *= 2
    return x


def _tri_excl():
    """[CHUNK, CHUNK] strictly-upper-triangular ones: x @ tri = exclusive
    prefix sum of x along the lane axis (cum[i] = Σ_{j<i} x[j])."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (i < j).astype(jnp.float32)


def _pixel_coords(t, grid_x, row_offset=0, row_stride=1):
    """Pixel-center coordinates of tile t: ([256,1], [256,1]) floats.

    ``row_offset``/``row_stride`` map the slab-local tile row j to the
    global row offset + j*stride — the tile-row-sharded multi-chip path
    (stride == n_shards is the load-balanced interleaved assignment,
    fourdgs_tpu.parallel.trainer).
    """
    tx = t % grid_x
    ty = (t // grid_x) * row_stride + row_offset
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


def _transmittance(alpha, T_v, tri_x):
    """Per-lane exclusive/inclusive transmittance scan.

    "matmul": MXU log-space scan — masked lanes (α=0) contribute log(1)=0;
    α ≤ ALPHA_CAP=0.99 keeps log(1−α) ≥ log(0.01): well-conditioned.
    "roll": direct multiplicative Hillis-Steele scan of (1−α) — masked
    lanes contribute factor 1; no transcendentals, no MXU.
    Returns (t_excl, t_incl, one_minus).
    """
    one_minus = 1.0 - alpha
    if _SCAN == "roll":
        q = _prefix_prod_incl_roll(one_minus)
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        q_excl = jnp.where(lane >= 1, pltpu.roll(q, 1, axis=1), 1.0)
        t_excl = T_v * q_excl
        t_incl = t_excl * one_minus
        return t_excl, t_incl, one_minus, None
    lg = jnp.log(one_minus)
    cum_x = _scan_matmul(lg, tri_x)
    t_excl = T_v * jnp.exp(cum_x)
    t_incl = t_excl * one_minus
    return t_excl, t_incl, one_minus, lg


ALIGN = 8  # window alignment in instances (sublane granularity of the
# blocked payload): per-tile windows start at ⌊start/8⌋·8 instead of
# ⌊start/128⌋·128 — measured 4098 → 3173 processed chunks on the bench
# scene (mean tile range 97.4), i.e. −23% blend work vs 128-aligned
# windows, at the cost of a 2-block DMA + dynamic-roll extraction per chunk.


def to_blocked(feat: jnp.ndarray) -> jnp.ndarray:
    """[FEAT_ROWS, K] attribute-major → [K/CHUNK + 1, FEAT_ROWS, CHUNK]
    blocked layout (+1 zero slack block so any 8-aligned 128-wide window
    [off, off+128), off ≤ K−8, falls inside a legal block pair)."""
    rows, K = feat.shape
    nb = K // CHUNK
    blk = feat.reshape(rows, nb, CHUNK).transpose(1, 0, 2)
    return jnp.concatenate(
        [blk, jnp.zeros((1, rows, CHUNK), feat.dtype)], axis=0
    )


def from_blocked(blk: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_blocked` (drops the slack block)."""
    nb1, rows, c = blk.shape
    return blk[:nb1 - 1].transpose(1, 0, 2).reshape(rows, (nb1 - 1) * c)


def _extract_window(pair, s):
    """[2, FEAT_ROWS, CHUNK] block pair → the contiguous f32
    [FEAT_ROWS, CHUNK] window starting s lanes into block 0
    (s ∈ [0, CHUNK], traced).

    dest lane d = source lane (d+s) mod CHUNK of block (d < CHUNK−s ? 0 : 1):
    one dynamic roll per block + a lane select. The upcast happens BEFORE
    the roll: Mosaic's tpu.dynamic_rotate handles 32-bit data only (the
    bf16-payload DMA savings are upstream of this, in HBM→VMEM traffic).
    """
    pair = pair.astype(jnp.float32)
    t = (CHUNK - s) % CHUNK
    r0 = pltpu.roll(pair[0], t, axis=1)
    r1 = pltpu.roll(pair[1], t, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, r0.shape, 1)
    return jnp.where(lane < CHUNK - s, r0, r1)


def make_forward(grid_x: int, num_tiles: int, k_pad: int,
                 interpret: bool = False, feat_dtype=jnp.float32):
    """Forward pallas_call: (starts, stops, row, bg, feat_blk) →
    packed [T, 256, 5] = (r, g, b, depth, t_fin), bg composited in-kernel.

    ``feat_blk`` is the blocked payload [k_pad/CHUNK + 1, FEAT_ROWS, CHUNK]
    (:func:`to_blocked`). Per-tile windows are ALIGN(=8)-aligned: each chunk
    DMAs the covering block pair and extracts the contiguous window with a
    dynamic roll — the misalignment waste of 128-aligned windows (~2 chunks
    per ~97-instance tile) drops to ≤7 masked lanes per tile.

    Everything rides ONE output block: per-tile pipeline cost on this
    grid is ~0.35 µs per *block* regardless of block width (measured
    2500-tile grid: 1 block 1.5 ms, 3 blocks 3.3 ms), so the packed
    layout beats separate color/depth/alpha outputs by ~2 ms/step at
    800×800 — and the training loss consumes the packed block directly
    (column-masked against a 5-wide tiled GT), so no slice/pad ever
    materializes around the custom VJP.

    ``feat_dtype`` may be bfloat16: payload DMA/gather bytes halve; all
    in-kernel math stays float32 (upcast after load)."""

    assert num_tiles % TPS == 0, (num_tiles, TPS)
    grid_n = num_tiles // TPS

    def kernel(starts_ref, stops_ref, row_ref, bg_ref, feat_ref,
               out_ref, buf, sems, slot_ref):
        qstep = pl.program_id(0)

        def win_of(v):
            # Clamp so the block-pair DMA [off//CHUNK, off//CHUNK + 2) stays
            # within the (nb+1)-block payload even when trailing empty tiles
            # sit at tile_start == k_pad (instance-budget saturation).
            return jnp.minimum((v // ALIGN) * ALIGN, k_pad - ALIGN)

        def dma(off, slot):
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(off // CHUNK, 2)],
                buf.at[slot], sems.at[slot],
            )

        # DMA-ring invariant: entering tile t, buf[slot_ref] has one DMA in
        # flight targeting this tile's first window's block pair (for empty
        # tiles start==stop==start_{t+1}, so the invariant carries through).
        @pl.when(qstep == 0)
        def _():
            slot_ref[0] = 0
            dma(win_of(starts_ref[0]), 0).start()

        def do_tile(t, out_slot):
            start = starts_ref[t]
            stop = stops_ref[t]
            nxt_first = win_of(starts_ref[jnp.minimum(t + 1, num_tiles - 1)])
            pxf, pyf = _pixel_coords(t, grid_x, row_ref[0], row_ref[1])
            off0 = win_of(start)
            n_chunks = jnp.where(
                stop > start, pl.cdiv(stop - off0, CHUNK), 0
            )
            tri_x = _tri_excl()

            def cond(carry):
                c, _, T_v, _ = carry
                return (c < n_chunks) & (jnp.max(T_v) >= C.T_STOP)

            def body(carry):
                c, slot, T_v, cols = carry
                off = off0 + c * CHUNK
                nslot = 1 - slot
                # prefetch the next window chunk — or, past the tile
                # boundary, the next tile's first chunk — while blending
                noff = jnp.where(c + 1 < n_chunks, off + CHUNK, nxt_first)
                dma(noff, nslot).start()
                dma(off, slot).wait()
                cur = _extract_window(buf[slot], off % CHUNK)
                alpha, _, _, keep, _, _ = _chunk_alpha(
                    cur, pxf, pyf, off, start, stop
                )
                t_excl, t_incl, _, lg = _transmittance(alpha, T_v, tri_x)
                contrib = t_incl >= C.T_STOP
                w = jnp.where(contrib, alpha * t_excl, 0.0)
                # Σ_i w_i·(r,g,b,z)_i for all 256 pixels: one MXU matmul
                cols = cols + jax.lax.dot_general(
                    w, cur[6:10, :], (((1,), (1,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32,
                )
                if _TMIN == "mxu" and lg is not None:
                    T_new = _t_new_mxu(lg, contrib, keep, T_v)
                else:
                    # t_incl is monotone non-increasing along lanes; the
                    # masked min is the transmittance after the last
                    # contributing instance
                    T_new = jnp.min(
                        jnp.where(contrib, t_incl, T_v), axis=1,
                        keepdims=True,
                    )
                return c + 1, nslot, T_new, cols

            init = (jnp.int32(0), slot_ref[0],
                    jnp.ones((N_PIX, 1), jnp.float32),
                    jnp.zeros((N_PIX, 4), jnp.float32))
            c_fin, slot, T_fin, cols = jax.lax.while_loop(cond, body, init)

            # early exit: the in-flight chunk is a within-tile chunk we
            # will never blend — drain it, restore the invariant for t+1
            @pl.when(c_fin < n_chunks)
            def _():
                dma(jnp.int32(0), slot).wait()
                dma(nxt_first, slot).start()

            slot_ref[0] = slot

            bg_row = jnp.stack(
                [bg_ref[0], bg_ref[1], bg_ref[2]]
            ).reshape(1, 3)
            # CHANNEL-MAJOR packed output [OUT5, 256]: a [256, 5] minor dim
            # would pad to 128 lanes in HBM (25× physical inflation across
            # the output buffer, the backward's saved/cotangent reads, and
            # the whole loss chain — measured ~2.5 ms/step); [5, 256] pads
            # only 5→8 sublanes. One in-kernel transpose per tile.
            out_ref[out_slot] = jnp.transpose(jnp.concatenate(
                [cols[:, 0:3] + T_fin * bg_row, cols[:, 3:4], T_fin], axis=1
            ))

        for i in range(TPS):
            do_tile(qstep * TPS + i, i)

        @pl.when(qstep == grid_n - 1)
        def _():
            dma(jnp.int32(0), slot_ref[0]).wait()   # drain the ring

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (TPS, OUT5, N_PIX), lambda q, *_: (q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, FEAT_ROWS, CHUNK), feat_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, OUT5, N_PIX), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential grid: the DMA
            # ring state in SMEM relies on tile order
        ),
        interpret=interpret,
    )


def make_backward(grid_x: int, num_tiles: int, k_pad: int,
                  interpret: bool = False, feat_dtype=jnp.float32):
    """Backward pallas_call: cotangents + saved outputs → per-instance grads.

    dα math (matches backward.cu:442-522 + the background/alpha term):
      dL/dc_i   = w_i · g_col
      dL/dα_i   = T_i·combo_i − (S_i + T_fin·g_T)/(1−α_i)
      with combo_i = r_i·g_r + g_i·g_g + b_i·g_b + z_i·g_d and the COMBINED
      suffix sum S_i = Σ_q (C_tot,q − Σ_{j≤i} q_j w_j)·g_q — one prefix scan
      instead of four because the cotangents are per-pixel constants.
      dL/dpower = α_raw · dL/dα  (uncapped, as the CUDA backward)
      dL/dop    = exp(power)·dL/dα;  conic/mean grads via dpower.

    Windows are ALIGN(=8)-aligned like the forward's; gradient blocks are
    written exactly once: TWO rolling VMEM accumulators cover the blocked
    dfeat's blocks [CURB, CURB+2) — each chunk's grads split across them by
    a dynamic roll — and a block is flushed to HBM when every window over
    it has been processed (window starts are monotone non-decreasing across
    the sequential grid: start_{t+1} = stop_t ⇒ ⌊start_{t+1}/8⌋·8 ≥ the
    previous tile's last window start). This replaces CUDA's atomicAdd
    accumulation (backward.cu:523-554) race-free and deterministically.
    Untouched blocks keep the zero-initialised (input/output aliased)
    buffer.
    """

    # SMEM state indices: read-ring slot, lowest unflushed block, parity
    # (acc[PAR] covers CURB, acc[1-PAR] covers CURB+1), write-pending flags
    RSLOT, CURB, PAR, WP0, WP1 = 0, 1, 2, 3, 4

    assert num_tiles % TPS == 0, (num_tiles, TPS)
    grid_n = num_tiles // TPS

    def kernel(starts_ref, stops_ref, row_ref, bg_ref, feat_ref,
               outsv_ref, gout_ref,
               dzero_ref, dfeat_ref, buf, dbuf, rsems, wsems, st):
        del dzero_ref  # aliased with dfeat_ref; only the output ref is used
        qstep = pl.program_id(0)

        def win_of(v):
            # Same OOB clamp as make_forward: keep the prefetch block pair
            # legal when trailing empty tiles start at k_pad.
            return jnp.minimum((v // ALIGN) * ALIGN, k_pad - ALIGN)

        def dma(off, slot):
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(off // CHUNK, 2)],
                buf.at[slot], rsems.at[slot],
            )

        def wdma(slot, block):
            return pltpu.make_async_copy(
                dbuf.at[slot],
                dfeat_ref.at[block],
                wsems.at[slot],
            )

        def ensure_usable(q):
            """Wait + zero a flushed accumulator slot before reuse."""
            @pl.when(st[WP0 + q] == 1)
            def _():
                wdma(q, jnp.int32(0)).wait()
                dbuf[q] = jnp.zeros((FEAT_ROWS, CHUNK), jnp.float32)
                st[WP0 + q] = 0

        def flush(q, block):
            """Flush slot q to dfeat block (skip if stale: already
            flushed and never reused — the block then keeps its aliased
            zeros)."""
            @pl.when(st[WP0 + q] == 0)
            def _():
                wdma(q, block).start()
                st[WP0 + q] = 1

        @pl.when(qstep == 0)
        def _():
            st[RSLOT] = 0
            st[CURB] = win_of(starts_ref[0]) // CHUNK
            st[PAR] = 0
            st[WP0] = 0
            st[WP1] = 0
            dbuf[0] = jnp.zeros((FEAT_ROWS, CHUNK), jnp.float32)
            dbuf[1] = jnp.zeros((FEAT_ROWS, CHUNK), jnp.float32)
            dma(win_of(starts_ref[0]), 0).start()

        # wrapped below per sub-tile — the body from here runs TPS times
        # per grid step with t = q·TPS + i and block row i of the saved
        # outputs / cotangents.
        def do_tile(t, io_slot):
         start = starts_ref[t]
         stop = stops_ref[t]
         nxt_first = win_of(starts_ref[jnp.minimum(t + 1, num_tiles - 1)])
         pxf, pyf = _pixel_coords(t, grid_x, row_ref[0], row_ref[1])
         off0 = win_of(start)
         n_chunks = jnp.where(stop > start, pl.cdiv(stop - off0, CHUNK), 0)
         tri_x = _tri_excl()

         # Tile-origin offsets for the LOCAL-coordinate moment basis (local
         # coords keep the moment recombination cancellation-free:
         # |dx| ≥ |x̃| − TILE_X, so never a small difference of large terms)
         oxs = ((t % grid_x) * C.TILE_X).astype(jnp.float32)  # tile origin
         oys = (((t // grid_x) * row_ref[1] + row_ref[0])
                * C.TILE_Y).astype(jnp.float32)

         # the saved output / cotangent blocks are channel-major [OUT5,256];
         # transpose once to the [256, c] orientation the per-pixel math uses
         sv = jnp.transpose(outsv_ref[io_slot])    # [256, OUT5]
         go = jnp.transpose(gout_ref[io_slot])     # [256, OUT5]
         t_fin = sv[:, 4:5]
         g_r = go[:, 0:1]
         g_g = go[:, 1:2]
         g_b = go[:, 2:3]
         g_d = go[:, 3:4]
         # the saved color has the background composited in (C + T_fin·bg):
         # recover the pre-background totals for the suffix-sum math, and
         # fold the composite's dT path (dL/dT += Σ_q bg_q·g_q) into g_T
         g_T = (go[:, 4:5]
                + bg_ref[0] * g_r + bg_ref[1] * g_g + bg_ref[2] * g_b)
         # combined total: Σ_q C_tot,q·g_q  [256, 1]
         ctot_comb = (
             (sv[:, 0:1] - t_fin * bg_ref[0]) * g_r
             + (sv[:, 1:2] - t_fin * bg_ref[1]) * g_g
             + (sv[:, 2:3] - t_fin * bg_ref[2]) * g_b
             + sv[:, 3:4] * g_d
         )
         gT_term = t_fin * g_T

         # Per-tile constant LANE-MAJOR lhs operands [8, 256] for the two
         # reduction matmuls that replace the per-chunk cross-sublane sums
         # (backward.cu:523-554 accumulates the same 10 quantities via
         # atomicAdd):
         #   moments Σ_p c_p·dpower[p,l] for c ∈ {1, x, y, x², xy, y²}
         #   (local pixel coords) recombine into d_a..d_y and d_op = A0/op;
         #   cotangent rows Σ_p g_q[p]·w[p,l] give d_r..d_z directly.
         # Lane-major lhs + sublane-contracted rhs is the MXU's native
         # orientation — no per-chunk relayout.
         rix = jax.lax.broadcasted_iota(jnp.int32, (8, N_PIX), 0)
         lix = jax.lax.broadcasted_iota(jnp.int32, (8, N_PIX), 1)
         lpx = (lix % C.TILE_X).astype(jnp.float32)
         lpy = (lix // C.TILE_X).astype(jnp.float32)
         mom_lhsT = (
             jnp.where(rix == 0, 1.0, 0.0)
             + jnp.where(rix == 1, lpx, 0.0)
             + jnp.where(rix == 2, lpy, 0.0)
             + jnp.where(rix == 3, lpx * lpx, 0.0)
             + jnp.where(rix == 4, lpx * lpy, 0.0)
             + jnp.where(rix == 5, lpy * lpy, 0.0)
         )                                                       # [8, 256]
         cot_lhsT = jnp.concatenate(
             [gout_ref[0][0:4, :].astype(jnp.float32),
              jnp.zeros((4, N_PIX), jnp.float32)], axis=0)       # [8, 256]

         def cond(carry):
             c, _, T_v, _ = carry
             return (c < n_chunks) & (jnp.max(T_v) >= C.T_STOP)

         def body(carry):
             c, slot, T_v, a_comb = carry
             off = off0 + c * CHUNK
             nslot = 1 - slot
             noff = jnp.where(c + 1 < n_chunks, off + CHUNK, nxt_first)
             dma(noff, nslot).start()
             dma(off, slot).wait()
             cur = _extract_window(buf[slot], off % CHUNK)
             alpha, alpha_raw, exp_power, keep, dx, dy = _chunk_alpha(
                 cur, pxf, pyf, off, start, stop
             )
             t_excl, t_incl, one_minus, lg = _transmittance(
                 alpha, T_v, tri_x
             )
             contrib = t_incl >= C.T_STOP
             w = jnp.where(contrib, alpha * t_excl, 0.0)   # [256, CH]

             r = cur[6:7, :]
             g = cur[7:8, :]
             b = cur[8:9, :]
             z = cur[9:10, :]
             combo = r * g_r + g * g_g + b * g_b + z * g_d   # [256, CH]
             s = w * combo
             if _SCAN == "roll":
                 pw = _prefix_sum_incl_roll(s) + a_comb
             else:
                 # inclusive prefix = exclusive + own term (reuse tri matmul)
                 pw = _scan_matmul(s, tri_x) + s + a_comb
             S = ctot_comb - pw            # combined suffix AFTER instance i

             inv_om = 1.0 / jnp.maximum(one_minus, 1e-6)
             dalpha_px = t_excl * combo - inv_om * (S + gT_term)
             # skipped instances get no gradient (CUDA re-applies skip gates)
             dalpha_px = jnp.where(contrib & keep, dalpha_px, 0.0)
             dpower_px = alpha_raw * dalpha_px
             ca = cur[2:3, :]
             cb = cur[3:4, :]
             cc = cur[4:5, :]
             if _REDUCE == "mxu":
                 # The 10 cross-sublane reductions collapse to two
                 # [256,8]ᵀ×[256,CH] MXU matmuls (constant lhs per tile):
                 #  - pixel moments of dpower (local coords) → d_a..d_y, and
                 #    d_op = A0/op since dpower = op·exp_power·dalpha
                 #    (op ≥ 1/255 on any lane with a kept pixel; A0 == 0 on
                 #    the rest).
                 #  - cotangent-weighted sums of w → d_r, d_g, d_b2, d_z.
                 op = cur[5:6, :]
                 mom = jax.lax.dot_general(
                     mom_lhsT, dpower_px, (((1,), (0,)), ((), ())),
                     precision=_HI, preferred_element_type=jnp.float32,
                 )                                           # [8, CH]
                 cg = jax.lax.dot_general(
                     cot_lhsT, w, (((1,), (0,)), ((), ())),
                     precision=_HI, preferred_element_type=jnp.float32,
                 )                                           # [8, CH]
                 A0 = mom[0:1, :]
                 Axm = mom[1:2, :]
                 Aym = mom[2:3, :]
                 Axx = mom[3:4, :]
                 Axy = mom[4:5, :]
                 Ayy = mom[5:6, :]
                 x_t = cur[0:1, :] - oxs                 # tile-local mean x
                 y_t = cur[1:2, :] - oys
                 Bx = Axm - x_t * A0                     # = Σ_p dx·dpower
                 By = Aym - y_t * A0
                 d_x = ca * Bx + cb * By
                 d_y = cc * By + cb * Bx
                 d_a = -0.5 * ((Axx - x_t * Axm) - x_t * Bx)
                 d_c = -0.5 * ((Ayy - y_t * Aym) - y_t * By)
                 d_b = -((Axy - x_t * Aym) - y_t * Bx)
                 d_op = A0 / jnp.maximum(op, 1e-6)
                 zero6 = jnp.zeros((6, dpower_px.shape[1]), jnp.float32)
                 grads = jnp.concatenate(
                     [d_x, d_y, d_a, d_b, d_c, d_op, cg[0:4, :], zero6],
                     axis=0)
             else:
                 d_op = jnp.sum(exp_power * dalpha_px, axis=0, keepdims=True)
                 d_a = jnp.sum(-0.5 * dx * dx * dpower_px, axis=0,
                               keepdims=True)
                 d_b = jnp.sum(-dx * dy * dpower_px, axis=0, keepdims=True)
                 d_c = jnp.sum(-0.5 * dy * dy * dpower_px, axis=0,
                               keepdims=True)
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

             # rolling dual-accumulator flush: acc[PAR] covers block CURB,
             # acc[1-PAR] covers CURB+1. Window starts are monotone
             # non-decreasing across the sequential grid, so once the window
             # moves past a block every contribution to it is in — flush it
             # exactly once. A jump of ≥2 blocks flushes both live blocks;
             # the skipped blocks received nothing and keep aliased zeros.
             bp = off // CHUNK

             @pl.when(bp == st[CURB] + 1)
             def _():
                 flush(st[PAR], st[CURB])
                 st[PAR] = 1 - st[PAR]
                 st[CURB] = bp

             @pl.when(bp > st[CURB] + 1)
             def _():
                 flush(st[PAR], st[CURB])
                 flush(1 - st[PAR], st[CURB] + 1)
                 st[CURB] = bp

             p = st[PAR]
             q = 1 - p
             ensure_usable(p)
             ensure_usable(q)
             # split the window grads across the two covered blocks:
             # dest lane d of block bp gets window position d−s (d ≥ s);
             # dest lane d of block bp+1 gets position d+CHUNK−s (d < s)
             s_lane = off % CHUNK
             rolled = pltpu.roll(grads, s_lane, axis=1)
             lane = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1)
             dbuf[p] = dbuf[p] + jnp.where(lane >= s_lane, rolled, 0.0)
             dbuf[q] = dbuf[q] + jnp.where(lane < s_lane, rolled, 0.0)

             if _TMIN == "mxu" and lg is not None:
                 T_new = _t_new_mxu(lg, contrib, keep, T_v)
             else:
                 T_new = jnp.min(
                     jnp.where(contrib, t_incl, T_v), axis=1, keepdims=True
                 )
             return c + 1, nslot, T_new, pw[:, -1:]

         init = (jnp.int32(0), st[RSLOT],
                 jnp.ones((N_PIX, 1), jnp.float32),
                 jnp.zeros((N_PIX, 1), jnp.float32))
         c_fin, slot, _, _ = jax.lax.while_loop(cond, body, init)

         @pl.when(c_fin < n_chunks)
         def _():
             dma(jnp.int32(0), slot).wait()
             dma(nxt_first, slot).start()

         st[RSLOT] = slot

        for i in range(TPS):
            do_tile(qstep * TPS + i, i)

        @pl.when(qstep == grid_n - 1)
        def _():
            # flush both live accumulators (stale slots skip: their block
            # keeps the aliased zeros), then drain all DMA
            flush(st[PAR], st[CURB])
            flush(1 - st[PAR], st[CURB] + 1)

            @pl.when(st[WP0] == 1)
            def _():
                wdma(jnp.int32(0), jnp.int32(0)).wait()

            @pl.when(st[WP1] == 1)
            def _():
                wdma(jnp.int32(1), jnp.int32(0)).wait()

            dma(jnp.int32(0), st[RSLOT]).wait()   # drain the read ring

    nb1 = k_pad // CHUNK + 1
    blk = lambda ch: pl.BlockSpec(
        (TPS, ch, N_PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # feat (blocked)
            blk(OUT5),                              # saved packed outputs
            blk(OUT5),                              # packed cotangents
            pl.BlockSpec(memory_space=pltpu.ANY),   # dfeat zeros (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # dfeat (blocked)
        scratch_shapes=[
            pltpu.VMEM((2, 2, FEAT_ROWS, CHUNK), feat_dtype),
            pltpu.VMEM((2, FEAT_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nb1, FEAT_ROWS, CHUNK), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # sequential grid: the
            # rolling block-accumulator flush relies on tile order
        ),
        # operand order: 4 prefetch scalars, feat, outsv, gout, dzeros → the
        # zeros buffer (index 7) aliases the dfeat output so untouched
        # blocks stay zero
        input_output_aliases={7: 0},
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper over (feat, starts, stops) → per-tile output blocks


def _pad_ranges(starts, stops, num_tiles):
    """Pad starts/stops to a TPS multiple with EMPTY trailing tiles
    (start == stop == stops[-1]): they satisfy the DMA-ring invariant
    (start_{t+1} == stop_t) and blend nothing. Returns (starts, stops, Tp).
    """
    Tp = -(-num_tiles // TPS) * TPS
    if Tp == num_tiles:
        return starts, stops, Tp
    pad = jnp.broadcast_to(stops[-1:], (Tp - num_tiles,))
    return (jnp.concatenate([starts, pad]),
            jnp.concatenate([stops, pad]), Tp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def blend_pallas(feat, starts, stops, row_off, bg, grid_x: int,
                 num_tiles: int, k_pad: int, interpret: bool = False):
    """feat [16,K], starts/stops [T], row_off [2] = (offset, stride),
    bg [3] →
    packed out [T, 5, 256] = (r, g, b, depth, t_fin) channel-major,
    bg composited.

    The payload is re-laid out to the blocked [K/CHUNK+1, 16, CHUNK] form
    the kernels consume (:func:`to_blocked`); inside a jitted step XLA
    fuses the relayout into the gather producing ``feat``."""
    feat_blk = to_blocked(feat)
    s_p, e_p, Tp = _pad_ranges(starts, stops, num_tiles)
    out = make_forward(grid_x, Tp, k_pad, interpret, feat.dtype)(
        s_p, e_p, row_off, bg, feat_blk
    )
    return out[:num_tiles]


def _blend_fwd(feat, starts, stops, row_off, bg, grid_x, num_tiles, k_pad,
               interpret=False):
    feat_blk = to_blocked(feat)
    s_p, e_p, Tp = _pad_ranges(starts, stops, num_tiles)
    out = make_forward(grid_x, Tp, k_pad, interpret, feat.dtype)(
        s_p, e_p, row_off, bg, feat_blk
    )
    return out[:num_tiles], (feat_blk, starts, stops, row_off, bg, out)


def _blend_bwd(grid_x, num_tiles, k_pad, interpret, res, g_out):
    import numpy as np

    feat_blk, starts, stops, row_off, bg, out = res
    s_p, e_p, Tp = _pad_ranges(starts, stops, num_tiles)
    if Tp != num_tiles:
        g_out = jnp.pad(g_out, ((0, Tp - num_tiles), (0, 0), (0, 0)))
    nb1 = k_pad // CHUNK + 1
    dzero = jnp.zeros((nb1, FEAT_ROWS, CHUNK), jnp.float32)
    dfeat_blk = make_backward(
        grid_x, Tp, k_pad, interpret, feat_blk.dtype
    )(s_p, e_p, row_off, bg, feat_blk, out, g_out, dzero)
    # cotangent dtype must match the primal (bf16 payload mode)
    dfeat = from_blocked(dfeat_blk).astype(feat_blk.dtype)
    # integer operands carry symbolic-zero float0 cotangents
    zero_of = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    # true bg cotangent: out_q = C_q + T_fin·bg_q per pixel, so
    # dL/dbg_q = Σ_{tiles,pixels} T_fin · g_out_q  (cheap — both factors are
    # already materialized; advisor r3 flagged the previous silent zero)
    dbg = jnp.einsum(
        "tp,tqp->q", out[:, 4], g_out[:, 0:3]
    ).astype(bg.dtype)
    return (dfeat, zero_of(starts), zero_of(stops), zero_of(row_off), dbg)


blend_pallas.defvjp(_blend_fwd, _blend_bwd)
