"""Image losses and metrics.

Parity targets: utils/loss_utils.py (l1/l2, windowed SSIM with an 11×11
Gaussian window σ=1.5 and zero 'same' padding) and utils/image_utils.py
(PSNR = 20·log10(1/√mse)) in the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (utils/image_utils.py:16-22).

    pred/gt: [..., C, H, W]; returns [...] (mean over C·H·W per image).
    """
    mse = jnp.mean(
        (pred - gt) ** 2, axis=tuple(range(pred.ndim - 3, pred.ndim))
    )
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


def tile_image(img: jnp.ndarray, tile_x: int = 16,
               tile_y: int = 16, pad_cols: int = 0) -> jnp.ndarray:
    """[C, H, W] image → [T, C+pad_cols, tile_y·tile_x] per-tile blocks.

    CHANNEL-MAJOR tile layout, matching what the Pallas rasterizer emits
    (row-major tiles, row-major pixels within a tile on the LANE dim —
    fourdgs_tpu.ops.pallas_blend). Channel-major matters on TPU: a
    [T, 256, 5] block pads its minor dim to 128 lanes in HBM (25×
    physical inflation — measured 1.4 ms/step of pure padding traffic in
    the loss chain), while [T, 5, 256] pads only 5→8 sublanes (1.6×).
    H/W are padded up to tile multiples with zeros; combine with
    :func:`tile_pixel_mask` to ignore the padding. ``pad_cols`` appends
    zero channels — the training loss tiles the GT with pad_cols=2 so it
    subtracts against the rasterizer's packed (r, g, b, depth, t_fin)
    block directly, avoiding any slice/pad of the differentiable output.
    """
    c, h, w = img.shape
    gy = -(-h // tile_y)
    gx = -(-w // tile_x)
    img = jnp.pad(img, ((0, 0), (0, gy * tile_y - h), (0, gx * tile_x - w)))
    img = img.reshape(c, gy, tile_y, gx, tile_x)
    out = img.transpose(1, 3, 0, 2, 4).reshape(
        gy * gx, c, tile_y * tile_x
    )
    if pad_cols:
        out = jnp.pad(out, ((0, 0), (0, pad_cols), (0, 0)))
    return out


def tile_image_np(img: np.ndarray, tile_x: int = 16,
                  tile_y: int = 16) -> np.ndarray:
    """Host-side :func:`tile_image`: [H, W, C] (any dtype, typically uint8)
    → [T, C, tile_y·tile_x] channel-major tile blocks.

    Used to PRE-TILE the device GT cache once at cache build: the in-jit
    image→tile relayout of a [3, H, W] float image measured ~3.7 ms/step
    on v5e (XLA lowers the strided transpose to a pathological copy);
    pre-tiled uint8 blocks make the in-step GT path a lane-dense
    normalize+pad only.
    """
    h, w, c = img.shape
    gy = -(-h // tile_y)
    gx = -(-w // tile_x)
    img = np.pad(img, ((0, gy * tile_y - h), (0, gx * tile_x - w), (0, 0)))
    img = img.reshape(gy, tile_y, gx, tile_x, c)
    return np.ascontiguousarray(
        img.transpose(0, 2, 4, 1, 3).reshape(gy * gx, c, tile_y * tile_x)
    )


def tile_pixel_mask(height: int, width: int, tile_x: int = 16,
                    tile_y: int = 16) -> jnp.ndarray:
    """[T, 1, tile_y·tile_x] float mask: 1 for pixels inside H×W, 0 for the
    tile-grid padding. All-ones when H and W are tile multiples."""
    gy = -(-height // tile_y)
    gx = -(-width // tile_x)
    yy = jnp.arange(gy * tile_y) < height
    xx = jnp.arange(gx * tile_x) < width
    m = (yy[:, None] & xx[None, :]).astype(jnp.float32)
    return tile_image(m[None], tile_x, tile_y)


def masked_psnr(pred: jnp.ndarray, gt: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """PSNR over mask≠0 pixels only (utils/image_utils.py:16-38).

    pred/gt: [C, H, W]; mask: [H, W] (or [1, H, W]) — the HyperNeRF
    covisible masks select pixels visible from the training cameras
    (hyper_loader.py:102-105). One MSE over all selected elements across
    channels, as the reference's flatten+boolean-select computes.
    """
    if mask.ndim == 3:
        mask = mask[0]
    sel = (mask != 0).astype(pred.dtype)[None]  # [1,H,W] broadcast over C
    n = jnp.maximum(jnp.sum(sel) * pred.shape[0], 1.0)
    mse = jnp.sum(((pred - gt) ** 2) * sel) / n
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
            for x in range(window_size)
        ]
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """Windowed SSIM (utils/loss_utils.py:32-68): per-channel Gaussian window,
    zero 'same' padding, C1 = 0.01², C2 = 0.03², mean over everything.

    img1/img2: [C, H, W] or [B, C, H, W].
    """
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    C = img1.shape[1]
    w = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.tile(w[None, None], (C, 1, 1, 1))  # [C,1,K,K] depthwise

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2,) * 2] * 2,
            feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def ssim_tiles(
    a: jnp.ndarray, b: jnp.ndarray, grid_x: int, grid_y: int,
    window_size: int = 11,
) -> jnp.ndarray:
    """SSIM equal to :func:`ssim`, computed directly on CHANNEL-MAJOR tile
    blocks [B?, T, C, 256] (T = grid_y·grid_x row-major 16×16 tiles) — the
    Pallas rasterizer's native output layout.

    The 11×11 Gaussian window is separable (outer(g, g)), and each tile
    needs only a 5-pixel halo from its 4 edge neighbors: neighbors are tile
    rolls (t±1 within a tile row, t±grid_x across rows) with edge masks
    reproducing the reference conv's zero 'same' padding
    (utils/loss_utils.py:32-68). Everything stays in the packed block
    layout — no tile→image transpose enters the train step when
    λ_dssim ≠ 0 (the transpose + its backward re-tile measured ~3 ms/step
    at 800×800). Halo contractions are tiny-K matmuls at HIGHEST precision.

    Requires H, W divisible by 16 (no tile-grid padding); callers fall back
    to the image-space path otherwise.
    """
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    B, T, C, npix = a.shape
    assert T == grid_x * grid_y and npix == 256, (a.shape, grid_x, grid_y)
    half = window_size // 2
    g1 = np.array(
        [math.exp(-((x - half) ** 2) / (2 * 1.5**2))
         for x in range(window_size)]
    )
    g1 = (g1 / g1.sum()).astype(np.float32)
    # band matrix: out[j] = Σ_k ext[j + k]·g[k], ext = halo-extended axis
    Wc = np.zeros((16 + 2 * half, 16), np.float32)
    for j in range(16):
        for k in range(window_size):
            Wc[j + k, j] = g1[k]
    Wc = jnp.asarray(Wc)
    tcol = jnp.arange(T, dtype=jnp.int32) % grid_x
    trow = jnp.arange(T, dtype=jnp.int32) // grid_x
    hi_p = jax.lax.Precision.HIGHEST

    def conv_xy(x):  # [B, T, C, 16, 16] → same, separable 11×11 window
        lm = (tcol != 0).astype(x.dtype)[None, :, None, None, None]
        rm = (tcol != grid_x - 1).astype(x.dtype)[None, :, None, None, None]
        ext = jnp.concatenate(
            [jnp.roll(x, 1, axis=1)[..., 16 - half:] * lm, x,
             jnp.roll(x, -1, axis=1)[..., :half] * rm],
            axis=-1,
        )                                     # [B,T,C,16,16+2h]
        x = jnp.einsum("btcrw,wj->btcrj", ext, Wc, precision=hi_p)
        um = (trow != 0).astype(x.dtype)[None, :, None, None, None]
        dm = (trow != grid_y - 1).astype(x.dtype)[None, :, None, None, None]
        ext = jnp.concatenate(
            [jnp.roll(x, grid_x, axis=1)[..., 16 - half:, :] * um, x,
             jnp.roll(x, -grid_x, axis=1)[..., :half, :] * dm],
            axis=-2,
        )                                     # [B,T,C,16+2h,16]
        return jnp.einsum("btcrw,rj->btcjw", ext, Wc, precision=hi_p)

    va = a.reshape(B, T, C, 16, 16)
    vb = b.reshape(B, T, C, 16, 16)
    # ONE conv pass over the 5 windowed quantities (a, b, a², b², ab)
    # stacked on the channel axis: 2 halo rolls + 2 band matmuls total
    # instead of 10/10.
    stacked = jnp.concatenate([va, vb, va * va, vb * vb, va * vb], axis=2)
    cs = conv_xy(stacked)
    mu1 = cs[:, :, 0 * C:1 * C]
    mu2 = cs[:, :, 1 * C:2 * C]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = cs[:, :, 2 * C:3 * C] - mu1_sq
    sigma2_sq = cs[:, :, 3 * C:4 * C] - mu2_sq
    sigma12 = cs[:, :, 4 * C:5 * C] - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)
