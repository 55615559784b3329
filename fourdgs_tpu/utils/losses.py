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
