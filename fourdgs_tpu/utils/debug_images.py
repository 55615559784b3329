"""Debug-image subsystem: render|GT panels and training progress frames.

Parity targets in the reference:
- utils/debug_utils.py:7-90 (save_debug_image): side-by-side render|GT panel
  with a caption (stage, iteration, camera time), saved every 100 iterations
  under <model_path>/debug_images/ when --debug_mode is on (train.py:212-219)
- utils/scene_utils.py:11-58 (render_training_image): labeled GT|render|depth
  progress frame on the dense early schedule (train.py:325-331)
"""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img_chw: np.ndarray) -> np.ndarray:
    img = np.clip(np.asarray(img_chw), 0.0, 1.0)
    return (img.transpose(1, 2, 0) * 255).astype(np.uint8)


def _caption(panel: np.ndarray, text: str) -> np.ndarray:
    from PIL import Image, ImageDraw

    img = Image.fromarray(panel)
    draw = ImageDraw.Draw(img)
    draw.rectangle([0, 0, img.width, 14], fill=(0, 0, 0))
    draw.text((4, 2), text, fill=(255, 255, 255))
    return np.asarray(img)


def save_debug_image(
    render_chw: np.ndarray,
    gt: np.ndarray,
    stage: str,
    iteration: int,
    time: float,
    model_path: str,
) -> str:
    """render|GT side-by-side panel (save_debug_image equivalent)."""
    out_dir = os.path.join(model_path, "debug_images")
    os.makedirs(out_dir, exist_ok=True)
    r = _to_u8(render_chw)
    if gt.ndim == 3 and gt.shape[-1] in (3, 4):  # uint8 HWC loader format
        g = np.asarray(gt)[..., :3]
    else:
        g = _to_u8(gt)
    panel = np.concatenate([r, g], axis=1)
    panel = _caption(
        panel, f"{stage} iter={iteration} t={time:.3f}  render | gt"
    )
    from PIL import Image

    path = os.path.join(out_dir, f"{stage}_{iteration:06d}.png")
    Image.fromarray(panel).save(path)
    return path


def render_training_image(
    render_chw: np.ndarray,
    gt: np.ndarray,
    depth_1hw: np.ndarray,
    stage: str,
    iteration: int,
    elapsed_s: float,
    model_path: str,
    split: str = "test",
) -> str:
    """GT|render|depth progress frame (render_training_image equivalent)."""
    out_dir = os.path.join(model_path, "train_render", f"{stage}{split}")
    os.makedirs(out_dir, exist_ok=True)
    r = _to_u8(render_chw)
    if gt.ndim == 3 and gt.shape[-1] in (3, 4):
        g = np.asarray(gt)[..., :3]
    else:
        g = _to_u8(gt)
    d = np.asarray(depth_1hw)[0]
    dmax = d.max() if d.max() > 0 else 1.0
    d_u8 = np.repeat(
        (np.clip(d / dmax, 0, 1) * 255).astype(np.uint8)[..., None], 3, -1
    )
    panel = np.concatenate([g, r, d_u8], axis=1)
    panel = _caption(
        panel,
        f"{stage} iter={iteration} {elapsed_s:.0f}s  gt | render | depth",
    )
    from PIL import Image

    path = os.path.join(out_dir, f"{iteration:06d}.png")
    Image.fromarray(panel).save(path)
    return path


def should_save_progress(iteration: int) -> bool:
    """The reference's dense early schedule (train.py:325-331)."""
    return (
        (iteration < 1000 and iteration % 10 == 9)
        or (iteration < 3000 and iteration % 50 == 49)
        or (iteration < 60000 and iteration % 100 == 99)
    )
