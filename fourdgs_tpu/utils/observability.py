"""Tensorboard-class observability: scalars, histograms, image dumps.

Parity target: the reference's training_report (train.py:488-538) logs to
tensorboard per-iteration scalars (l1/total loss, iter_time), eval scalars
(per-split l1/psnr), the first 5 eval renders + ground truths as images, an
opacity histogram, total_points, deformation_rate
(_deformation_table.sum()/P) and a motion histogram
(_deformation_accum.mean(-1)/100).

TPU-native equivalent: a dependency-free event stream —
  - scalars + histograms to <model_path>/events.jsonl (one JSON per record:
    {"iter", "tag", "scalar"|"hist"}; histograms stored as counts + edges)
  - eval renders/gt as PNGs under <model_path>/eval_images/
  - scripts/plot_events.py renders the stream to matplotlib panels
    (the tensorboard-UI replacement, like visualize_timing.py for timers).
"""

from __future__ import annotations

import json
import os

import numpy as np


class EventLog:
    """Append-only JSONL scalar/histogram stream + PNG image dumps."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        os.makedirs(model_path, exist_ok=True)
        self.path = os.path.join(model_path, "events.jsonl")
        self._f = open(self.path, "a")

    def add_scalar(self, tag: str, value, iteration: int):
        self._f.write(json.dumps(
            {"iter": int(iteration), "tag": tag, "scalar": float(value)}
        ) + "\n")
        self._f.flush()

    def add_histogram(self, tag: str, values, iteration: int, bins: int = 64):
        v = np.asarray(values, np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        counts, edges = np.histogram(v, bins=bins)
        self._f.write(json.dumps({
            "iter": int(iteration), "tag": tag,
            "hist": {"counts": counts.tolist(),
                     "edges": np.round(edges, 6).tolist(),
                     "mean": float(v.mean()), "min": float(v.min()),
                     "max": float(v.max())},
        }) + "\n")
        self._f.flush()

    def add_image(self, tag: str, img_chw, iteration: int):
        """Save an eval render/gt panel (train.py:513-516 add_images)."""
        from PIL import Image

        out_dir = os.path.join(self.model_path, "eval_images")
        os.makedirs(out_dir, exist_ok=True)
        img = np.clip(np.asarray(img_chw), 0.0, 1.0)
        u8 = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        safe = tag.replace("/", "_")
        Image.fromarray(u8).save(
            os.path.join(out_dir, f"{safe}_{iteration:06d}.png")
        )

    def close(self):
        self._f.close()


def log_scene_stats(ev: EventLog, state, stage: str, iteration: int):
    """The reference's scene histograms/scalars block (train.py:532-536)."""
    import jax

    opacity = jax.nn.sigmoid(state.params["opacity"][:, 0])
    alive = np.asarray(state.alive, bool)
    ev.add_histogram(
        f"{stage}/scene/opacity_histogram",
        np.asarray(opacity)[alive], iteration,
    )
    n = max(int(alive.sum()), 1)
    ev.add_scalar(f"{stage}/total_points", n, iteration)
    ev.add_scalar(
        f"{stage}/deformation_rate",
        float(np.asarray(state.deformation_table, np.float64)[alive].sum())
        / n,
        iteration,
    )
    motion = np.asarray(state.deformation_accum, np.float64)
    if motion.ndim > 1:
        motion = motion.mean(axis=-1)
    ev.add_histogram(
        f"{stage}/scene/motion_histogram", motion[alive] / 100.0, iteration,
        bins=500,
    )


def read_events(model_path: str) -> list[dict]:
    path = os.path.join(model_path, "events.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
