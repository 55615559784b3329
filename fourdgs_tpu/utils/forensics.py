"""Kernel-failure forensics: dump trainer state on NaN loss.

Parity target: the reference rasterizer's debug mode dumps every rasterizer
input to ``snapshot_fw.dump`` / ``snapshot_bw.dump`` when a CUDA launch
errors (diff_gaussian_rasterization/__init__.py:83-90, 132-139) so the
failing case can be replayed offline. The TPU pipeline has no kernel-launch
errors to catch (Mosaic faults abort the process), but the observable
failure mode the reference's watchdog guards — a NaN loss
(train.py:263-265) — is catchable, and this module captures the equivalent
replay payload at that moment: every per-Gaussian parameter tensor, the
alive mask, the camera batch, the static budgets, and the step metadata.

Load with ``np.load(path, allow_pickle=False)``; keys are flat
``group.leaf`` names.
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np


def _flatten(prefix: str, tree: Any, out: dict):
    """Flatten a pytree of arrays into '{prefix}.{path}' numpy entries."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}.{i}", v, out)
    elif tree is None:
        return
    elif hasattr(tree, "shape"):
        out[prefix] = np.asarray(tree)
    else:
        out[prefix] = np.asarray(tree)


def dump_snapshot(
    model_path: str,
    tag: str,
    params: dict,
    state: Any = None,
    cams: Any = None,
    metrics: dict | None = None,
    extra: dict | None = None,
) -> str:
    """Write a replayable npz snapshot; returns the file path.

    Never raises: forensics must not mask the original failure. On any
    error it returns the empty string.
    """
    try:
        out: dict[str, np.ndarray] = {}
        _flatten("params", params, out)
        if state is not None:
            for field in ("alive", "max_radii2d", "xyz_gradient_accum",
                          "denom", "deformation_accum", "aabb"):
                v = getattr(state, field, None)
                if v is not None:
                    out[f"state.{field}"] = np.asarray(v)
        if cams is not None:
            _flatten("cams", cams if isinstance(cams, dict)
                     else getattr(cams, "_asdict", lambda: cams)(), out)
        if metrics:
            for k, v in metrics.items():
                try:
                    out[f"metrics.{k}"] = np.asarray(v)
                except Exception:
                    pass
        if extra:
            for k, v in extra.items():
                out[f"extra.{k}"] = np.asarray(v)
        d = model_path if model_path else "."
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"snapshot_{tag}_{int(time.time())}.npz")
        np.savez_compressed(path, **out)
        return path
    except Exception:
        return ""
