"""Gradient tracking / visualization.

Parity target: the fast-train fork's GradientTracker
(utils/gradient_tracker.py:33-900 + analyze_gradients.py in the reference):
per-parameter-group gradient statistics recorded every N iterations
(mean/std/min/max/norm, incl. the deformation-MLP vs grid split), periodic
2-D curves, 3-D |∇xyz| scatter snapshots, vanishing/exploding detection, and
an end-of-run JSON + plot report.

TPU design difference: stats are computed **in-graph** inside the jitted
train step (fourdgs_tpu.train.loop attaches a ``grad_stats`` dict to the
step metrics — device-side reductions, one scalar pull per logged step)
instead of crawling ``param.grad`` tensors on the host every iteration,
which is what throttles the reference's GPU (SURVEY.md §5.5).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
          "deformation", "grid")

VANISH_THRESHOLD = 1e-7
EXPLODE_THRESHOLD = 1e2


def compute_grad_stats(grads: dict) -> dict:
    """In-graph per-group gradient stats (called inside the train step).

    Returns {group: {mean, std, min, max, norm}} of jnp scalars. The "deform"
    subtree is split by the grid-in-key rule into deformation vs grid groups
    (reference deformation.py:149-160).
    """
    import jax
    import jax.numpy as jnp

    def stats_of(leaves):
        flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
        return {
            "mean": jnp.mean(flat),
            "std": jnp.std(flat),
            "min": jnp.min(flat),
            "max": jnp.max(flat),
            "norm": jnp.linalg.norm(flat),
        }

    out = {}
    for k in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
        if grads[k].size > 0:  # f_rest is empty when sh_degree == 0
            out[k] = stats_of([grads[k]])
    deform = grads.get("deform", {})
    mlp_leaves, grid_leaves = [], []
    for k, v in deform.items():
        (grid_leaves if "grid" in k else mlp_leaves).extend(jax.tree.leaves(v))
    if mlp_leaves:
        out["deformation"] = stats_of(mlp_leaves)
    if grid_leaves:
        out["grid"] = stats_of(grid_leaves)
    return out


class GradientTracker:
    """Host-side history + reports over the in-graph stats."""

    def __init__(self, model_path: str | None = None, enable: bool = True,
                 record_interval: int = 10):
        self.model_path = model_path
        self.enable = enable
        self.record_interval = record_interval
        self.history: dict[str, list] = defaultdict(list)
        self.iterations: list[int] = []
        self.stages: list[str] = []

    def record(self, iteration: int, stage: str, grad_stats: dict):
        """Record one step's stats ({group: {stat: scalar}})."""
        if not self.enable:
            return
        self.iterations.append(iteration)
        self.stages.append(stage)
        for group, stats in grad_stats.items():
            for stat, v in stats.items():
                self.history[f"{group}/{stat}"].append(float(v))

    # -- analysis ------------------------------------------------------------
    def detect_anomalies(self) -> dict:
        """Vanishing/exploding detection (reference analyze_gradients.py)."""
        out = {"vanishing": [], "exploding": []}
        for key, vals in self.history.items():
            if not key.endswith("/norm") or not vals:
                continue
            group = key.split("/")[0]
            recent = np.asarray(vals[-10:])
            if np.all(recent < VANISH_THRESHOLD):
                out["vanishing"].append(group)
            if np.any(recent > EXPLODE_THRESHOLD):
                out["exploding"].append(group)
        return out

    def generate_report(self, path: str | None = None) -> str:
        path = path or os.path.join(
            self.model_path or ".", "gradient_report.json"
        )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        summary = {}
        for key, vals in self.history.items():
            if vals:
                arr = np.asarray(vals)
                summary[key] = {
                    "last": float(arr[-1]),
                    "mean": float(arr.mean()),
                    "max": float(arr.max()),
                    "min": float(arr.min()),
                }
        with open(path, "w") as f:
            json.dump(
                {
                    "iterations": self.iterations,
                    "stages": self.stages,
                    "history": {k: v for k, v in self.history.items()},
                    "summary": summary,
                    "anomalies": self.detect_anomalies(),
                },
                f, indent=1,
            )
        return path

    # -- plots ---------------------------------------------------------------
    def visualize_gradient_curves(self, path: str | None = None):
        """Per-group norm curves (gradient_tracker.py visualize_*)."""
        if not self.iterations:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = path or os.path.join(
            self.model_path or ".", "gradient_curves.png"
        )
        fig, ax = plt.subplots(figsize=(10, 6))
        for key, vals in sorted(self.history.items()):
            if key.endswith("/norm") and vals:
                ax.plot(self.iterations[: len(vals)], vals,
                        label=key.split("/")[0])
        ax.set_yscale("log")
        ax.set_xlabel("iteration")
        ax.set_ylabel("gradient norm")
        ax.legend(fontsize=8)
        ax.set_title("per-group gradient norms")
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    def visualize_gradient_3d(self, xyz: np.ndarray, grad_norm: np.ndarray,
                              iteration: int, stage: str = "",
                              max_points: int = 2000,
                              path: str | None = None):
        """3-D |∇xyz| scatter snapshot (gradient_tracker.py 3D plotly view,
        rendered with matplotlib here)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = path or os.path.join(
            self.model_path or ".",
            f"gradient_3d_{stage}_{iteration}.png",
        )
        n = xyz.shape[0]
        if n > max_points:
            sel = np.random.default_rng(0).choice(n, max_points, replace=False)
            xyz, grad_norm = xyz[sel], grad_norm[sel]
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(projection="3d")
        sc = ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2],
                        c=np.log10(grad_norm + 1e-12), s=2, cmap="viridis")
        fig.colorbar(sc, label="log10 |∇xyz|")
        ax.set_title(f"xyz gradient magnitude @ {stage} {iteration}")
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path


def gradient_timeline(
    cfg, state, camera, gt_chw, model_path: str,
    time_points=None, max_points: int = 2000, stage: str = "fine",
):
    """Per-timestamp gradient timeline (gradient_tracker.py:817-900).

    The reference re-runs render+backward at 10 timestamps through the same
    camera at end of run and plots |∇xyz| over the deformed positions per t.
    Here each timestamp is one jitted value_and_grad of the L1 loss; the
    timeline goes to gradient_timeline.json + a matplotlib panel grid
    (replacing the reference's plotly slider figure).
    """
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.render import CameraArrays, render as render_fn
    from fourdgs_tpu.utils import losses

    if time_points is None:
        time_points = [i * 0.1 for i in range(10)]
    bg = jnp.array([1.0, 1.0, 1.0] if cfg.model.white_background
                   else [0.0, 0.0, 0.0])
    gt = jnp.asarray(np.asarray(gt_chw, np.float32)[:3])
    h, w = gt.shape[-2:]
    sh_deg = int(state.active_sh_degree)
    cam0 = CameraArrays.from_camera(camera)

    @jax.jit
    def loss_and_grad(params, st, cam):
        def f(p):
            out = render_fn(p, st, cam, cfg, w, h, stage, bg, sh_deg)
            return losses.l1_loss(out.color, gt)
        return jax.value_and_grad(f)(params)

    from fourdgs_tpu.models import deformation as deform_lib

    @jax.jit
    def deformed_xyz(params, st, t):
        tt = jnp.broadcast_to(jnp.float32(t), (params["xyz"].shape[0],))
        from fourdgs_tpu.models import gaussians as G

        xyz, *_ = deform_lib.deform(
            params["deform"], cfg.hidden, st.aabb,
            params["xyz"], params["scaling"], params["rotation"],
            params["opacity"], G.get_features(params), tt,
        )
        return xyz

    alive = np.asarray(state.alive, bool)
    records = []
    panels = []
    for t in time_points:
        cam_t = cam0._replace(time=jnp.float32(t))
        loss, grads = loss_and_grad(state.params, state, cam_t)
        gnorm = np.asarray(
            jnp.linalg.norm(grads["xyz"], axis=-1)
        )[alive]
        xyz_t = np.asarray(deformed_xyz(state.params, state, t))[alive]
        records.append({
            "t": float(t),
            "loss": float(loss),
            "grad_norm_mean": float(gnorm.mean()),
            "grad_norm_max": float(gnorm.max()),
            "n_points": int(alive.sum()),
        })
        panels.append((float(t), xyz_t, gnorm))

    os.makedirs(model_path, exist_ok=True)
    json_path = os.path.join(model_path, "gradient_timeline.json")
    with open(json_path, "w") as f:
        json.dump(records, f, indent=1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(panels)
    cols = min(n, 5)
    rows = -(-n // cols)
    fig = plt.figure(figsize=(3.2 * cols, 3.2 * rows))
    rng = np.random.default_rng(0)
    for i, (t, xyz_t, gnorm) in enumerate(panels):
        if len(xyz_t) > max_points:
            sel = rng.choice(len(xyz_t), max_points, replace=False)
            xyz_t, gnorm = xyz_t[sel], gnorm[sel]
        ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
        sc = ax.scatter(xyz_t[:, 0], xyz_t[:, 1], xyz_t[:, 2],
                        c=np.log10(gnorm + 1e-12), s=1.5, cmap="viridis")
        ax.set_title(f"t={t:.1f}", fontsize=8)
        ax.tick_params(labelsize=5)
    fig.colorbar(sc, ax=fig.axes, shrink=0.5, label="log10 |∇xyz|")
    png_path = os.path.join(model_path, "gradient_timeline.png")
    fig.savefig(png_path, dpi=100)
    plt.close(fig)
    return json_path, png_path
