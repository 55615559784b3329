#!/usr/bin/env python3
"""Visualize timing_report.json from a training run.

Parity target: the reference's visualize_timing.py:30-886 matplotlib suite —
iteration-time curves, per-stage comparison, operation breakdown, and a
phase×iteration heatmap — over the DetailedTimer JSON schema
(fourdgs_tpu.utils.timer).

    python scripts/visualize_timing.py output/<expname>/timing_report.json
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_iteration_curve(iters: list[dict], out: str):
    fig, ax = plt.subplots(figsize=(10, 4))
    by_stage = defaultdict(list)
    for it in iters:
        by_stage[it["stage"]].append((it["iteration"], it["total_time"]))
    for stage, pts in by_stage.items():
        xs, ys = zip(*pts)
        ax.plot(xs, np.asarray(ys) * 1000, label=stage, lw=0.7)
    ax.set_xlabel("iteration")
    ax.set_ylabel("iteration time (ms)")
    ax.set_yscale("log")
    ax.legend()
    ax.set_title("per-iteration wall time")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)


def plot_operation_breakdown(summary: dict, out: str):
    ops = summary.get("operations", {})
    if not ops:
        return
    names = sorted(ops, key=lambda k: -ops[k]["total_time"])[:14]
    totals = [ops[n]["total_time"] for n in names]
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.barh(names[::-1], totals[::-1])
    ax.set_xlabel("total seconds")
    ax.set_title(
        f"operation breakdown (wall {summary['total_wall_time']:.1f}s, "
        f"unaccounted {summary['unaccounted_time']:.1f}s)"
    )
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)


def plot_phase_heatmap(iters: list[dict], out: str, max_cols: int = 400):
    if not iters:
        return
    phases = sorted({p for it in iters for p in it["phases"]})
    stride = max(len(iters) // max_cols, 1)
    sampled = iters[::stride]
    mat = np.zeros((len(phases), len(sampled)))
    for j, it in enumerate(sampled):
        for i, p in enumerate(phases):
            mat[i, j] = it["phases"].get(p, 0.0) * 1000
    fig, ax = plt.subplots(figsize=(11, 4))
    im = ax.imshow(mat, aspect="auto", cmap="magma")
    ax.set_yticks(range(len(phases)), phases, fontsize=7)
    ax.set_xlabel(f"iteration (x{stride})")
    fig.colorbar(im, label="ms")
    ax.set_title("phase time heatmap")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("report", help="path to timing_report.json")
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args(argv)

    with open(args.report) as f:
        data = json.load(f)
    out_dir = args.out_dir or os.path.join(
        os.path.dirname(args.report) or ".", "timing_plots"
    )
    os.makedirs(out_dir, exist_ok=True)
    plot_iteration_curve(
        data.get("iterations", []), os.path.join(out_dir, "iteration_times.png")
    )
    plot_operation_breakdown(
        data.get("summary", {}), os.path.join(out_dir, "operation_breakdown.png")
    )
    plot_phase_heatmap(
        data.get("iterations", []), os.path.join(out_dir, "phase_heatmap.png")
    )
    print(f"plots → {out_dir}")


if __name__ == "__main__":
    main()
