#!/usr/bin/env python3
"""Honest single-chip SP-scaling evidence (VERDICT r3 #4).

True N-chip scaling cannot be measured on one chip, but the sharded
trainer's per-device work CAN: under the ('data','model') mesh each device
rasterizes a horizontal slab of tile rows against the full primitive set
(fourdgs_tpu.parallel.trainer), and the only cross-device traffic in the
step is the parameter-gradient psum (+ the optional SSIM row gather). So

    efficiency(N) ≈ T_full / (N · (T_slab(1/N) + T_comm(N)))

where T_slab is measured HERE on the real chip (render fwd+bwd restricted
to 1/N of the tile rows via the production tile_rows/tile_row_offset path,
with the per-shard instance budget the mesh run would use) and T_comm is
bounded analytically (param-grad psum bytes / ICI bandwidth). Writes
SCALING.md with the table, extrapolation, and every assumption.

Also records dryrun step parity at 2/4/8 virtual CPU devices (separate
process each, JAX_PLATFORMS=cpu) — the functional half of the evidence.

Usage: python scripts/measure_scaling.py  (on the TPU host)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            _ = leaf.ravel()[0].item()
            return


def timeit(fn, *args, iters=15, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def measure_slabs():
    """Per-shard work under the SHARD_PREPROCESS architecture
    (parallel/trainer.py): deform+preprocess on [P/N] + all-gathered table
    + binning/blend on the shard's interleaved tile rows.

    Measured on the real chip as two independently-timed halves (shard 0;
    interleaved rows are balanced by construction):
      A(P/N)  = deform + preprocess + table build fwd+bwd over P/N points
      B(N)    = rasterize_from_table fwd+bwd over the full-P table,
                restricted to rows {s + j·N} with the per-shard budget
    plus analytically-bounded collectives (table all-gather + grad psum).
    """
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import build_workload
    from fourdgs_tpu.configs.core import load_config
    from fourdgs_tpu.models import deformation as deform_lib
    from fourdgs_tpu.models import gaussians as _G
    from fourdgs_tpu.ops import constants as C
    from fourdgs_tpu.ops.preprocess import preprocess
    from fourdgs_tpu.ops.rasterize import build_table, rasterize_from_table

    H = W = 800
    _, state, _, cams, _ = build_workload(height=H, width=W)
    params = state.params
    cam0 = jax.tree.map(lambda x: x[0], cams)
    grid_y = (H + C.TILE_Y - 1) // C.TILE_Y  # 50
    P = params["xyz"].shape[0]

    cfg = load_config()
    cfg.hidden.multires = (1, 2)
    cfg.hidden.net_width = 64
    cfg.hidden.defor_depth = 1
    cfg.hidden.no_dx = False
    bg = jnp.zeros(3)
    t_sc = jnp.float32(0.4)

    def pre_table(xyz, scaling, rotation, opacity, shs):
        """deform + activations + preprocess + packed table (bf16)."""
        tt = jnp.broadcast_to(t_sc, (xyz.shape[0],))
        xyz_d, scaling, rotation, opacity, shs = deform_lib.deform(
            params["deform"], cfg.hidden, state.aabb,
            xyz, scaling, rotation, opacity, shs, tt,
        )
        opac = jax.nn.sigmoid(opacity).reshape(-1)
        rot = rotation / jnp.maximum(
            jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
        )
        pre = preprocess(
            xyz_d, jnp.exp(scaling), rot, shs,
            cam0.camera_center, cam0.world_view, cam0.full_proj,
            float(cam0.tanfovx), float(cam0.tanfovy), W, H, 3,
            opacities=opac,
        )
        table = build_table(pre, opac, pre.means2d, jnp.bfloat16)
        return (jnp.sum(table.astype(jnp.float32)), pre)

    shs_full = _G.get_features(params)

    pre_ms = {}
    for n_model in (1, 2, 4, 8):
        Pl = P // n_model
        args = (params["xyz"][:Pl], params["scaling"][:Pl],
                params["rotation"][:Pl], params["opacity"][:Pl],
                shs_full[:Pl])

        f = jax.jit(jax.grad(
            lambda *a: pre_table(*a)[0], argnums=(0, 1, 2, 3, 4)
        ))
        pre_ms[n_model] = timeit(f, *args)
        print(f"deform+preprocess+table P/{n_model} ({Pl}): "
              f"{pre_ms[n_model]:.2f} ms")

    # full-P table + rect ints, computed once (inputs to the blend half)
    @jax.jit
    def make_inputs():
        _, pre = pre_table(params["xyz"], params["scaling"],
                           params["rotation"], params["opacity"], shs_full)
        opac = jax.nn.sigmoid(params["opacity"]).reshape(-1)
        table = build_table(pre, opac, pre.means2d, jnp.bfloat16)
        return (table, pre.tile_min, pre.tile_max, pre.tiles_touched,
                pre.depths, pre.radii)

    table, tmin, tmax, tt_full, depths, radii = jax.tree.map(
        jax.lax.stop_gradient, make_inputs()
    )

    results = []
    for n_model in (1, 2, 4, 8):
        rows = -(-grid_y // n_model)

        def blend_half(table, rows=rows, stride=n_model, budget=None):
            out = rasterize_from_table(
                table, tmin, tmax, tt_full, depths, radii,
                table[:, 0:2].astype(jnp.float32),
                W, H, bg, budget,
                tile_row_offset=0, tile_rows=rows, tile_row_stride=stride,
                tile_space=True,
            )
            return out

        probe = jax.jit(
            lambda t: blend_half(t, budget=384 * 1024).num_rendered
        )
        demand = int(probe(table))
        budget = max(-(-int(demand * 1.4) // 65536) * 65536, 65536)

        def loss(t, budget=budget):
            return jnp.sum(blend_half(t, budget=budget).color[:, :, :4])

        f = jax.jit(jax.grad(loss))
        ms = timeit(f, table)
        results.append({
            "n_model": n_model, "tile_rows": rows, "row_stride": n_model,
            "demand": demand, "budget": budget,
            "pre_fwd_bwd_ms": round(pre_ms[n_model], 3),
            "blend_fwd_bwd_ms": round(ms, 3),
        })
        print(f"model={n_model}: rows={rows} demand={demand} "
              f"budget={budget} blend-half fwd+bwd {ms:.2f} ms "
              f"(+pre {pre_ms[n_model]:.2f})")

    from bench import build_workload as _bw
    step, state2, adam_state, cams2, gts = _bw(height=H, width=W)
    full_step_ms = timeit(
        lambda: step(state2.params, adam_state, state2, cams2, gts, 1),
        iters=15,
    )
    print(f"full train step: {full_step_ms:.2f} ms")
    return results, full_step_ms


def dryrun_parities():
    rows = []
    for n in (2, 4, 8):
        code = (
            "import jax;"
            "jax.config.update('jax_platforms','cpu');"
            f"jax.config.update('jax_num_cpu_devices',{n});"
            "import __graft_entry__ as ge;"
            f"ge.dryrun_multichip({n})"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if "dryrun_multichip OK" in l]
        rows.append({"n_devices": n,
                     "ok": bool(line),
                     "line": line[0] if line else out.stderr[-300:]})
        print(rows[-1]["line"])
    return rows


ICI_GBPS = 186.0  # v5e per-link ICI budget (2 links × ~93 GB/s effective)


def main():
    slabs, full_ms = measure_slabs()
    parities = dryrun_parities()

    t1 = slabs[0]["pre_fwd_bwd_ms"] + slabs[0]["blend_fwd_bwd_ms"]
    rest_ms = max(full_ms - t1, 0.0)  # adam + loss glue + stats
    # collectives, ring cost 2·(N−1)/N × bytes over ICI:
    #   param-grad psum  ~17 MB (59 f32/prim + deform net)
    #   table all-gather ~4.6 MB (bf16 [P,16] table + rect ints + depths
    #   + dxyz), counted once fwd + once bwd (the reduce-scatter transpose)
    P_BYTES = 65536 * 59 * 4 + 2_000_000
    AG_BYTES = 65536 * (16 * 2 + 6 * 4 + 4 + 12)
    lines = []
    for s in slabs:
        n = s["n_model"]
        comm = (2 * (n - 1) / max(n, 1)
                * (P_BYTES + 2 * AG_BYTES) / (ICI_GBPS * 1e9) * 1e3)
        t_dev = (s["pre_fwd_bwd_ms"] + s["blend_fwd_bwd_ms"]
                 + rest_ms + comm)
        s["comm_est_ms"] = round(comm, 3)
        s["step_est_ms"] = round(t_dev, 3)
        # fixed global work (one 800×800 camera split over n slabs):
        # speedup = full_ms / t_dev, efficiency = speedup / n
        s["speedup_est"] = round(full_ms / t_dev, 3)
        lines.append(s)

    md = [
        "# SCALING — measured single-chip shard curve + extrapolation",
        "",
        "Multi-chip hardware is not available in this environment; this is",
        "the honest bound we CAN measure. Architecture (VERDICT r4 #4,",
        "`parallel/trainer.py` shard_preprocess): each shard runs",
        "deformation + preprocess over its [P/N] PRIMITIVE SLICE, "
        "all-gathers",
        "the packed 16-column payload table (~4.6 MB) over 'model', and",
        "bins/blends only its interleaved tile rows. Per-shard work is",
        "measured on the real chip in two halves:",
        "",
        "  A(P/N) = deform+preprocess+table fwd+bwd over the slice",
        "  B(N)   = binning+blend fwd+bwd over rows {s + j·N} at the",
        "           per-shard instance budget",
        "",
        f"plus fixed per-device work (Adam, loss glue: {rest_ms:.2f} ms =",
        "full step − A(P) − B(1)) and analytically-bounded collectives",
        f"({ICI_GBPS:.0f} GB/s ICI ring: ~17 MB grad psum + 2×4.6 MB table",
        "gather/reduce-scatter).",
        "",
        "All numbers below measured on the real v5e chip at HEAD",
        "(bench workload: 800×800, 65k Gaussians, fine stage).",
        "",
        "| model axis N | rows/shard | shard demand | per-shard budget |"
        " A: pre (ms) | B: blend (ms) | +fixed +comm (ms) | est. speedup |"
        " est. efficiency |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for s in lines:
        md.append(
            f"| {s['n_model']} | {s['tile_rows']} | {s['demand']} |"
            f" {s['budget']} | {s['pre_fwd_bwd_ms']} |"
            f" {s['blend_fwd_bwd_ms']} |"
            f" {s['step_est_ms']} | {s['speedup_est']} |"
            f" {round(s['speedup_est']/s['n_model'], 3)} |"
        )
    md += [
        "",
        f"Full single-device train step: **{full_ms:.2f} ms**.",
        "",
        "## Assumptions & caveats",
        "- The psum/gather estimates assume the 'model' axis rides ICI",
        "  (make_hybrid_mesh places it innermost for exactly this reason);",
        "  DCN ('data' axis) carries only scalar metrics psums + the",
        "  param-grad reduce across hosts, once per step.",
        "- Per-shard time under SPMD is the SLOWEST shard's. Tile rows are",
        "  INTERLEAVED (shard s owns rows s, s+N, ...), which balances the",
        "  strong center-of-image demand skew (the contiguous middle",
        "  1/2-slab of this scene holds 76% of instances and would cap",
        "  contiguous-slab efficiency at ~62%). The preprocess slice is a",
        "  contiguous [P/N] block — per-Gaussian cost is uniform, so slices",
        "  balance trivially. Shard 0 measured; budgets rounded to 64k.",
        "- Row interleaving makes each Gaussian bin on ~min(rect_h, N)",
        "  shards, so total blend-instance work grows with N — visible in",
        "  the demand column; with preprocess now scaling 1/N this is the",
        "  remaining efficiency cost at large N, along with the",
        "  N-independent Adam/loss glue.",
        "- Isolated-call timings carry a ~1 ms dispatch floor EACH; the",
        "  A+B sum therefore over-states the per-shard step by up to ~2 ms,",
        "  making these efficiency numbers conservative.",
        "- No measurement of host-side dispatch overlap across processes",
        "  (scripts/multihost_smoke.py measures the 2-process gloo lane;",
        "  per-step dispatch is identical code).",
        "",
        "## Dryrun step parity (virtual CPU devices)",
        "",
    ]
    for p in parities:
        md.append(f"- {p['n_devices']} devices: "
                  f"{'OK — ' + p['line'] if p['ok'] else 'FAIL — ' + p['line']}")
    md.append("")

    # host-axis (≥80% at N≥2 hosts): measured numbers from
    # scripts/measure_multihost.py if its JSON is present
    mh_path = os.path.join(os.path.dirname(__file__), "..",
                           "MULTIHOST.json")
    if os.path.exists(mh_path):
        with open(mh_path) as f:
            mh = json.load(f)
        md += [
            "## Host axis (the ≥80%-at-N≥2-hosts target) — MEASURED",
            "",
            "Hosts map to the 'data' axis; per-step cross-host traffic is",
            "ONE parameter-gradient allreduce "
            f"(~{mh['grad_tree_mb']} MB). Measured over the real",
            "2-process jax.distributed (gloo) lane"
            f" (scripts/measure_multihost.py, {mh['host_cpus']}-CPU host):",
            "",
            f"- 17 MB grad allreduce, 2-process gloo loopback:"
            f" **{mh['psum17MB_ms_2p_gloo']} ms**"
            f" ({mh['gloo_allreduce_gbps']} GB/s effective)",
            f"- step-shaped program 1p → 2p: {mh['step_ms_1p']} →"
            f" {mh['step_ms_2p_worst']} ms ({mh['step_note']})",
            f"- projected host-axis efficiency vs the measured"
            f" {mh['tpu_step_ms_assumed']} ms TPU step:"
            f" **{mh['projected_host_axis_efficiency_at_dcn_rate']}** at"
            f" nominal 25 GB/s DCN"
            f" ({mh['psum17MB_ms_at_25GBps_dcn']} ms psum), "
            f" {mh['projected_host_axis_efficiency_at_gloo_rate']} even at"
            " the gloo-loopback floor rate",
            "",
        ]
    md.append("Raw JSON: `SCALING.json`.")

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "SCALING.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    with open(os.path.join(root, "SCALING.json"), "w") as f:
        json.dump({"slabs": lines, "full_step_ms": full_ms,
                   "rest_ms": rest_ms, "parity": parities}, f, indent=1)
    print("wrote SCALING.md + SCALING.json")


if __name__ == "__main__":
    main()
