"""Ground-truth per-op device profile of the bench train step.

Collects a jax.profiler trace of the full jitted step on the real chip and
aggregates DEVICE-side op durations from the xplane — the only per-stage
numbers on the remote-attached backend that are not polluted by the ~1 ms
host dispatch floor (profile_step.py) or by dead-code elimination in
ablated variants (ablate_step.py).

Usage: python scripts/trace_step.py [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_trace(tmpdir: str):
    import jax

    from fourdgs_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import build_workload

    step, state, adam_state, cams, gts = build_workload()
    params = state.params
    for i in range(3):
        params, adam_state, state, m = step(
            params, adam_state, state, cams, gts, i + 1
        )
    _ = float(m["loss"])
    with jax.profiler.trace(tmpdir):
        for i in range(5):
            params, adam_state, state, m = step(
                params, adam_state, state, cams, gts, 10 + i
            )
        _ = float(m["loss"])


def parse_xplane(tmpdir: str, top: int, steps: int = 5):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tmpdir}"
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    # device planes: '/device:TPU:0' etc.
    agg = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        if "TPU" not in plane.name or "#Chip" not in plane.name and \
                "device" not in plane.name.lower():
            pass
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps
                total_ps += ev.duration_ps
    if not agg:
        print("no TPU plane found; planes:",
              [p.name for p in space.planes])
        return

    print(f"device total: {total_ps/1e9/steps:.3f} ms/step "
          f"(sum of op durations / {steps} steps)")
    print(f"{'op (aggregated)':64s} {'ms/step':>9s}")

    # collapse fusion suffixes like ".123" and "fusion.42" → "fusion"
    def base(n):
        n = re.sub(r"\.\d+$", "", n)
        return n

    byname = collections.Counter()
    for k, v in agg.items():
        byname[base(k)] += v
    for name, ps in byname.most_common(top):
        print(f"{name[:64]:64s} {ps/1e9/steps:9.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    tmpdir = tempfile.mkdtemp(prefix="fourdgs_trace_")
    collect_trace(tmpdir)
    parse_xplane(tmpdir, args.top)
    print(f"(raw trace: {tmpdir})")


if __name__ == "__main__":
    main()
