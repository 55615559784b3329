#!/usr/bin/env python3
"""Aggregate results.json across runs (scripts/read_all_metrics.py parity).

    python scripts/read_all_metrics.py output/
"""

import glob
import json
import sys


def main(root="output"):
    rows = []
    for path in sorted(glob.glob(f"{root}/**/results.json", recursive=True)):
        data = json.load(open(path))
        for method, vals in data.items():
            rows.append((path.replace("/results.json", ""), method, vals))
    if not rows:
        print("no results.json found")
        return
    keys = [k for k in rows[0][2] if rows[0][2][k] is not None]
    print(f"{'run':40s} {'method':12s} " + " ".join(f"{k:>9s}" for k in keys))
    for run, method, vals in rows:
        print(f"{run:40s} {method:12s} "
              + " ".join(f"{vals[k]:9.4f}" for k in keys))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "output")
