#!/usr/bin/env python3
"""Convert COLMAP sparse models between binary and text formats.

Parity target: the reference's scripts/colmap_converter.py (read_model /
write_model over cameras/images/points3D in both formats), built on
fourdgs_tpu.data.colmap_io — ids and point tracks are preserved, so
.bin → .txt → .bin round-trips losslessly.

Usage:
    python scripts/colmap_converter.py --input_model sparse/0 \
        --output_model sparse_txt --output_format .txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fourdgs_tpu.data.colmap_io import read_model_full, write_model


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Read and write COLMAP binary and text models"
    )
    ap.add_argument("--input_model", required=True)
    ap.add_argument("--input_format", choices=[".bin", ".txt"], default=None,
                    help="autodetected when omitted")
    ap.add_argument("--output_model", required=True)
    ap.add_argument("--output_format", choices=[".bin", ".txt"],
                    default=".txt")
    args = ap.parse_args(argv)

    cams, imgs, pts = read_model_full(args.input_model, args.input_format)
    print(f"read {len(cams)} cameras, {len(imgs)} images, "
          f"{len(pts)} points3D from {args.input_model}")
    write_model(cams, imgs, pts, args.output_model, args.output_format)
    print(f"wrote {args.output_format} model → {args.output_model}")


if __name__ == "__main__":
    main()
