#!/usr/bin/env bash
# COLMAP sparse+dense reconstruction for a captured scene.
# Parity: the reference's colmap.sh (feature_extractor -> matcher ->
# point_triangulator -> image_undistorter -> patch_match_stereo ->
# stereo_fusion producing <workdir>/colmap/dense/workspace/fused.ply).
#
#   ./colmap.sh <workdir> <llff|hypernerf|blender>
set -euo pipefail
workdir=${1:?usage: colmap.sh <workdir> <datatype>}
datatype=${2:?usage: colmap.sh <workdir> <datatype>}
command -v colmap >/dev/null || { echo "colmap binary not found in PATH"; exit 1; }
python scripts/"${datatype}"2colmap.py "$workdir"
rm -rf "$workdir/colmap/sparse/0"
colmap feature_extractor --database_path "$workdir/colmap/database.db" --image_path "$workdir/colmap/images"
python scripts/database.py --database_path "$workdir/colmap/database.db" --txt_path "$workdir/colmap/sparse_custom/cameras.txt"
colmap exhaustive_matcher --database_path "$workdir/colmap/database.db"
mkdir -p "$workdir/colmap/sparse/0"
colmap point_triangulator \
  --database_path "$workdir/colmap/database.db" \
  --image_path "$workdir/colmap/images" \
  --input_path "$workdir/colmap/sparse_custom" \
  --output_path "$workdir/colmap/sparse/0" \
  --clear_points 1
mkdir -p "$workdir/colmap/dense/workspace"
colmap image_undistorter --image_path "$workdir/colmap/images" \
  --input_path "$workdir/colmap/sparse/0" --output_path "$workdir/colmap/dense/workspace"
colmap patch_match_stereo --workspace_path "$workdir/colmap/dense/workspace"
colmap stereo_fusion --workspace_path "$workdir/colmap/dense/workspace" \
  --output_path "$workdir/colmap/dense/workspace/fused.ply"
