"""fourdgs_tpu — TPU-native 4D Gaussian Splatting trainer/renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
houchenfeng/4DGaussians-fast-train (CVPR 2024 4DGaussians + Instant4D fast-train
extensions), designed TPU-first:

- The CUDA tile rasterizer (reference: submodules/depth-diff-gaussian-rasterization)
  becomes a fixed-shape JAX binning pass + Pallas tile blend kernels under a
  ``jax.custom_vjp`` (``fourdgs_tpu.ops``).
- The HexPlane multi-resolution grid + deformation MLP (reference: scene/hexplane.py,
  scene/deformation.py) run as fused XLA (``fourdgs_tpu.models``).
- Adaptive densification (reference: scene/gaussian_model.py:316-523) uses a
  fixed-capacity alive-mask design — no optimizer-state surgery, jit-stable shapes.
- Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` (``fourdgs_tpu.parallel``)
  replaces the reference's single-GPU, shell-script-per-scene model.
"""

__version__ = "0.1.0"
