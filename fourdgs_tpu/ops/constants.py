"""Numerical constants defining rasterizer behavior.

These pin down the exact semantics of the reference CUDA rasterizer so that the
JAX/Pallas implementation is allclose-comparable. Reference locations (in
houchenfeng/4DGaussians-fast-train, submodules/depth-diff-gaussian-rasterization):

- BLOCK_X/BLOCK_Y/NUM_CHANNELS: cuda_rasterizer/config.h:15-17
- near-plane cull threshold: cuda_rasterizer/auxiliary.h:154  (p_view.z <= 0.2)
- EWA Jacobian clamp factor: cuda_rasterizer/forward.cu:82-87 (±1.3·tanfov)
- low-pass dilation on the 2D covariance diagonal: forward.cu:110-111 (+0.3)
- alpha cap / alpha floor / transmittance stop: forward.cu:346-354
  (min(0.99,·), skip α<1/255, stop at T<1e-4)
- homogeneous-divide epsilon: forward.cu:199 (1/(w+1e-7))
- radius formula: forward.cu:229-232 (ceil(3·sqrt(λmax)), discriminant
  floor max(0.1, mid²−det))
"""

TILE_X = 16           # image tile width in pixels (config.h BLOCK_X)
TILE_Y = 16           # image tile height in pixels (config.h BLOCK_Y)
NUM_CHANNELS = 3

NEAR_PLANE_Z = 0.2          # cull Gaussians with view-space z <= this
EWA_CLAMP_FACTOR = 1.3      # clamp |x/z| to 1.3*tanfov before the EWA Jacobian
COV2D_DILATION = 0.3        # added to cov2D diagonal (antialias low-pass)
ALPHA_CAP = 0.99            # α = min(0.99, opacity * exp(power))
ALPHA_FLOOR = 1.0 / 255.0   # contributions with α below this are skipped
T_STOP = 1e-4               # blending stops once transmittance would drop below
W_EPS = 1e-7                # homogeneous divide: 1/(w + 1e-7)
RADIUS_SIGMA = 3.0          # screen radius = ceil(3·sqrt(λmax))
DET_FLOOR = 0.1             # floor inside sqrt of eigenvalue discriminant
