"""Deformation network: HexPlane features → per-Gaussian deltas.

Parity target: reference scene/deformation.py (Deformation + deform_network).
Architecture (deformation.py:45-65):

  feature_out = Linear(feat_dim → W) + (D−1) × [ReLU, Linear(W → W)]
  five heads, each  [ReLU, Linear(W → W), ReLU, Linear(W → head_out)]:
      pos_deform → 3, scales_deform → 3, rotations_deform → 4,
      opacity_deform → 1, shs_deform → K·3

forward_dynamic (deformation.py:97-148): deformed = raw·mask + delta with
mask ≡ 1 in the default path (static_mlp/empty_voxel off); rotations are
raw + dr (or a quaternion product when apply_rotation). Per-head disable
flags no_dx/no_ds/no_dr/no_do/no_dshs return the raw tensor unchanged.

Differences by design:
- The reference computes positional-encoding embeddings that the default path
  never reads (query_time consumes only xyz and t, deformation.py:67-83, and
  the timenet is dead code at :199-204); we skip that wasted compute. The
  timenet parameters are still created for optimizer-group/checkpoint parity.
- shs head width adapts to the actual SH coefficient count instead of the
  hard-coded 16·3 (deformation.py:65), fixing the reference's incompatibility
  between sh_degree=0 and no_dshs=False.

Init parity (deformation.py:218-223): weights Xavier-uniform (gain 1); biases
keep the torch.nn.Linear default U(−1/√fan_in, 1/√fan_in) (the reference's
initialize_weights touches only weights — twice, due to its own bug).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from fourdgs_tpu.configs.core import ModelHiddenParams
from fourdgs_tpu.models import hexplane
from fourdgs_tpu.utils import quaternion as quat

HEADS = ("pos", "scales", "rotations", "opacity", "shs")


def _init_linear(key: jax.Array, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    # Xavier-uniform weight, torch-default bias.
    limit_w = math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -limit_w, limit_w)
    limit_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -limit_b, limit_b)
    return {"w": w, "b": b}


def init_deformation(
    key: jax.Array, hidden: ModelHiddenParams, sh_coeffs: int
) -> dict[str, Any]:
    """Build the full deformation parameter pytree (grids + MLP + heads).

    Keys containing "grid" belong to the grid LR group; everything else to
    the deformation LR group (reference deformation.py:149-160 name split).
    """
    W = hidden.net_width
    D = hidden.defor_depth
    fdim = hexplane.feat_dim(hidden.kplanes_config, hidden.multires)
    in_dim = 4 if hidden.no_grid else fdim

    n_keys = 1 + (1 + max(D - 1, 0)) + 2 * len(HEADS) + 2
    keys = iter(jax.random.split(key, n_keys))

    params: dict[str, Any] = {}
    params.update(
        init_hexplane_group(next(keys), hidden)
    )
    layers = [_init_linear(next(keys), in_dim, W)]
    for _ in range(max(D - 1, 0)):
        layers.append(_init_linear(next(keys), W, W))
    params["feature_out"] = layers
    head_out = {"pos": 3, "scales": 3, "rotations": 4, "opacity": 1,
                "shs": sh_coeffs * 3}
    for h in HEADS:
        params[f"head_{h}"] = [
            _init_linear(next(keys), W, W),
            _init_linear(next(keys), W, head_out[h]),
        ]
        if getattr(hidden, "zero_init_heads", False):
            # deltas start at exactly 0 (see configs.core.zero_init_heads)
            params[f"head_{h}"][-1] = {
                "w": jnp.zeros((W, head_out[h]), jnp.float32),
                "b": jnp.zeros((head_out[h],), jnp.float32),
            }
    # timenet: structurally present, unused (deformation.py:174-176,199-204).
    times_ch = 2 * hidden.timebase_pe + 1
    params["timenet"] = [
        _init_linear(next(keys), times_ch, hidden.timenet_width),
        _init_linear(next(keys), hidden.timenet_width, hidden.timenet_output),
    ]
    return params


def init_hexplane_group(key: jax.Array, hidden: ModelHiddenParams):
    if hidden.no_grid:
        return {}
    return hexplane.init_hexplane(key, hidden.kplanes_config, hidden.multires)


def _mlp(layers, x, relu_first: bool):
    for i, lyr in enumerate(layers):
        if relu_first or i > 0:
            x = jax.nn.relu(x)
        x = x @ lyr["w"] + lyr["b"]
    return x


def query_time(
    params: dict[str, Any],
    hidden: ModelHiddenParams,
    aabb: jnp.ndarray,
    xyz: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """HexPlane features → hidden vector (deformation.py:67-83).

    ``t`` may be per-point [N]/[N,1] or a scalar (all points share one
    camera time — enables the hexplane temporal matmul fast path)."""
    if hidden.no_grid:
        t_col = jnp.broadcast_to(
            jnp.reshape(t, (-1, 1)), (xyz.shape[0], 1)
        )
        h = jnp.concatenate([xyz, t_col], axis=-1)
    else:
        h = hexplane.query_hexplane(
            params, aabb, xyz, t, len(hidden.multires)
        )
    # feature_out: first Linear has no preceding ReLU (deformation.py:52-60).
    return _mlp(params["feature_out"], h, relu_first=False)


def deform(
    params: dict[str, Any],
    hidden: ModelHiddenParams,
    aabb: jnp.ndarray,
    xyz: jnp.ndarray,        # [N,3] raw (pre-activation) positions
    scales: jnp.ndarray,     # [N,3] raw log-scales
    rotations: jnp.ndarray,  # [N,4] raw quaternions
    opacity: jnp.ndarray,    # [N,1] raw opacity logits
    shs: jnp.ndarray,        # [N,K,3]
    t: jnp.ndarray,          # [N], [N,1], or scalar (shared camera time)
):
    """forward_dynamic (deformation.py:97-148): apply per-head deltas.

    Operates on *raw* parameters; activations (exp/sigmoid/normalize) are
    applied after deformation, matching gaussian_renderer/__init__.py:97-99.
    """
    hvec = query_time(params, hidden, aabb, xyz, t)

    if hidden.no_dx:
        out_xyz = xyz
    else:
        out_xyz = xyz + _mlp(params["head_pos"], hvec, relu_first=True)
    if hidden.no_ds:
        out_scales = scales
    else:
        out_scales = scales + _mlp(params["head_scales"], hvec, relu_first=True)
    if hidden.no_dr:
        out_rot = rotations
    else:
        dr = _mlp(params["head_rotations"], hvec, relu_first=True)
        if hidden.apply_rotation:
            out_rot = quat.multiply(rotations, dr)
        else:
            out_rot = rotations + dr
    if hidden.no_do:
        out_op = opacity
    else:
        out_op = opacity + _mlp(params["head_opacity"], hvec, relu_first=True)
    if hidden.no_dshs:
        out_shs = shs
    else:
        dshs = _mlp(params["head_shs"], hvec, relu_first=True)
        out_shs = shs + dshs.reshape(shs.shape)

    return out_xyz, out_scales, out_rot, out_op, out_shs


def split_param_labels(params: dict[str, Any]) -> dict[str, Any]:
    """Label each leaf "grid" or "deformation" for per-group LRs."""
    return {
        k: jax.tree.map(lambda _: "grid" if "grid" in k else "deformation", v)
        for k, v in params.items()
    }
