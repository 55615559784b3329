"""Adam with explicit, surgically-accessible moment pytrees + LR schedules.

The reference drives torch.optim.Adam with 8 named param groups, per-group
exponential LR schedules, and direct exp_avg/exp_avg_sq surgery during
densification (gaussian_model.py:165-212, 316-388). Here the moments are
plain pytrees shaped like the params — densify/prune zero them by scatter
(fourdgs_tpu.models.densify), and per-leaf learning rates arrive as a pytree
computed from the schedules each step. eps matches the reference's 1e-15.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.configs.core import OptimizationParams


class AdamState(NamedTuple):
    mu: Any    # first moments, shaped like params
    nu: Any    # second moments
    count: jnp.ndarray  # [] int32 step counter


def init(params) -> AdamState:
    zeros = lambda p: jax.tree.map(jnp.zeros_like, p)
    return AdamState(mu=zeros(params), nu=zeros(params), count=jnp.int32(0))


# Per-Gaussian parameter leaves in packing order (see _packed_update).
_PRIM_ORDER = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


def _adam_math(p, m, v, g, lr, c1, c2, b1, b2, eps):
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps), m, v


def update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step with a per-leaf learning-rate pytree.

    The per-Gaussian leaves ([P,3], [P,1], [P,4], ...) are packed into ONE
    [P,59] matrix (and the moments likewise) before the moment math: narrow
    [P,k] arrays tile to (8,128) vregs with ≤4 of 128 lanes useful, so six
    separate tree-mapped fusions waste ~30× VPU/HBM throughput — measured
    5.2 ms of the 33 ms train step on v5e; packed it is lane-dense. The
    lane concat/split pair costs two cheap copies and XLA fuses them with
    the moment math. Non-prim subtrees (the deformation net) keep the plain
    per-leaf map. Results are bit-identical: same elementwise math, same
    order, only the storage lanes change.
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    prim = isinstance(params, dict) and all(
        k in params for k in _PRIM_ORDER
    )
    if prim:
        P = params["xyz"].shape[0]
        shapes = {k: params[k].shape for k in _PRIM_ORDER}
        widths = [int(np.prod(shapes[k][1:])) for k in _PRIM_ORDER]

        def pack(tree):
            return jnp.concatenate(
                [tree[k].reshape(P, -1) for k in _PRIM_ORDER], axis=1
            )

        def unpack(mat):
            parts = jnp.split(mat, list(np.cumsum(widths))[:-1], axis=1)
            return {
                k: part.reshape(shapes[k])
                for k, part in zip(_PRIM_ORDER, parts)
            }

        lr_row = jnp.concatenate([
            jnp.broadcast_to(
                jnp.asarray(lr_tree[k], jnp.float32).reshape(-1), (w,)
            )
            for k, w in zip(_PRIM_ORDER, widths)
        ])
        new_p, new_m, new_v = _adam_math(
            pack(params), pack(state.mu), pack(state.nu), pack(grads),
            lr_row, c1, c2, b1, b2, eps,
        )
        new_params = unpack(new_p)
        mu = unpack(new_m)
        nu = unpack(new_v)
        for k in params:
            if k in _PRIM_ORDER:
                continue
            mu[k] = jax.tree.map(
                lambda m, g: b1 * m + (1 - b1) * g, state.mu[k], grads[k]
            )
            nu[k] = jax.tree.map(
                lambda v, g: b2 * v + (1 - b2) * g * g,
                state.nu[k], grads[k],
            )
            new_params[k] = jax.tree.map(
                lambda p, m, v, lr: p - lr * (m / c1) / (
                    jnp.sqrt(v / c2) + eps
                ),
                params[k], mu[k], nu[k], lr_tree[k],
            )
        return new_params, AdamState(mu=mu, nu=nu, count=count)

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    new_params = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, mu, nu, lr_tree,
    )
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear LR interpolation with optional sine delay.

    Parity: get_expon_lr_func (utils/general_utils.py:35-66). Traced-step
    safe (jnp ops only).
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.float32(0.0)
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        (1 - t) * math.log(max(lr_init, 1e-30))
        + t * math.log(max(lr_final, 1e-30))
    )
    return delay_rate * log_lerp


def learning_rates(
    step, opt: OptimizationParams, spatial_lr_scale: float
) -> dict[str, jnp.ndarray]:
    """Per-group LRs at `step` (training_setup + update_learning_rate,
    gaussian_model.py:165-212). Groups: xyz/deformation/grid scheduled;
    f_dc/f_rest/opacity/scaling/rotation constant; f_rest = feature_lr/20."""
    sls = spatial_lr_scale
    return {
        "xyz": expon_lr(
            step, opt.position_lr_init * sls, opt.position_lr_final * sls,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        ),
        "deformation": expon_lr(
            step, opt.deformation_lr_init * sls, opt.deformation_lr_final * sls,
            lr_delay_mult=opt.deformation_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        ),
        "grid": expon_lr(
            step, opt.grid_lr_init * sls, opt.grid_lr_final * sls,
            lr_delay_mult=opt.deformation_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        ),
        "f_dc": jnp.float32(opt.feature_lr),
        "f_rest": jnp.float32(opt.feature_lr / 20.0),
        "opacity": jnp.float32(opt.opacity_lr),
        "scaling": jnp.float32(opt.scaling_lr),
        "rotation": jnp.float32(opt.rotation_lr),
    }


def lr_tree_for_params(params, lrs: dict[str, jnp.ndarray]):
    """Broadcast the group LRs onto the parameter pytree.

    Top-level primitive leaves map by name; the "deform" subtree maps by the
    "grid"-in-key rule (reference deformation.py:149-160)."""
    out = {}
    for k, v in params.items():
        if k == "deform":
            out[k] = {
                dk: jax.tree.map(
                    lambda _: lrs["grid"] if "grid" in dk else lrs["deformation"],
                    dv,
                )
                for dk, dv in v.items()
            }
        else:
            out[k] = jax.tree.map(lambda _: lrs[k], v)
    return out
