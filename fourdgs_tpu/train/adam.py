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

from fourdgs_tpu.configs.core import OptimizationParams


class AdamState(NamedTuple):
    mu: Any    # first moments, shaped like params
    nu: Any    # second moments
    count: jnp.ndarray  # [] int32 step counter


def init(params) -> AdamState:
    zeros = lambda p: jax.tree.map(jnp.zeros_like, p)
    return AdamState(mu=zeros(params), nu=zeros(params), count=jnp.int32(0))


def update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step with a per-leaf learning-rate pytree."""
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
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
