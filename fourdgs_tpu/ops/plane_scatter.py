"""Pallas TPU kernel: bilinear plane-gradient accumulation without scatter.

The backward of a bilinear grid sample is classically a 4-corner scatter-add
(the CUDA reference relies on atomicAdd via torch's grid_sample backward).
XLA's TPU scatter costs ~7 ns per update row, so the 4 corners × P points of
every spatial HexPlane made the scatter-adds ~25% of a whole train step.

This kernel exploits the separable structure instead: with the two-nonzero
interpolation matrices Ax [P, Ra] (weights 1−wx, wx at rows x0, x0+1) and
By [P, Rb],

    dG[a, b, f] = Σ_p Ax[p, a] · By[p, b] · dout[p, f]
                = Axᵀ @ (By ⊙ dout_f)   for each feature column f

— MXU matmuls over point chunks with the [F, Ra, Rb] accumulator resident
in VMEM; the weight matrices are generated in-register per chunk and never
touch HBM. Precision HIGHEST keeps gradients effectively float32-exact.

Used by fourdgs_tpu.models.hexplane for the spatial planes; temporal planes
use the dense t-slice matmul sampler (one shared camera time) and need no
kernel at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

CHP = 512  # points per chunk


def _weight_matrix(i0, w, R):
    """[n, R] two-nonzero rows: 1−w at column i0, w at i0+1 (border-safe:
    i0 == R−1 implies w == 0, so the dropped i0+1 == R column carries no
    weight — identical to clamped bilinear). i0/w are [n, 1]."""
    n = i0.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (n, R), 1)
    return jnp.where(lanes == i0, 1.0 - w, 0.0) + jnp.where(
        lanes == i0 + 1, w, 0.0
    )


def _kernel(x0_ref, y0_ref, wx_ref, wy_ref, du_ref, out_ref, Ra, Rb, F):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros((F, Ra, Rb), jnp.float32)

    ax = _weight_matrix(x0_ref[...], wx_ref[...], Ra)   # [CHP, Ra]
    by = _weight_matrix(y0_ref[...], wy_ref[...], Rb)   # [CHP, Rb]
    du = du_ref[...]                                    # [CHP, F]
    for f in range(F):
        m = by * du[:, f:f + 1]                         # [CHP, Rb]
        out_ref[f] += jax.lax.dot_general(
            ax, m, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def plane_grad(x0, y0, wx, wy, dout, Ra: int, Rb: int,
               interpret: bool = False):
    """Accumulate bilinear sample cotangents into a [Ra, Rb, F] plane grad.

    x0/y0 [P] int32 lower corner indices, wx/wy [P] f32 fractional weights,
    dout [P, F] f32 upstream cotangents.
    """
    P, F = dout.shape
    pad = (-P) % CHP
    if pad:
        x0 = jnp.pad(x0, (0, pad))
        y0 = jnp.pad(y0, (0, pad))
        wx = jnp.pad(wx, (0, pad))
        wy = jnp.pad(wy, (0, pad))
        dout = jnp.pad(dout, ((0, pad), (0, 0)))  # zero rows: zero weight
    n = x0.shape[0] // CHP

    out = pl.pallas_call(
        functools.partial(_kernel, Ra=Ra, Rb=Rb, F=F),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((CHP, 1), lambda i: (i, 0)),
            pl.BlockSpec((CHP, 1), lambda i: (i, 0)),
            pl.BlockSpec((CHP, 1), lambda i: (i, 0)),
            pl.BlockSpec((CHP, 1), lambda i: (i, 0)),
            pl.BlockSpec((CHP, F), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((F, Ra, Rb), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, Ra, Rb), jnp.float32),
        interpret=interpret,
    )(
        x0.reshape(-1, 1), y0.reshape(-1, 1),
        wx.reshape(-1, 1), wy.reshape(-1, 1), dout,
    )
    return out.transpose(1, 2, 0)  # [Ra, Rb, F]
