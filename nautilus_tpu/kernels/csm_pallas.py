"""Pallas TPU kernel for the CSM coarse correlation stage.

Computes scores[r, oy, ox] = sum_{ky,kx} K[r, ky, kx] * T[oy+ky, ox+kx]
(VALID 2D cross-correlation, rotations in the leading dim) — the inner loop
of correlative scan matching (kernels/csm.py).

Kernel structure: one grid program per rotation; the lookup table lives in
VMEM once and is reused by every program; the (small, static) offset grid
is fully unrolled into static slices, each reduced on the VPU.  For the
coarse stage's shapes (table ~200^2 f32 = ~160 KB, kernel ~130^2, offsets
~15^2) everything fits VMEM comfortably and each program is one pass of
~OH*OW fused multiply-reduces.

Numerically identical (up to f32 reduction order) to the XLA paths in
kernels/csm.py.  Kept as a reference implementation: the im2col-matmul
formulation there (_correlate_matmul) is faster on v5e because the
contraction runs on the MXU while this kernel reduces on the VPU over
unaligned static slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(table_ref, k_ref, out_ref, *, oh, ow, kh, kw):
    k = k_ref[0]                                   # [kh, kw]
    rows = []
    for oy in range(oh):
        cols = []
        for ox in range(ow):
            tile = table_ref[oy:oy + kh, ox:ox + kw]
            cols.append(jnp.sum(tile * k))
        rows.append(jnp.stack(cols))
    out_ref[0] = jnp.stack(rows)                   # [oh, ow]


@functools.partial(jax.jit, static_argnames=("interpret",))
def correlate_pallas(table, kernels, interpret: bool = False):
    """table [H, W] f32; kernels [R, kh, kw] f32 -> [R, H-kh+1, W-kw+1].

    interpret=True runs the kernel in Pallas interpret mode (any backend) —
    used by the CPU test suite to keep this reference implementation honest
    against the XLA paths.
    """
    h, w = table.shape
    r, kh, kw = kernels.shape
    oh, ow = h - kh + 1, w - kw + 1
    return pl.pallas_call(
        functools.partial(_corr_kernel, oh=oh, ow=ow, kh=kh, kw=kw),
        grid=(r,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, kw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, oh, ow), jnp.float32),
    )(table, kernels)
