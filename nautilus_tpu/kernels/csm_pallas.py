"""Pallas TPU kernels for the CSM coarse correlation stage.

Two kernels:

1. ``correlate_pallas`` — the original correlation-only kernel
   (rasters arrive as an HBM input): scores[r, oy, ox] =
   sum_{ky,kx} K[r, ky, kx] * T[oy+ky, ox+kx].  Kept as a reference
   implementation / oracle for the XLA paths.

2. ``fused_coarse_pallas`` — the fused raster+correlate stage.  Each
   grid program takes one (pair, rotation-block) cell, rotates the
   source cloud in registers, builds the one-hot occupancy raster with
   an MXU contraction directly in VMEM, and correlates it against the
   (VMEM-resident) coarse lookup table — the [R, P, cells] one-hots,
   the [R, cells, cells] rasters, and the [O, kh*kw] im2col patches
   never exist in HBM.

MEASURED AND RETIRED TO ORACLE ROLE (round 5, VERDICT r4 item 6):
at production shapes (C=4, 320 rotations, cells 200, offsets 15^2)
the fused kernel runs the coarse sweep in 46.6 ms vs the XLA
stage-major im2col path's 37.0 ms — 0.79x — and pays a 138 s Mosaic
compile (benchmarks/logs/csm-fused-pallas-ab.log;
benchmarks/csm_fused_pallas_ab.py to reproduce).  The correlation is
the dominant work and the XLA path contracts it on the MXU
([R, kh*kw] @ [kh*kw, O] in bf16), while the in-kernel shifted-window
reduction is VPU-bound; eliminating the HBM raster/patch traffic does
not make up the compute-unit gap on v5e.  Both kernels stay as exact
f32 oracles for the bf16 production path (tests/test_loop_closure.py
TestCorrelatePaths; argmax parity is the correctness bar — the fine
stages rescore continuously).
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


def _fused_coarse_kernel(pts_ref, theta_ref, table_ref, out_ref, *,
                         cells, noff, halfwidth, res, rot_block):
    """One (pair, rotation-block) grid cell: rotate -> raster (MXU) ->
    correlate, for ``rot_block`` rotations.

    pts_ref   [1, P, 2]        parked source points (masked points at 1e6:
                               they rotate to out-of-range cells and match
                               no one-hot column, as in csm._raster)
    theta_ref [C, R]           all rotation angles (SMEM, whole array —
                               TPU block-shape rules disallow a 1-row
                               slice of a multi-row SMEM operand)
    table_ref [1, T, T]        this pair's coarse log-occupancy table
    out_ref   [1, rot_block, noff, noff]
    """
    pts = pts_ref[0]                                  # [P, 2]
    table = table_ref[0]
    # Every intermediate stays rank >= 2: Mosaic's layout assignment
    # rejects rank-1 vectors in several of these ops.
    x = pts[:, 0:1]                                   # [P, 1]
    y = pts[:, 1:2]
    p = x.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, cells), 1)
    ci = pl.program_id(0)
    r0 = pl.program_id(1) * rot_block
    for g in range(rot_block):
        th = theta_ref[ci, r0 + g]
        c, s = jnp.cos(th), jnp.sin(th)
        rx = c * x - s * y                            # [P, 1]
        ry = s * x + c * y
        ix = jnp.floor((rx + halfwidth) / res).astype(jnp.int32)
        iy = jnp.floor((ry + halfwidth) / res).astype(jnp.int32)
        ohx = (ix == cols).astype(jnp.bfloat16)       # [P, cells]
        ohy = (iy == cols).astype(jnp.bfloat16)
        raster = jax.lax.dot_general(
            ohy, ohx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [cells, cells]
        rows = []
        for oy in range(noff):
            # Vectorize the ox offsets: one [noff, cells, cells] stack of
            # x-shifted table windows, one broadcast multiply + staged
            # reduce on the VPU.  (A fully scalar 225-way stack hits a
            # Mosaic concatenate limitation.)
            shifted = jnp.stack(
                [table[oy:oy + cells, ox:ox + cells] for ox in range(noff)])
            part = jnp.sum(shifted * raster[None], axis=2)     # [noff, cells]
            rows.append(jnp.sum(part, axis=1, keepdims=True))  # [noff_ox, 1]
        # [noff_ox, noff_oy]: transposed offset order; the host wrapper
        # swaps the last two axes back.
        out_ref[0, g] = jnp.concatenate(rows, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("cells", "noff", "halfwidth", "res",
                                    "rot_block", "interpret"))
def fused_coarse_pallas(parked_pts, thetas, tables, *, cells: int,
                        noff: int, halfwidth: float, res: float,
                        rot_block: int = 8, interpret: bool = False):
    """Fused coarse stage over pairs x rotations.

    parked_pts [C, P, 2] f32 (masked points parked out of range)
    thetas     [C, R]    f32 rotation angles per pair; R must be a
                         multiple of rot_block (pad with repeats)
    tables     [C, T, T] f32 coarse log tables, T = cells + noff - 1
    Returns scores [C, R, noff, noff] f32 (reshape to [C, R, noff*noff]
    for the stage-major engine's flattened-offset contract).
    """
    C, P, _ = parked_pts.shape
    R = thetas.shape[1]
    T = tables.shape[1]
    assert T == cells + noff - 1, (T, cells, noff)
    assert R % rot_block == 0, (R, rot_block)
    out = pl.pallas_call(
        functools.partial(_fused_coarse_kernel, cells=cells, noff=noff,
                          halfwidth=halfwidth, res=res,
                          rot_block=rot_block),
        grid=(C, R // rot_block),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, P, 2), lambda c, r: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, R), lambda c, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, T), lambda c, r: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rot_block, noff, noff),
                               lambda c, r: (c, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, R, noff, noff), jnp.float32),
    )(parked_pts, thetas, tables)
    # The kernel emits [.., ox, oy] (columns are cheap to concatenate
    # in-kernel); restore the engine's [.., oy, ox] order here.
    return jnp.swapaxes(out, -1, -2)
