"""Correlative scan matching (CSM) as dense 2D correlation on the MXU.

TPU-native rebuild of the reference's third_party CorrelativeScanMatcher
(Olson-style multi-resolution correlative matching; constructed with
(range=30, trans_range=2, low_res=0.3, high_res=0.01) at
src/optimization/solver.h:126 / solver.cc:56,633 and called as
``GetTransformation(cloud_a, cloud_b, angle_a, angle_b,
rotation_restriction)`` -> (score, (translation, rotation))).

Design: the translation search at a fixed rotation is exactly a 2D
cross-correlation between (a) a smeared occupancy lookup table rasterized
from the target cloud and (b) a raster of the rotated source cloud.  That
correlation is a convolution, so the whole (rotation x translation) search
runs as ONE ``lax.conv_general_dilated`` with rotations batched in the
filter dimension — the MXU does the scan matching.  Two resolutions:

- coarse: low_res cells over the full +-trans_range window, rotation step
  sized so one step moves the farthest point one cell;
- fine: high_res cells over +-1 coarse cell around the coarse argmax, with
  a correspondingly refined rotation sweep.

Scores are mean per-source-point log-occupancy of a Gaussian-smeared
target raster, normalized by point count — monotone with Olson's
log-likelihood formulation; the absolute scale of csm_score_threshold is
recalibrated for this engine (see DEVIATIONS.md).

An equivalent Pallas kernel for the coarse correlation lives in
kernels/csm_pallas.py and is used when enabled (see ``use_pallas``).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class CSMParams(NamedTuple):
    """Defaults mirror the reference ctor (solver.cc:56)."""

    scan_range: float = 30.0       # max scan extent from sensor
    trans_range: float = 2.0       # +- translation search window
    low_res: float = 0.3
    high_res: float = 0.01
    sigma: float = 0.06            # Gaussian smear of the lookup table
    rotation_restriction: float = math.pi / 2   # +- rotation window
    # Pallas coarse-correlation kernel: ~2.4x faster than the XLA conv on
    # v5e AND exact f32 (the conv lowers to bf16 passes).  Auto-disabled on
    # non-TPU backends.
    use_pallas: bool = True

    @property
    def table_halfwidth(self) -> float:
        return self.scan_range + self.trans_range

    def kernel_cells(self, res: float) -> int:
        return int(round(2 * self.scan_range / res))

    def offset_cells(self, res: float) -> int:
        return int(round(self.trans_range / res))

    def table_cells(self, res: float) -> int:
        # Exactly kernel + 2*offset so VALID correlation covers +-trans_range.
        return self.kernel_cells(res) + 2 * self.offset_cells(res)


def _raster(points, mask, halfwidth, res, cells):
    """Point counts per cell, [cells, cells]; row = y, col = x."""
    ij = jnp.floor((points + halfwidth) / res).astype(jnp.int32)
    ok = (mask & (ij[..., 0] >= 0) & (ij[..., 0] < cells)
          & (ij[..., 1] >= 0) & (ij[..., 1] < cells))
    ij = jnp.clip(ij, 0, cells - 1)
    flat = ij[..., 1] * cells + ij[..., 0]
    img = jnp.zeros((cells * cells,), jnp.float32).at[flat].add(
        ok.astype(jnp.float32))
    return img.reshape(cells, cells)


def _smear_log_table(raster, res, sigma):
    """Gaussian-blur occupancy -> log table, via separable conv."""
    radius = max(int(round(3 * sigma / res)), 1)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32) * res
    kern = jnp.exp(-0.5 * (xs / sigma) ** 2)
    img = raster[None, None]                      # NCHW
    k1 = kern[None, None, :, None]
    k2 = kern[None, None, None, :]
    pad = [(radius, radius), (0, 0)]
    img = jax.lax.conv_general_dilated(img, k1, (1, 1), pad)
    pad = [(0, 0), (radius, radius)]
    img = jax.lax.conv_general_dilated(img, k2, (1, 1), pad)
    occ = jnp.clip(img[0, 0], 0.0, 1.0)
    return jnp.log(occ + 1e-6)


def _rotate(points, theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def _correlate(table, kernels):
    """scores[r, oy, ox] = sum_xy kernels[r, x, y] * table[x+oy, y+ox].

    table [H, W]; kernels [R, h, w]; VALID correlation via conv with the
    kernel as filter (conv flips nothing here because we index directly).
    """
    inp = table[None, None]                      # [1, 1, H, W]
    filt = kernels[:, None]                      # [R, 1, h, w]
    out = jax.lax.conv_general_dilated(
        inp, filt, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return out[0]                                # [R, OH, OW]


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def _search_stage(table_log, src_points, src_mask, thetas, res,
                  scan_range, trans_range, use_pallas=False):
    """Score the full (theta x translation) grid at one resolution.

    Geometry: the table spans [-hw, hw] with hw = scan_range + trans_range;
    the source raster spans [-scan_range, scan_range].  A VALID correlation
    of (table, raster) then yields offsets o in [0, 2*trans_range/res] with
    implied translation t = o*res - trans_range along each axis.

    Returns scores [R, OT, OT] with OT = 2*round(trans_range/res) + 1.
    """
    cells_k = int(round(2 * scan_range / res))
    rot = jax.vmap(lambda t: _rotate(src_points, t))(thetas)     # [R, P, 2]
    rasters = jax.vmap(
        lambda pts: _raster(pts, src_mask, scan_range, res, cells_k))(rot)
    if use_pallas and _on_tpu():
        from nautilus_tpu.kernels.csm_pallas import correlate_pallas
        scores = correlate_pallas(table_log, rasters)
    else:
        scores = _correlate(table_log, rasters)
    return scores


def _argmax3(scores):
    flat = jnp.argmax(scores)
    r = flat // (scores.shape[1] * scores.shape[2])
    rem = flat % (scores.shape[1] * scores.shape[2])
    return r, rem // scores.shape[2], rem % scores.shape[2]


def _stage_resolutions(params: CSMParams):
    mid_res = max(params.high_res * 5.0, params.high_res)
    return [params.low_res, mid_res, params.high_res]


@functools.partial(jax.jit, static_argnames=("params",))
def build_tables(cloud_b, mask_b, params: CSMParams = CSMParams()):
    """Smeared log-occupancy lookup tables at all pyramid resolutions.

    The per-TARGET half of the matcher; amortize over many sources with
    csm_match_to_tables (the reference builds its lookup tables per
    GetTransformation call — grouping by target is a freebie of the
    functional split)."""
    halfwidth = params.table_halfwidth
    return tuple(
        _smear_log_table(
            _raster(cloud_b, mask_b, halfwidth, res, params.table_cells(res)),
            res, max(params.sigma, res * 0.5))
        for res in _stage_resolutions(params))


@functools.partial(jax.jit, static_argnames=("params",))
def csm_match_to_tables(tables, cloud_a, mask_a,
                        params: CSMParams = CSMParams()):
    """Match one source cloud against prebuilt target tables."""
    halfwidth = params.table_halfwidth
    n_valid = jnp.maximum(jnp.sum(mask_a.astype(jnp.float32)), 1.0)
    table_lo, table_mid, table_hi = tables
    rot_step_lo = params.low_res / params.scan_range
    n_rot = max(int(np.ceil(2 * params.rotation_restriction / rot_step_lo)), 1)
    thetas_lo = (-params.rotation_restriction
                 + (jnp.arange(n_rot) + 0.5) * (2 * params.rotation_restriction
                                                / n_rot))
    offset_lo = params.offset_cells(params.low_res)
    scores_lo = _search_stage(table_lo, cloud_a, mask_a, thetas_lo,
                              params.low_res, params.scan_range,
                              params.trans_range, params.use_pallas)
    r0, oy0, ox0 = _argmax3(scores_lo)
    theta0 = thetas_lo[r0]
    ty0 = (oy0 - offset_lo).astype(jnp.float32) * params.low_res
    tx0 = (ox0 - offset_lo).astype(jnp.float32) * params.low_res

    # ---- refinement pyramid: gather-scored stages around the optimum ----
    # Each stage narrows translation to +-1 previous cell and rotation to
    # +- half the previous rotation step, so the total gather count stays
    # ~2M per pair instead of the ~125M a single 0.3 -> 0.01 jump needs.
    _, mid_res, _ = _stage_resolutions(params)
    stages = [
        # (table, res, rot_step, prev_res, prev_rot_step)
        (table_mid, mid_res, mid_res / params.scan_range, params.low_res,
         rot_step_lo),
        (table_hi, params.high_res, params.high_res / params.scan_range,
         mid_res, mid_res / params.scan_range),
    ]
    theta = theta0
    tx, ty = tx0, ty0
    best = scores_lo[r0, oy0, ox0]
    for table, res, rot_step, prev_res, prev_rot_step in stages:
        n_rot = min(max(int(np.ceil(prev_rot_step / rot_step)) | 1, 1), 9)
        thetas = theta + (jnp.arange(n_rot) - n_rot // 2) * rot_step
        offset_cells = int(round(prev_res / res))
        scores, t_grid = _refine_stage(table, cloud_a, mask_a, thetas,
                                       res, halfwidth, offset_cells, tx, ty)
        r1, oy1, ox1 = _argmax3(scores)
        theta = thetas[r1]
        ty = t_grid[0][oy1]
        tx = t_grid[1][ox1]
        best = scores[r1, oy1, ox1]
    return best / n_valid, jnp.stack([tx, ty, theta])


@functools.partial(jax.jit, static_argnames=("params",))
def csm_match(cloud_a, mask_a, cloud_b, mask_b,
              params: CSMParams = CSMParams()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find the rigid transform aligning cloud_a onto cloud_b.

    Returns (score, [tx, ty, theta]): applying R(theta) then translation to
    cloud_a points best overlays them on cloud_b (both in sensor frames) —
    the contract of the reference's GetTransformation.
    Score is mean log-occupancy per valid source point (higher = better).
    """
    return csm_match_to_tables(build_tables(cloud_b, mask_b, params),
                               cloud_a, mask_a, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _match_many(tables, A, MA, params):
    return jax.lax.map(
        lambda am: csm_match_to_tables(tables, am[0], am[1], params),
        (A, MA), batch_size=2)


def csm_match_grouped(points, masks, src_idx, tgt_idx,
                      params: CSMParams = CSMParams()):
    """Pair matching grouped by target: tables built once per unique target.

    points [N, P, 2], masks [N, P]; src_idx/tgt_idx are host int arrays.
    Returns (scores [Q], transforms [Q, 3]) aligned with the input pairs.
    """
    src_idx = np.asarray(src_idx)
    tgt_idx = np.asarray(tgt_idx)
    q = len(src_idx)
    scores = np.zeros(q, np.float32)
    transforms = np.zeros((q, 3), np.float32)

    for t in np.unique(tgt_idx):
        rows = np.nonzero(tgt_idx == t)[0]
        # Power-of-two group padding (repeat row 0) so group-size variety
        # doesn't churn compiled shapes.
        g = 2
        while g < len(rows):
            g *= 2
        padded = np.concatenate([rows, np.full(g - len(rows), rows[0])])
        tables = build_tables(points[int(t)], masks[int(t)], params)
        s, tr = _match_many(tables, points[src_idx[padded]],
                            masks[src_idx[padded]], params)
        scores[rows] = np.asarray(s)[:len(rows)]
        transforms[rows] = np.asarray(tr)[:len(rows)]
    return scores, transforms


def _refine_stage(table_hi, src_points, src_mask, thetas, res, halfwidth,
                  offset_cells, tx0, ty0):
    """Fine stage scored by direct gather (sparse points beat a dense conv
    at 1 cm resolution: P gathers/candidate vs a multi-thousand-cell MAC).

    Returns (scores [R, W, W], (ty_grid [W], tx_grid [W])).
    """
    cells = table_hi.shape[0]
    win = 2 * offset_cells + 1
    rot = jax.vmap(lambda t: _rotate(src_points, t))(thetas)       # [R, P, 2]
    steps = (jnp.arange(win) - offset_cells).astype(jnp.float32) * res
    ty = ty0 + steps                                                # [W]
    tx = tx0 + steps

    def score_rot(pts):
        # [win_y, win_x, P] broadcast: x varies along axis 1, y along axis 0.
        px = pts[:, 0][None, None, :] + tx[None, :, None]
        py = pts[:, 1][None, None, :] + ty[:, None, None]
        ix = jnp.floor((px + halfwidth) / res).astype(jnp.int32)
        iy = jnp.floor((py + halfwidth) / res).astype(jnp.int32)
        in_bounds = (ix >= 0) & (ix < cells) & (iy >= 0) & (iy < cells)
        ix = jnp.clip(ix, 0, cells - 1)
        iy = jnp.clip(iy, 0, cells - 1)
        vals = table_hi[iy, ix]
        # Valid points off the table score the floor log-prob; PADDED slots
        # contribute exactly zero.
        vals = jnp.where(in_bounds, vals, jnp.log(1e-6))
        vals = jnp.where(src_mask[None, None, :], vals, 0.0)
        return jnp.sum(vals, axis=-1)                       # [win_y, win_x]

    # Rotations in small sequential batches: a full vmap would materialize
    # [R, win, win, P] gather outputs (hundreds of MB per pair when the
    # matcher itself is vmapped over candidate pairs).
    scores = jax.lax.map(score_rot, rot, batch_size=4)
    return scores, (ty, tx)                                  # [R, win, win]


@functools.partial(jax.jit, static_argnames=("params", "inner_batch"))
def csm_match_batch(clouds_a, masks_a, clouds_b, masks_b,
                    params: CSMParams = CSMParams(), inner_batch: int = 2):
    """Batched matching over candidate pairs (loop-closure workload).

    One jitted program (single dispatch through the runtime) that maps over
    pairs with a small inner vmap width: the per-pair high-res lookup
    tables are the memory hog (~250 MB at 1 cm over a 28 m extent), so wide
    vmaps exceed HBM at compile time.
    """
    return jax.lax.map(
        lambda args: csm_match(*args, params=params),
        (clouds_a, masks_a, clouds_b, masks_b), batch_size=inner_batch)
