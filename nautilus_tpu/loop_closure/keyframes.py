"""Keyframe selection for automatic loop closure.

The reference carries an ``is_keyframe`` flag per node (slam_types.h:126)
and configures keyframe policy via config keys (default_config.lua:98-116):
min odometry spacing (``keyframe_min_odom_distance``), optional local-
uncertainty filtering (``keyframe_local_uncertainty_filtering`` +
``local_uncertainty_*`` thresholds via the estimator service), and an
optional chi-squared test (``keyframe_chi_squared_test``).  The snapshot
never populates the flag and the chi-squared key is declared but never
read (solver.h:53 has no use site); this module implements the full
policy the config describes, batched where possible.

Chi-squared branch semantics (default_config.lua:98-102: the metric
spacing applies "if chi^2 is not in use"): a node becomes a keyframe when
its translation from the last keyframe is STATISTICALLY significant under
the odometry covariance accumulated since that keyframe.  Per-step
translation covariance is the inverse odometry-residual information,
(1/translation_weight^2) I — translation_weight is the weight the solver
applies to odometry factors (solver residuals; default_config.lua:17) —
so the squared Mahalanobis distance is ``|delta|^2 * tw^2 / steps``; it
is compared against the exact 2-dof chi-squared quantile
``-2 ln(1 - confidence)``.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np
import jax

from nautilus_tpu.core.problem import SLAMState
from nautilus_tpu.loop_closure.learned import local_uncertainty


def _batched_local_uncertainty(state: SLAMState, prev_scans: int):
    """(condition, scale) per node, each scored on the node's scan MERGED
    with its ``prev_scans`` predecessors in the node's frame
    (config ``local_uncertainty_prev_scans``, default_config.lua:115 —
    "previous scans to use for calculating local uncertainty": a scan
    that is individually degenerate but part of a well-constrained
    neighborhood should not be rejected).  Built as rolled copies
    transformed via the current solution — one batched device pass, no
    per-node gathers.
    """
    import jax.numpy as jnp

    n = state.num_nodes
    pts = jnp.asarray(state.problem.points[:n])
    msk = jnp.asarray(state.problem.points_mask[:n])
    nrm = jnp.asarray(state.problem.normals[:n])
    if prev_scans <= 0:
        conds, scales = jax.vmap(local_uncertainty)(pts, msk, nrm)
        return np.asarray(conds), np.asarray(scales)
    sol = jnp.asarray(state.solution[:n], pts.dtype)
    th_i, t_i = sol[:, 2], sol[:, :2]
    c_i, s_i = jnp.cos(th_i), jnp.sin(th_i)
    pieces_p, pieces_m, pieces_n = [], [], []
    for s in range(prev_scans + 1):
        pj = jnp.roll(pts, s, axis=0)
        mj = jnp.roll(msk, s, axis=0) & (jnp.arange(n) >= s)[:, None]
        nj = jnp.roll(nrm, s, axis=0)
        th_j = jnp.roll(th_i, s)
        t_j = jnp.roll(t_i, s, axis=0)
        # node j frame -> world -> node i frame: R(-th_i)(R(th_j) p
        # + t_j - t_i); normals rotate by (th_j - th_i).
        dth = th_j - th_i
        c, sn = jnp.cos(dth)[:, None], jnp.sin(dth)[:, None]
        px = c * pj[..., 0] - sn * pj[..., 1]
        py = sn * pj[..., 0] + c * pj[..., 1]
        dt = t_j - t_i                                  # [N, 2]
        dx = c_i[:, None] * dt[:, None, 0] + s_i[:, None] * dt[:, None, 1]
        dy = -s_i[:, None] * dt[:, None, 0] + c_i[:, None] * dt[:, None, 1]
        pieces_p.append(jnp.stack([px + dx, py + dy], axis=-1))
        pieces_n.append(jnp.stack([c * nj[..., 0] - sn * nj[..., 1],
                                   sn * nj[..., 0] + c * nj[..., 1]],
                                  axis=-1))
        pieces_m.append(mj)
    conds, scales = jax.vmap(local_uncertainty)(
        jnp.concatenate(pieces_p, axis=1),
        jnp.concatenate(pieces_m, axis=1),
        jnp.concatenate(pieces_n, axis=1))
    return np.asarray(conds), np.asarray(scales)


def candidate_uncertainty_ok(state: SLAMState, config, nodes) -> np.ndarray:
    """Local-uncertainty criterion (only) evaluated at the given nodes.

    The auto-LC candidate filter already enforces its own 5 m spacing
    (lc_candidate_filter.cc:53-67), so gating candidates on *membership
    of the sequential 0.5 m keyframe chain* (select_keyframes) would drop
    them by arbitrary phase alignment between the two spacing chains —
    measured on the flagship bench world it discarded 15/22 candidates
    whose uncertainty scores all passed.  What
    ``keyframe_local_uncertainty_filtering`` means for auto-LC
    (default_config.lua:105-116: scans whose local registration is
    well-conditioned are "one step closer to being used for automatic
    lc") is the uncertainty criterion itself, evaluated here per
    candidate over its ``local_uncertainty_prev_scans`` merged
    neighborhood.  Returns a bool mask aligned with ``nodes``.
    """
    import jax.numpy as jnp

    idx = np.asarray(nodes, np.int64)
    if idx.size == 0:
        return np.zeros(0, bool)
    cond_thresh = float(config.get("local_uncertainty_condition_threshold",
                                   9.5))
    scale_thresh = float(config.get("local_uncertainty_scale_threshold", 2.5))
    prev_scans = int(config.get("local_uncertainty_prev_scans", 2))

    # Pow2-bucketed candidate count so candidate-list growth costs O(log)
    # recompiles of this (small) program.
    b = 8
    while b < idx.size:
        b *= 2
    pad = np.concatenate([idx, np.zeros(b - idx.size, np.int64)])

    pts = jnp.asarray(state.problem.points)
    msk = jnp.asarray(state.problem.points_mask)
    nrm = jnp.asarray(state.problem.normals)
    sol = jnp.asarray(state.solution, pts.dtype)
    th_i = sol[pad, 2]
    t_i = sol[pad, :2]
    c_i, s_i = jnp.cos(th_i), jnp.sin(th_i)
    pieces_p, pieces_m, pieces_n = [], [], []
    for s in range(prev_scans + 1):
        j = jnp.maximum(jnp.asarray(pad) - s, 0)
        pj, mj, nj = pts[j], msk[j] & (jnp.asarray(pad) >= s)[:, None], nrm[j]
        th_j, t_j = sol[j, 2], sol[j, :2]
        dth = th_j - th_i
        c, sn = jnp.cos(dth)[:, None], jnp.sin(dth)[:, None]
        px = c * pj[..., 0] - sn * pj[..., 1]
        py = sn * pj[..., 0] + c * pj[..., 1]
        dt = t_j - t_i
        dx = c_i[:, None] * dt[:, None, 0] + s_i[:, None] * dt[:, None, 1]
        dy = -s_i[:, None] * dt[:, None, 0] + c_i[:, None] * dt[:, None, 1]
        pieces_p.append(jnp.stack([px + dx, py + dy], axis=-1))
        pieces_n.append(jnp.stack([c * nj[..., 0] - sn * nj[..., 1],
                                   sn * nj[..., 0] + c * nj[..., 1]],
                                  axis=-1))
        pieces_m.append(mj)
    conds, scales = jax.vmap(local_uncertainty)(
        jnp.concatenate(pieces_p, axis=1),
        jnp.concatenate(pieces_m, axis=1),
        jnp.concatenate(pieces_n, axis=1))
    conds = np.asarray(conds)[:idx.size]
    scales = np.asarray(scales)[:idx.size]
    return (conds < cond_thresh) & (scales < scale_thresh)


def select_keyframes(state: SLAMState, config) -> np.ndarray:
    """Returns a bool mask [N] of keyframe nodes per the config policy."""
    n = state.num_nodes
    min_dist = float(config.get("keyframe_min_odom_distance", 0.5))
    use_chi2 = bool(config.get("keyframe_chi_squared_test", False))
    chi2_conf = float(config.get("keyframe_chi_squared_confidence", 0.95))
    # Odometry-residual weight = per-step translation information sqrt
    # (NOT lc_translation_weight, which weights loop-closure factors).
    tw = float(config.get("translation_weight", 1.0))
    # 2-dof chi-squared inverse CDF in closed form: P(X <= q) = 1 - e^(-q/2).
    chi2_quantile = -2.0 * math.log(max(1.0 - chi2_conf, 1e-12))
    use_uncertainty = bool(config.get("keyframe_local_uncertainty_filtering",
                                      True))
    cond_thresh = float(config.get("local_uncertainty_condition_threshold",
                                   9.5))
    # 2.5 is the engine-recalibrated default (the reference's 0.3 is on its
    # external estimator's scale; ours is >= 1 by construction — see
    # default_config.lua:47 and DEVIATIONS.md).
    scale_thresh = float(config.get("local_uncertainty_scale_threshold", 2.5))

    if use_uncertainty:
        conds, scales = _batched_local_uncertainty(
            state, int(config.get("local_uncertainty_prev_scans", 2)))
        uncertainty_ok = (conds < cond_thresh) & (scales < scale_thresh)
    else:
        uncertainty_ok = np.ones(n, bool)

    keyframes = np.zeros(n, bool)
    last_loc = None
    last_idx = 0
    for i in range(n):
        if not uncertainty_ok[i]:
            continue
        loc = state.solution[i, :2]
        if last_loc is not None:
            delta2 = float(np.sum((loc - last_loc) ** 2))
            if use_chi2:
                steps = max(i - last_idx, 1)
                mahal2 = delta2 * tw * tw / steps
                if mahal2 <= chi2_quantile:
                    continue
            elif delta2 < min_dist * min_dist:
                continue
        keyframes[i] = True
        last_loc = loc
        last_idx = i
    return keyframes


def keyframe_pairs(keyframes: np.ndarray, min_keyframe_gap: int) -> List[tuple]:
    """All keyframe pairs at least ``lc_min_keyframes`` keyframes apart
    (config default_config.lua:136)."""
    idx = np.where(keyframes)[0]
    pairs = []
    for a in range(len(idx)):
        for b in range(a + min_keyframe_gap, len(idx)):
            pairs.append((int(idx[a]), int(idx[b])))
    return pairs
