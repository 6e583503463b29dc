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
        conds, scales = jax.vmap(local_uncertainty)(
            state.problem.points, state.problem.points_mask,
            state.problem.normals)
        conds = np.asarray(conds)
        scales = np.asarray(scales)
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
