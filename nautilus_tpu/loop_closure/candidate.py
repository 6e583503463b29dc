"""Loop-closure candidate filter.

Mirrors reference LCCandidateFilter (src/loop_closure/lc_candidate_filter.cc):
a node is a candidate when it is (a) >= 5 m from the previously accepted
candidate (lc_candidate_filter.cc:53-67) and (b) its scan has scatter-matrix
score lambda_min/lambda_max >= 0.70 — geometric spread in both axes
(lc_candidate_filter.cc:35-51, 76).

The scatter scores for ALL nodes are computed in one batched device pass
(geometry.scatter_matrix_score); the sequential min-distance chain is a
trivial host loop over the score mask.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax

from nautilus_tpu.core import geometry as geo
from nautilus_tpu.core.problem import SLAMState


@jax.jit
def _scatter_scores(points, mask):
    return geo.scatter_matrix_score(points, mask)


def get_lc_candidates(state: SLAMState, min_distance: float = 5.0,
                      score_threshold: float = 0.70) -> List[int]:
    """Candidate node indices (defaults = reference's hardcoded 5 m / 0.70)."""
    scores = np.asarray(_scatter_scores(state.problem.points,
                                        state.problem.points_mask))
    candidates: List[int] = []
    for i in range(state.num_nodes):
        if candidates:
            last = state.solution[candidates[-1], :2]
            if np.linalg.norm(state.solution[i, :2] - last) < min_distance:
                continue
        if scores[i] >= score_threshold:
            candidates.append(i)
    return candidates
