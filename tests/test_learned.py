"""Learned-LC service equivalents: scan matching + local uncertainty +
keyframe selection."""

import numpy as np
import jax.numpy as jnp
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.core.preprocess import compute_normals
from nautilus_tpu.ingest.synthetic import (make_problem, make_world, raycast,
                                           scan_to_points)
from nautilus_tpu.loop_closure.keyframes import keyframe_pairs, select_keyframes
from nautilus_tpu.loop_closure.learned import (local_uncertainty, match_score,
                                               scan_descriptor)


def _pad(c, p=768):
    out = np.zeros((p, 2), np.float32)
    m = np.zeros(p, bool)
    out[:len(c)] = c
    m[:len(c)] = True
    return jnp.asarray(out), jnp.asarray(m)


def _scan_at(pose, world="office"):
    w = make_world(world)
    return scan_to_points(raycast(w, np.asarray(pose), 540, max_range=10),
                          max_range=10)


class TestMatchScore:
    def test_self_match_is_high(self):
        a, ma = _pad(_scan_at([1.0, 2.0, 0.3]))
        s = float(match_score(a, ma, a, ma))
        assert s > 0.99

    def test_rotation_invariance(self):
        a, ma = _pad(_scan_at([1.0, 2.0, 0.3]))
        b, mb = _pad(_scan_at([1.0, 2.0, 0.3 + 1.2]))  # same spot, rotated
        s = float(match_score(a, ma, b, mb))
        assert s > 0.9

    def test_different_places_score_lower(self):
        a, ma = _pad(_scan_at([1.0, 2.0, 0.3]))
        c, mc = _pad(_scan_at([-6.0, -6.0, 2.0]))
        s_same = float(match_score(a, ma, a, ma))
        s_diff = float(match_score(a, ma, c, mc))
        assert s_diff < s_same
        assert s_diff < 0.9

    def test_descriptor_normalized(self):
        a, ma = _pad(_scan_at([0.0, 0.0, 0.0]))
        d = np.asarray(scan_descriptor(a, ma))
        assert np.linalg.norm(d) == pytest.approx(1.0, rel=1e-5)


class TestLocalUncertainty:
    def _uncertainty(self, cloud):
        pts, mask = _pad(cloud)
        normals = compute_normals(pts[None], mask[None])[0]
        c, s = local_uncertainty(pts, mask, normals)
        return float(c), float(s)

    def test_corner_well_constrained_vs_corridor(self):
        # Corner scan constrains both axes; a single straight wall only one.
        corner = _scan_at([1.0, 1.0, 0.8], world="corner")
        xs = np.linspace(-4, 4, 300)
        wall = np.stack([xs, np.full_like(xs, 2.0)], -1).astype(np.float32)
        c_corner, _ = self._uncertainty(corner)
        c_wall, _ = self._uncertainty(wall)
        assert c_wall > c_corner * 5


class TestKeyframes:
    def test_spacing_policy(self):
        state, _ = make_problem(num_nodes=20, world_kind="office",
                                num_beams=540, seed=2)
        cfg = load_config_text("""
keyframe_min_odom_distance=1.0
keyframe_local_uncertainty_filtering=false
""")
        kf = select_keyframes(state, cfg)
        idx = np.where(kf)[0]
        assert len(idx) >= 2
        locs = state.solution[idx, :2]
        d = np.linalg.norm(np.diff(locs, axis=0), axis=-1)
        assert np.all(d >= 1.0 - 1e-9)

    def test_uncertainty_filter_reduces_keyframes(self):
        state, _ = make_problem(num_nodes=12, world_kind="office",
                                num_beams=540, seed=2)
        open_cfg = load_config_text("""
keyframe_min_odom_distance=0.1
keyframe_local_uncertainty_filtering=false
""")
        strict_cfg = load_config_text("""
keyframe_min_odom_distance=0.1
keyframe_local_uncertainty_filtering=true
local_uncertainty_condition_threshold=1.0001
local_uncertainty_scale_threshold=0.0001
""")
        assert select_keyframes(state, open_cfg).sum() > 0
        assert select_keyframes(state, strict_cfg).sum() == 0

    def test_default_thresholds_are_calibrated_to_engine_scale(self):
        """The engine scorer's scale is >= 1 by construction
        (1/sqrt(lam_min/n), unit normals), so the reference's 0.3 default
        — set for its external torch estimator — would reject EVERY scan.
        The recalibrated default (2.5, default_config.lua:47) must keep
        healthy scans and still reject degeneracy (one-wall / oblique
        corridor scans measure >= 2.57)."""
        import jax
        import jax.numpy as jnp
        from nautilus_tpu.core.preprocess import preprocess
        from nautilus_tpu.core.problem import pad_clouds
        from nautilus_tpu.ingest.synthetic import raycast, scan_to_points
        from nautilus_tpu.loop_closure.learned import local_uncertainty

        state, _ = make_problem(num_nodes=12, world_kind="office",
                                num_beams=180, seed=5)
        default_cfg = load_config_text("keyframe_min_odom_distance=0.1\n"
                                       "keyframe_local_uncertainty_filtering"
                                       "=true\n")
        kf = select_keyframes(state, default_cfg)
        assert kf.sum() >= state.num_nodes // 2, kf

        # One long wall: translation along it is unconstrained.
        world = np.asarray([[[-50.0, 2.0], [50.0, 2.0]]])
        cl = scan_to_points(raycast(world, np.zeros(3), 180, max_range=10),
                            max_range=10).astype(np.float32)
        pts, msk = pad_clouds([cl], pad_multiple=128)
        normals, *_ = preprocess(pts, msk, as_numpy=False)
        _, scale = local_uncertainty(jnp.asarray(pts[0]), jnp.asarray(msk[0]),
                                     normals[0])
        assert float(scale) > 2.5, float(scale)

    def test_chi_squared_policy_significance_spacing(self):
        """keyframe_chi_squared_test=true replaces metric spacing with a
        Mahalanobis significance test (weight = the odometry-residual
        translation_weight, not the LC factor weight) (default_config.lua:98-102: the
        metric distance applies only 'if chi^2 is not in use').

        With per-step translation covariance (1/tw^2) I the statistic is
        |delta|^2 tw^2 / steps vs the 2-dof 95% quantile 5.991: at tw=1 a
        1 m step is insignificant (1.0 < 5.991) so consecutive keyframes
        are suppressed, while at tw=10 the same step is overwhelming
        (100 > 5.991) and every node becomes a keyframe.
        """
        state, _ = make_problem(num_nodes=12, world_kind="office",
                                num_beams=540, seed=2)
        # Synthetic unit-step trajectory: exact control of the statistic.
        state.solution[:, 0] = np.arange(state.num_nodes, dtype=np.float32)
        state.solution[:, 1:] = 0.0
        base = ("keyframe_chi_squared_test=true\n"
                "keyframe_local_uncertainty_filtering=false\n"
                "keyframe_min_odom_distance=0.0\n")
        weak = select_keyframes(state, load_config_text(
            base + "translation_weight=1.0\n"))
        strong = select_keyframes(state, load_config_text(
            base + "translation_weight=10.0\n"))
        assert strong.sum() == state.num_nodes
        assert 2 <= weak.sum() < strong.sum()
        # tw=1: significance needs |delta|^2/steps > 5.991; from keyframe k
        # the first node with (i-k)^2/(i-k) > 5.991 is i-k=6 -> every 6th.
        assert list(np.where(weak)[0]) == [0, 6]

    def test_chi_squared_accumulated_uncertainty_suppresses(self):
        """A stationary-ish pose never becomes significant no matter how
        many steps pass (the covariance grows with steps)."""
        state, _ = make_problem(num_nodes=10, world_kind="office",
                                num_beams=540, seed=2)
        state.solution[:, :] = 0.0
        state.solution[:, 0] = 0.01 * np.arange(state.num_nodes)
        cfg = load_config_text("keyframe_chi_squared_test=true\n"
                               "keyframe_local_uncertainty_filtering=false\n"
                               "translation_weight=1.0\n")
        kf = select_keyframes(state, cfg)
        assert list(np.where(kf)[0]) == [0]

    def test_keyframe_pairs_gap(self):
        kf = np.zeros(10, bool)
        kf[[0, 2, 4, 6, 8]] = True
        pairs = keyframe_pairs(kf, min_keyframe_gap=2)
        assert (0, 4) in pairs and (0, 2) not in pairs


class TestPrevScansUncertainty:
    """local_uncertainty_prev_scans merges each node's scan with its k
    predecessors (in the node's frame) before scoring: an individually
    degenerate scan inside a well-constrained neighborhood passes."""

    def _state(self):
        import jax.numpy as jnp
        from nautilus_tpu.core.preprocess import preprocess
        from nautilus_tpu.core.problem import (RawNodes, SLAMState,
                                               build_problem, pad_clouds)
        from nautilus_tpu.ingest.synthetic import make_world, raycast, \
            scan_to_points
        corner = make_world("corner")
        good = scan_to_points(raycast(corner, np.array([1.0, 1.0, 0.8]),
                                      360, max_range=10),
                              max_range=10).astype(np.float32)
        xs = np.linspace(-4, 4, 200)
        wall = np.stack([xs, np.full_like(xs, 2.0)],
                        -1).astype(np.float32)
        clouds = [good, good, wall, good]
        pts, msk = pad_clouds(clouds, pad_multiple=128)
        n = len(clouds)
        raw = RawNodes(
            points=pts, points_mask=msk,
            initial_poses=np.zeros((n, 3)),
            timestamps=np.arange(n, dtype=np.float64),
            odom_i=np.arange(n - 1, dtype=np.int64),
            odom_j=np.arange(1, n, dtype=np.int64),
            odom_trans=np.zeros((n - 1, 2)), odom_rot=np.zeros(n - 1))
        normals, pi_, pm, ei, em, _ = preprocess(raw.points,
                                                 raw.points_mask,
                                                 as_numpy=False)
        problem = build_problem(raw, normals, pi_, pm, ei, em,
                                dtype=jnp.float32)
        return SLAMState.from_problem(problem, raw.timestamps)

    def test_merged_neighborhood_rescues_degenerate_scan(self):
        from nautilus_tpu.loop_closure.keyframes import \
            _batched_local_uncertainty
        state = self._state()
        _, scales0 = _batched_local_uncertainty(state, prev_scans=0)
        _, scales2 = _batched_local_uncertainty(state, prev_scans=2)
        # Alone, the one-wall scan at node 2 is degenerate (scale above
        # the 2.5 gate); merged with two corner predecessors it passes.
        assert scales0[2] > 2.5, scales0
        assert scales2[2] < 2.5, scales2
        # Well-constrained nodes stay well-constrained either way.
        assert scales0[1] < 2.5 and scales2[3] < 2.5


class TestCandidateUncertaintyGate:
    """Auto-LC gates candidates on the uncertainty CRITERION, not on
    membership of the sequential 0.5 m keyframe chain: the candidate
    filter already enforces 5 m spacing, and intersecting two independent
    spacing chains drops candidates by phase parity (on the flagship
    bench world the chain discarded 15/22 candidates whose uncertainty
    scores all passed, starving the loop-closure pipeline)."""

    def test_subset_matches_batched_scores(self):
        from nautilus_tpu.loop_closure.keyframes import (
            _batched_local_uncertainty, candidate_uncertainty_ok)
        state, _ = make_problem(num_nodes=16, world_kind="office",
                                num_beams=360, seed=3)
        conds, scales = _batched_local_uncertainty(state, prev_scans=2)
        expect = (conds < 9.5) & (scales < 2.5)
        nodes = [0, 3, 7, 11, 15]
        cfg = load_config_text("keyframe_local_uncertainty_filtering=true\n")
        ok = candidate_uncertainty_ok(state, cfg, nodes)
        np.testing.assert_array_equal(ok, expect[nodes])

    def test_well_conditioned_candidates_not_dropped_by_chain_phase(self):
        from nautilus_tpu.loop_closure.keyframes import (
            candidate_uncertainty_ok, select_keyframes)
        # Dense trajectory: the 0.5 m chain keeps only every k-th node, so
        # arbitrary candidate indices routinely miss the chain — but every
        # office-world scan here is well-conditioned, so the uncertainty
        # criterion keeps them all.
        state, _ = make_problem(num_nodes=24, world_kind="office",
                                num_beams=360, seed=3)
        cfg = load_config_text("keyframe_local_uncertainty_filtering=true\n")
        kf = select_keyframes(state, cfg)
        assert not kf.all()  # the chain drops some nodes by spacing alone
        ok = candidate_uncertainty_ok(state, cfg,
                                      list(range(state.num_nodes)))
        assert ok.all(), ok

    def test_degenerate_candidate_rejected(self):
        from nautilus_tpu.loop_closure.keyframes import (
            candidate_uncertainty_ok)
        state, _ = make_problem(num_nodes=12, world_kind="office",
                                num_beams=360, seed=3)
        strict = load_config_text(
            "keyframe_local_uncertainty_filtering=true\n"
            "local_uncertainty_scale_threshold=0.0001\n")
        ok = candidate_uncertainty_ok(state, strict, [2, 5, 9])
        assert not ok.any()
