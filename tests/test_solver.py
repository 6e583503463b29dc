"""Residual semantics + LM solver tests, including the synthetic-corner
convergence probe (the reference's only end-to-end test,
test/feature_extractor_test.cc, reproduced without ROS)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.core import geometry as geo
from nautilus_tpu.core.problem import SLAMState
from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.solve import correspond
from nautilus_tpu.solve.factors import (Correspondences, FactorGraph,
                                        empty_hitl, make_odom_factors,
                                        normal_residual, odom_residual,
                                        point_residual, total_cost,
                                        assemble_normal_equations)
from nautilus_tpu.solve.lm import LMParams, fixed_pose_mask, lm_solve
from nautilus_tpu.solve.solver import Solver
from nautilus_tpu.core.luaconf import load_config_text


DEFAULTS = """
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=3
outlier_threshold=0.25
"""


class TestResiduals:
    def test_odom_residual_zero_at_consistent_poses(self):
        pi = jnp.array([1.0, 2.0, 0.5])
        trans = jnp.array([0.3, -0.2])
        rot = jnp.array(0.1)
        pj = jnp.array([1.3, 1.8, 0.6])
        r = odom_residual(pi, pj, trans, rot, jnp.array(True), 2.0, 3.0)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_odom_residual_weighting(self):
        pi = jnp.array([0.0, 0.0, 0.0])
        pj = jnp.array([1.0, 0.0, 0.0])
        r = odom_residual(pi, pj, jnp.array([0.0, 0.0]), jnp.array(0.5),
                          jnp.array(True), 2.0, 3.0)
        # translation error (-1, 0) * tw, rotation error 0.5 * rw
        np.testing.assert_allclose(np.asarray(r), [-2.0, 0.0, 1.5], atol=1e-6)

    def test_odom_residual_angle_wrap(self):
        pi = jnp.array([0.0, 0.0, 3.0])
        pj = jnp.array([0.0, 0.0, -3.0])
        r = odom_residual(pi, pj, jnp.zeros(2), jnp.array(0.0),
                          jnp.array(True), 1.0, 1.0)
        # raw diff 6.0 wraps to 6 - 2pi
        assert float(r[2]) == pytest.approx(6.0 - 2 * np.pi, abs=1e-6)

    def test_point_residual_identity(self):
        # Same pose, same points -> zero residual.
        pose = jnp.array([0.4, -0.1, 0.2])
        pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        r = point_residual(pose, pose, pts, pts, jnp.array([True, True]))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_point_residual_translation(self):
        ps = jnp.array([0.0, 0.0, 0.0])
        pt = jnp.array([0.0, 0.0, 0.0])
        src = jnp.array([[1.0, 1.0]])
        tgt = jnp.array([[1.5, 1.0]])
        r = point_residual(ps, pt, src, tgt, jnp.array([True]))
        np.testing.assert_allclose(np.asarray(r), [[0.5, 0.0]], atol=1e-6)

    def test_normal_residual_signs(self):
        # Source point 0.2 beyond target along the target normal (1, 0);
        # source normal in its own frame also (1, 0).
        ps = jnp.array([0.0, 0.0, 0.0])
        pt = jnp.array([0.0, 0.0, 0.0])
        src = jnp.array([[1.2, 0.0]])
        tgt = jnp.array([[1.0, 0.0]])
        n = jnp.array([[1.0, 0.0]])
        r = normal_residual(ps, pt, src, tgt, n, n, jnp.array([True]))
        # r_tgt = n_t . (p - q) = 0.2 ; r_src = n_s . (q - p) = -0.2
        np.testing.assert_allclose(np.asarray(r), [[0.2, -0.2]], atol=1e-6)

    def test_masked_slots_contribute_nothing(self):
        ps = jnp.array([0.0, 0.0, 0.0])
        pt = jnp.array([1.0, 2.0, 0.3])
        src = jnp.array([[1.0, 1.0], [5.0, 5.0]])
        tgt = jnp.array([[0.0, 0.0], [9.0, 9.0]])
        mask = jnp.array([False, False])
        r = point_residual(ps, pt, src, tgt, mask)
        np.testing.assert_allclose(np.asarray(r), 0.0)
        # Jacobian also zero.
        J = jax.jacfwd(lambda p: point_residual(p, pt, src, tgt, mask))(ps)
        np.testing.assert_allclose(np.asarray(J), 0.0)


def _two_node_state(offset=(0.15, 0.1, 0.05)):
    """Two identical corner scans; node 1's initial pose is offset from truth
    (truth: both scans taken from the same spot => relative pose identity)."""
    state, _ = make_problem(num_nodes=2, world_kind="corner", num_beams=360,
                            odom_noise_trans=0.0, odom_noise_rot=0.0)
    # Both nodes see the same corner from slightly different true poses;
    # perturb node 1 away from its odometry-consistent initial pose.
    state.solution[1] += np.asarray(offset)
    return state


class TestLMSolve:
    def test_odometry_only_chain(self):
        # 5 poses in a chain with exact odometry; perturb interior poses.
        n = 5
        rng = np.random.default_rng(1)
        gt = np.stack([np.arange(n, dtype=np.float64),
                       np.zeros(n), np.zeros(n)], axis=-1)
        x0 = gt.copy()
        x0[1:] += rng.normal(scale=0.2, size=(n - 1, 3))
        odom = make_odom_factors(
            np.arange(n - 1), np.arange(1, n),
            gt[1:, :2] - gt[:-1, :2], gt[1:, 2] - gt[:-1, 2])
        empty_corr = Correspondences(
            src=jnp.zeros((0,), jnp.int32), tgt=jnp.zeros((0,), jnp.int32),
            src_pts=jnp.zeros((0, 1, 2)), tgt_pts=jnp.zeros((0, 1, 2)),
            src_nrm=jnp.zeros((0, 1, 2)), tgt_nrm=jnp.zeros((0, 1, 2)),
            mask=jnp.zeros((0, 1), bool))
        graph = FactorGraph(odom=odom, planar=empty_corr, edge=empty_corr,
                            hitl=empty_hitl())
        res = lm_solve(jnp.asarray(x0, jnp.float32), graph,
                       fixed_pose_mask(3 * n))
        assert float(res.cost) < 1e-8
        np.testing.assert_allclose(np.asarray(res.x), gt, atol=1e-3)

    def test_gauge_pose_fixed(self):
        n = 3
        x0 = np.array([[5.0, 6.0, 0.7], [6.0, 6.0, 0.7], [7.0, 6.0, 0.7]])
        odom = make_odom_factors(
            [0, 1], [1, 2], np.array([[0.9, 0.1], [1.1, -0.1]]),
            np.zeros(2))
        empty_corr = Correspondences(
            src=jnp.zeros((0,), jnp.int32), tgt=jnp.zeros((0,), jnp.int32),
            src_pts=jnp.zeros((0, 1, 2)), tgt_pts=jnp.zeros((0, 1, 2)),
            src_nrm=jnp.zeros((0, 1, 2)), tgt_nrm=jnp.zeros((0, 1, 2)),
            mask=jnp.zeros((0, 1), bool))
        graph = FactorGraph(odom=odom, planar=empty_corr, edge=empty_corr,
                            hitl=empty_hitl())
        res = lm_solve(jnp.asarray(x0, jnp.float32), graph,
                       fixed_pose_mask(3 * n))
        np.testing.assert_allclose(np.asarray(res.x)[0], x0[0], atol=1e-7)

    def test_corner_convergence(self):
        """Scan alignment pulls a perturbed node back (reference
        test/feature_extractor_test.cc semantics)."""
        state = _two_node_state()
        cfg = load_config_text(DEFAULTS).replace(
            lidar_constraint_amount_max=1.0)
        solver = Solver(state, cfg)
        stats = solver.solve_slam()
        assert stats.windows[-1].final_cost < stats.windows[0].initial_cost
        # Node 1 should return to its odometry-consistent pose (~offset gone):
        # relative pose between nodes should match the odometry factor again.
        rel = state.solution[1] - state.solution[0]
        i, j, trans, rot = state.odometry_factors
        np.testing.assert_allclose(rel[:2], trans[0], atol=0.05)
        assert abs(rel[2] - rot[0]) < 0.05


class TestEndToEnd:
    def test_room_solve_reduces_error(self):
        state, gt = make_problem(num_nodes=12, world_kind="room",
                                 num_beams=360, seed=3,
                                 odom_noise_trans=0.02, odom_noise_rot=0.01)
        init = state.solution.copy()
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg)
        stats = solver.solve_slam()
        # Cost decreased within the last window.
        last = stats.windows[-1]
        assert last.final_cost <= last.initial_cost
        # Pose error vs ground truth reduced relative to odometry-only init.

        def err(p):
            return np.linalg.norm((p - gt)[:, :2], axis=-1).mean()

        assert err(state.solution) <= err(init) * 1.1

    def test_association_matches_bruteforce(self):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=360,
                                seed=5)
        problem = state.problem
        pairs = correspond.make_pairs(6, 3)
        x = jnp.asarray(state.solution, jnp.float32)
        corr = correspond.associate(problem, x, jnp.asarray(pairs.src),
                                    jnp.asarray(pairs.tgt), 3, 0.25,
                                    feature="planar")
        # Brute-force check on pair 0.
        q = 0
        s, t = int(pairs.src[q]), int(pairs.tgt[q])
        sp = np.asarray(problem.planar_points)[s]
        sm = np.asarray(problem.planar_mask)[s]
        tp = np.asarray(problem.planar_points)[t]
        tm = np.asarray(problem.planar_mask)[t]
        proj = np.asarray(geo.relative_pose_transform_points(
            x[s], x[t], jnp.asarray(sp)))
        for a in range(len(sp)):
            d = np.linalg.norm(proj[a] - tp, axis=-1)
            d[~tm] = np.inf
            nn = np.argmin(d)
            expect_valid = sm[a] and d[nn] < 0.25
            assert bool(np.asarray(corr.mask)[q, a]) == bool(expect_valid)
            if expect_valid:
                np.testing.assert_allclose(np.asarray(corr.tgt_pts)[q, a],
                                           tp[nn], atol=1e-6)

    @pytest.mark.parametrize("gate", [False, True])
    @pytest.mark.parametrize("feature", ["planar", "edge"])
    def test_pair_minor_layout_matches_oracle(self, gate, feature):
        """The production pair-minor-layout associate (Q on the lane axis,
        7.9x at N=20000 — benchmarks/assoc_ab.py) is bitwise identical to
        the pair-at-a-time oracle _match_pair, normal gate included."""
        state, _ = make_problem(num_nodes=10, world_kind="office",
                                num_beams=360, seed=11,
                                odom_noise_trans=0.03, odom_noise_rot=0.01)
        problem = state.problem
        pairs = correspond.make_pairs(10, 4)
        x = jnp.asarray(state.solution, jnp.float32)
        corr = correspond.associate(
            problem, x, jnp.asarray(pairs.src), jnp.asarray(pairs.tgt),
            3, 0.25, feature=feature, use_normal_gate=gate)
        pts = getattr(problem, f"{feature}_points")
        msk = getattr(problem, f"{feature}_mask")
        nrm = getattr(problem, f"{feature}_normals")
        for q in range(len(pairs.src)):
            s, t = int(pairs.src[q]), int(pairs.tgt[q])
            tm, tn, valid = correspond._match_pair(
                pts[s], msk[s], nrm[s], pts[t], msk[t], nrm[t],
                jnp.asarray(0.25, jnp.float32), 0.9396926, x[s], x[t], gate)
            valid = np.asarray(valid) & ((s - t) <= 3)
            np.testing.assert_array_equal(np.asarray(corr.mask)[q], valid)
            np.testing.assert_array_equal(
                np.asarray(corr.tgt_pts)[q][valid], np.asarray(tm)[valid])
            np.testing.assert_array_equal(
                np.asarray(corr.tgt_nrm)[q][valid], np.asarray(tn)[valid])


class TestAllMode:
    def test_all_optimization_type(self):
        """OptimizationType::ALL path (full clouds -> point residuals)."""
        state, gt = make_problem(num_nodes=6, world_kind="room",
                                 num_beams=180, seed=7,
                                 odom_noise_trans=0.02, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS).replace(
            lidar_constraint_amount_max=2.0)
        solver = Solver(state, cfg)
        stats = solver.solve_slam(optimization_type="all")
        assert np.isfinite(stats.final_cost)
        last = stats.windows[-1]
        assert last.final_cost <= last.initial_cost

    def test_chunked_matches_unchunked(self):
        """Device-mapped chunking (one dispatch) == direct association."""
        from nautilus_tpu.solve import correspond
        state, _ = make_problem(num_nodes=8, world_kind="room",
                                num_beams=180, seed=7,
                                odom_noise_trans=0.02, odom_noise_rot=0.01)
        problem = state.problem
        pairs = correspond.make_pairs(problem.num_nodes, 3)
        x = jnp.asarray(state.solution, problem.points.dtype)
        full = correspond.associate(
            problem, x, jnp.asarray(pairs.src), jnp.asarray(pairs.tgt),
            2, 0.25, feature="all")
        chunked = correspond.associate_chunked(
            problem, x, pairs, 2, 0.25, feature="all", chunk=4)
        q = len(pairs.src)
        np.testing.assert_array_equal(np.asarray(full.mask),
                                      np.asarray(chunked.mask)[:q])
        m = np.asarray(full.mask)
        np.testing.assert_allclose(np.asarray(full.tgt_pts)[m],
                                   np.asarray(chunked.tgt_pts)[:q][m],
                                   atol=1e-6)
        # padded rows beyond q are fully masked
        assert not np.asarray(chunked.mask)[q:].any()


class TestPerIterationViz:
    def test_redraw_every_lm_iteration(self):
        """Opt-in ceres::IterationCallback parity (solver_vis.h:18-22):
        one draw per LM step, not per window."""
        from nautilus_tpu.viz.visualizer import SnapshotVisualizer
        state, _ = make_problem(num_nodes=8, world_kind="room",
                                num_beams=180, seed=7,
                                odom_noise_trans=0.02, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS).replace(
            lidar_constraint_amount_max=2.0)
        vis = SnapshotVisualizer(record_clouds=False)
        solver = Solver(state, cfg, visualizer=vis, per_iteration_viz=True)
        stats = solver.solve_slam()
        total_iters = sum(w.iterations for w in stats.windows)
        n_windows = len(stats.windows)
        # initial draw + per-window draws + one per LM iteration
        assert len(vis.snapshots) == 1 + n_windows + total_iters
        assert total_iters > n_windows  # the mode actually added redraws


class TestGradients:
    def test_residual_gradients_match_finite_differences(self, rng):
        """jacfwd through every residual matches central differences."""
        from nautilus_tpu.solve.factors import hitl_residual
        ps = jnp.asarray(rng.normal(size=3))
        pt = jnp.asarray(rng.normal(size=3))
        pts = jnp.asarray(rng.normal(size=(3, 2)))
        tgt = jnp.asarray(rng.normal(size=(3, 2)))
        nrm = jnp.asarray(rng.normal(size=(3, 2)))
        mask = jnp.array([True, True, False])
        seg_a = jnp.array([0.0, 0.0])
        seg_b = jnp.array([2.0, 1.0])

        cases = [
            (lambda a, b: odom_residual(a, b, jnp.asarray([0.3, -0.1]),
                                        jnp.asarray(0.2), jnp.array(True),
                                        1.5, 2.5)),
            (lambda a, b: point_residual(a, b, pts, tgt, mask).ravel()),
            (lambda a, b: normal_residual(a, b, pts, tgt, nrm, nrm,
                                          mask).ravel()),
            (lambda a, b: hitl_residual(a, b, pts, mask, seg_a, seg_b)),
        ]
        eps = 1e-3
        for f in cases:
            for argnum in (0, 1):
                J = np.asarray(jax.jacfwd(f, argnum)(ps, pt))
                for d in range(3):
                    delta = np.zeros(3)
                    delta[d] = eps
                    if argnum == 0:
                        hi = np.asarray(f(ps + delta, pt))
                        lo = np.asarray(f(ps - delta, pt))
                    else:
                        hi = np.asarray(f(ps, pt + delta))
                        lo = np.asarray(f(ps, pt - delta))
                    fd = (hi - lo) / (2 * eps)
                    np.testing.assert_allclose(J[..., d], fd, atol=3e-3)


class TestNormalGate:
    def test_normal_gated_solve(self):
        state, _ = make_problem(num_nodes=8, world_kind="room", num_beams=360,
                                seed=3, odom_noise_trans=0.02,
                                odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg, use_normal_gate=True)
        stats = solver.solve_slam()
        assert np.isfinite(stats.final_cost)
        last = stats.windows[-1]
        assert last.final_cost <= last.initial_cost


class TestBandedAssembly:
    """Scatter-free banded assembly == generic scatter assembly."""

    def _graph_and_layout(self, with_hitl=False):
        from nautilus_tpu.solve.factors import BandLayout
        state, _ = make_problem(num_nodes=9, world_kind="room",
                                num_beams=240, seed=3,
                                odom_noise_trans=0.03, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS)
        if with_hitl:
            from nautilus_tpu.solve.hitl import HitlConstraint
            pts = np.asarray(state.problem.points, np.float64)
            state.hitl_constraints.append(HitlConstraint(
                line_a=(np.array([0.0, -0.5]), np.array([3.0, -0.5])),
                line_b=(np.array([0.0, -0.45]), np.array([3.0, -0.45])),
                line_a_poses=[(1, pts[1][:12]), (4, pts[4][:9])],
                line_b_poses=[(6, pts[6][:7])],
                line_pose_index=0))
            state.line_poses = np.zeros((1, 3))
        solver = Solver(state, cfg)
        x = solver._current_x()
        graph = solver.build_graph(x, window=3)
        return x, graph, solver._layout

    @pytest.mark.parametrize("with_hitl", [False, True])
    def test_matches_scatter(self, with_hitl):
        x, graph, layout = self._graph_and_layout(with_hitl)
        H0, g0, c0 = assemble_normal_equations(x, graph)
        H1, g1, c1 = assemble_normal_equations(x, graph, layout)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(c1), float(c0), rtol=1e-6)

    def test_matches_scatter_all_path(self):
        """OptimizationType::ALL graphs (padded tail rows) agree too."""
        state, _ = make_problem(num_nodes=7, world_kind="room",
                                num_beams=180, seed=11,
                                odom_noise_trans=0.02, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg)
        x = solver._current_x()
        graph = solver.build_graph(x, window=2, optimization_type="all")
        H0, g0, c0 = assemble_normal_equations(x, graph)
        H1, g1, c1 = assemble_normal_equations(x, graph, solver._layout)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-5, atol=1e-5)


class TestAnalyticJacobians:
    """Closed-form Jacobians == jacfwd for every registered residual type
    (the analytic forms are the hot path; jacfwd is the oracle)."""

    def test_analytic_matches_jacfwd(self):
        from nautilus_tpu.solve.factors import (graph_factor_specs,
                                                linearize_two_pose,
                                                linearize_two_pose_jacfwd)
        state, _ = make_problem(num_nodes=7, world_kind="room",
                                num_beams=240, seed=13,
                                odom_noise_trans=0.04, odom_noise_rot=0.02)
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg)
        x = solver._current_x()
        graph = solver.build_graph(x, window=3)
        checked = 0
        for (a, b, fn, data) in graph_factor_specs(graph):
            fast = linearize_two_pose(x, a, b, fn, data)
            slow = linearize_two_pose_jacfwd(x, a, b, fn, data)
            if fast is None:
                assert slow is None
                continue
            np.testing.assert_allclose(np.asarray(fast[0]),
                                       np.asarray(slow[0]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(fast[1]),
                                       np.asarray(slow[1]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(fast[2]),
                                          np.asarray(slow[2]))
            checked += 1
        assert checked >= 3   # odom + planar + edge at minimum

    def test_moments_match_jacobian_form(self):
        """Moment-form per-factor blocks (factors._MOMENTS: J^T J / J^T r
        from per-point scalar reductions, J never materialized) == the
        J-form einsums, for both correspondence residual types."""
        import jax.numpy as jnp
        from nautilus_tpu.solve.factors import (_MOMENTS, HIGHEST,
                                                corr_factor_specs,
                                                linearize_two_pose)
        state, _ = make_problem(num_nodes=7, world_kind="room",
                                num_beams=240, seed=13,
                                odom_noise_trans=0.04, odom_noise_rot=0.02)
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg)
        x = solver._current_x()
        graph = solver.build_graph(x, window=3)
        checked = 0
        for (a, b, fn, data) in corr_factor_specs(graph):
            mom = _MOMENTS[fn]
            Hq, gq, cost = mom(x[a], x[b], *data)
            r, J, _ = linearize_two_pose(x, a, b, fn, data)
            Hq_ref = jnp.einsum("qmi,qmj->qij", J, J, precision=HIGHEST)
            gq_ref = jnp.einsum("qmi,qm->qi", J, r, precision=HIGHEST)
            np.testing.assert_allclose(np.asarray(Hq), np.asarray(Hq_ref),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(float(cost),
                                       float(0.5 * jnp.sum(r * r)),
                                       rtol=1e-5)
            checked += 1
        assert checked == 2   # planar (normal) + edge (point)

    def test_moments_scatter_band_matches(self):
        """The order-independent scatter assembly (multi-chip shards) with
        analytic='moments' == the J-form scatter."""
        from nautilus_tpu.solve.factors import assemble_banded_scatter
        state, _ = make_problem(num_nodes=9, world_kind="room",
                                num_beams=240, seed=3)
        cfg = load_config_text(DEFAULTS)
        solver = Solver(state, cfg)
        x = solver._current_x()
        graph = solver.build_graph(x, window=3)
        n, w = state.num_nodes, 3
        sys_j, c_j = assemble_banded_scatter(x, graph, n, w)
        sys_m, c_m = assemble_banded_scatter(x, graph, n, w,
                                             analytic="moments")
        np.testing.assert_allclose(float(c_m), float(c_j), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sys_m.diag),
                                   np.asarray(sys_j.diag),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sys_m.band),
                                   np.asarray(sys_j.band),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sys_m.g),
                                   np.asarray(sys_j.g),
                                   rtol=1e-4, atol=1e-4)

    def test_moments_full_solve_matches(self):
        """End-to-end sweep with assembly='moments' lands on the same map
        as the J-form assembly (both sweep lanes)."""
        state, _ = make_problem(num_nodes=12, world_kind="room",
                                num_beams=240, seed=7,
                                odom_noise_trans=0.03, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS)
        x0 = state.solution.copy()
        s_j = Solver(state, cfg, assembly="jacobian")
        st_j = s_j.solve_slam()
        sol_j = state.solution.copy()
        for fused, staged in ((True, False), (False, False), (True, True)):
            state.solution = x0.copy()
            s_m = Solver(state, cfg, assembly="moments", fused_sweep=fused,
                         staged_fused=staged)
            st_m = s_m.solve_slam()
            np.testing.assert_allclose(st_m.final_cost, st_j.final_cost,
                                       rtol=1e-4)
            np.testing.assert_allclose(state.solution, sol_j, rtol=5e-4,
                                       atol=5e-5)

    def test_moments_without_band_layout_warns(self):
        """assembly='moments' on a problem without the delta-major band
        layout must announce the fallback to closed-form Jacobians
        instead of silently riding string truthiness (ADVICE r3)."""
        import pytest
        state, _ = make_problem(num_nodes=8, world_kind="room",
                                num_beams=240, seed=7)
        s = Solver(state, load_config_text(DEFAULTS), assembly="moments")
        s._layout = None
        with pytest.warns(UserWarning, match="moments"):
            assert s._analytic_mode() is True


class TestStepTolerance:
    """accuracy_change_stop_threshold -> LMParams.step_tolerance: an
    accepted step whose mean |dx| is below the threshold ends the LM
    loop (the key's documented criterion; the reference declares but
    never reads it)."""

    def test_large_threshold_stops_after_first_accept(self):
        from nautilus_tpu.solve.lm import LMParams
        state, _ = make_problem(num_nodes=10, world_kind="room",
                                num_beams=240, seed=3,
                                odom_noise_trans=0.03, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS)
        s_free = Solver(state, cfg, lm_params=LMParams())
        st_free = s_free.solve_slam()
        state2, _ = make_problem(num_nodes=10, world_kind="room",
                                 num_beams=240, seed=3,
                                 odom_noise_trans=0.03, odom_noise_rot=0.01)
        s_stop = Solver(state2, cfg, lm_params=LMParams(step_tolerance=1e9))
        st_stop = s_stop.solve_slam()
        # Huge tolerance: every window converges on its first accepted
        # step, so total iterations strictly drop while costs still fall.
        assert sum(w.iterations for w in st_stop.windows) < \
            sum(w.iterations for w in st_free.windows)
        for w in st_stop.windows:
            assert w.final_cost <= w.initial_cost + 1e-9

    def test_config_key_binds_and_preserves_quality(self):
        state, _ = make_problem(num_nodes=10, world_kind="room",
                                num_beams=240, seed=3,
                                odom_noise_trans=0.03, odom_noise_rot=0.01)
        cfg = load_config_text(DEFAULTS +
                               "accuracy_change_stop_threshold=0.0001\n")
        s = Solver(state, cfg)
        assert s.lm_params.step_tolerance == pytest.approx(1e-4)
        st = s.solve_slam()
        state2, _ = make_problem(num_nodes=10, world_kind="room",
                                 num_beams=240, seed=3,
                                 odom_noise_trans=0.03, odom_noise_rot=0.01)
        st0 = Solver(state2, load_config_text(DEFAULTS)).solve_slam()
        # The default threshold only trims sub-0.1mm steps: final cost
        # must agree closely with the untrimmed run.
        np.testing.assert_allclose(st.final_cost, st0.final_cost, rtol=1e-3)
