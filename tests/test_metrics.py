"""Trajectory metrics: SE(2) alignment, ATE, RPE (utils/metrics.py)."""
import numpy as np
import pytest

from nautilus_tpu.utils.metrics import align_se2, ate, rpe, wrap_angle


def _trajectory(n=40, seed=0):
    rng = np.random.default_rng(seed)
    th = np.cumsum(rng.normal(0, 0.1, n))
    xy = np.cumsum(np.stack([np.cos(th), np.sin(th)], axis=1) * 0.5, axis=0)
    return np.concatenate([xy, th[:, None]], axis=1)


def _apply_rigid(poses, dtheta, t):
    R = np.array([[np.cos(dtheta), -np.sin(dtheta)],
                  [np.sin(dtheta), np.cos(dtheta)]])
    return np.concatenate([poses[:, :2] @ R.T + t,
                           wrap_angle(poses[:, 2:3] + dtheta)], axis=1)


class TestAlign:
    def test_recovers_rigid_transform(self):
        ref = _trajectory()
        est = _apply_rigid(ref, 1.3, np.array([4.0, -2.5]))
        aligned, dtheta, t = align_se2(est, ref)
        np.testing.assert_allclose(aligned[:, :2], ref[:, :2], atol=1e-9)
        np.testing.assert_allclose(wrap_angle(aligned[:, 2] - ref[:, 2]),
                                   0.0, atol=1e-9)
        assert abs(wrap_angle(dtheta + 1.3)) < 1e-9

    def test_noise_alignment_beats_identity(self):
        ref = _trajectory()
        rng = np.random.default_rng(1)
        est = _apply_rigid(ref, 0.7, np.array([1.0, 1.0]))
        est[:, :2] += rng.normal(0, 0.01, est[:, :2].shape)
        aligned, _, _ = align_se2(est, ref)
        err_aligned = np.linalg.norm(aligned[:, :2] - ref[:, :2], axis=1)
        err_raw = np.linalg.norm(est[:, :2] - ref[:, :2], axis=1)
        assert err_aligned.mean() < 0.02 < err_raw.mean()


class TestATE:
    def test_zero_under_gauge(self):
        """A purely re-gauged trajectory is a perfect map: ATE == 0."""
        ref = _trajectory()
        est = _apply_rigid(ref, -2.1, np.array([10.0, 3.0]))
        m = ate(est, ref)
        assert m["trans_rmse"] < 1e-9
        assert m["rot_rmse"] < 1e-9

    def test_known_offset_without_alignment(self):
        ref = _trajectory()
        est = ref.copy()
        est[:, 0] += 0.5
        m = ate(est, ref, align=False)
        np.testing.assert_allclose(m["trans_rmse"], 0.5, atol=1e-12)
        np.testing.assert_allclose(m["trans_max"], 0.5, atol=1e-12)

    def test_heading_error_reported(self):
        ref = _trajectory()
        est = ref.copy()
        est[:, 2] = wrap_angle(est[:, 2] + 0.1)
        m = ate(est, ref, align=False)
        np.testing.assert_allclose(m["rot_rmse"], 0.1, atol=1e-12)


class TestRPE:
    def test_gauge_invariant(self):
        ref = _trajectory()
        est = _apply_rigid(ref, 0.9, np.array([-3.0, 7.0]))
        m = rpe(est, ref, delta=1)
        assert m["trans_rmse"] < 1e-9
        assert m["rot_rmse"] < 1e-9

    def test_detects_drift(self):
        ref = _trajectory()
        rng = np.random.default_rng(2)
        est = ref.copy()
        est[:, :2] += np.cumsum(rng.normal(0, 0.01, est[:, :2].shape),
                                axis=0)
        m1 = rpe(est, ref, delta=1)
        m5 = rpe(est, ref, delta=5)
        assert 0 < m1["trans_rmse"] < m5["trans_rmse"]

    def test_too_short_raises(self):
        ref = _trajectory(n=3)
        with pytest.raises(ValueError):
            rpe(ref, ref, delta=3)


class TestSolveAccuracy:
    def test_solve_improves_ate_vs_odometry(self):
        """End-to-end: the solved trajectory must beat raw odometry
        against the synthetic world's ground truth."""
        from nautilus_tpu.core.luaconf import load_config_text
        from nautilus_tpu.ingest.synthetic import make_problem
        from nautilus_tpu.solve.solver import Solver
        state, gt = make_problem(num_nodes=40, world_kind="office",
                                 num_beams=180, seed=3,
                                 odom_noise_trans=0.05,
                                 odom_noise_rot=0.02)
        x0 = np.asarray(state.solution).copy()
        cfg = load_config_text(
            "translation_weight=1\nrotation_weight=1\n"
            "lidar_constraint_amount_min=1\nlidar_constraint_amount_max=3\n"
            "outlier_threshold=0.25")
        Solver(state, cfg).solve_slam()
        before = ate(x0, gt)["trans_rmse"]
        after = ate(np.asarray(state.solution), gt)["trans_rmse"]
        # Measured 0.118 -> 0.052 at this seed/noise (2.3x); assert a
        # healthy margin, not just improvement.
        assert after < 0.6 * before, (before, after)
