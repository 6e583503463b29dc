"""Aux subsystems: visualization snapshots, timers, full-state checkpoint."""

import numpy as np
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.io.checkpoint import load_state, save_state
from nautilus_tpu.io.vectorize import extract_lines, vectorize
from nautilus_tpu.solve.hitl import HitlSlamInputMsg, hitl_callback
from nautilus_tpu.solve.solver import Solver
from nautilus_tpu.utils.timer import CumulativeFunctionTimer, FunctionTimer
from nautilus_tpu.viz.visualizer import (SnapshotVisualizer,
                                         transformed_clouds)

CFG = """
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=2
outlier_threshold=0.25
hitl_line_width=0.1
hitl_pose_point_threshold=10
"""


class TestVisualizer:
    def test_snapshots_recorded_per_window(self):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=180)
        cfg = load_config_text(CFG)
        vis = SnapshotVisualizer(record_clouds=True)
        Solver(state, cfg, visualizer=vis).solve_slam()
        # initial draw + one per window (2 windows).
        assert len(vis.snapshots) == 3
        assert vis.snapshots[0].window is None
        assert vis.snapshots[-1].window == 2
        assert vis.snapshots[-1].all_points.shape[1] == 2
        assert len(vis.snapshots[-1].planar_points) <= len(
            vis.snapshots[-1].all_points)

    def test_npz_output(self, tmp_path):
        state, _ = make_problem(num_nodes=4, world_kind="room", num_beams=180)
        vis = SnapshotVisualizer(output_dir=tmp_path)
        vis.draw_solution(state)
        files = list(tmp_path.glob("snapshot_*.npz"))
        assert len(files) == 1
        z = np.load(files[0])
        assert z["poses"].shape == (4, 3)

    def test_transformed_clouds_identity(self):
        state, _ = make_problem(num_nodes=3, world_kind="room", num_beams=180)
        state.solution[:] = 0.0
        cloud = transformed_clouds(state, "all")
        raw = np.asarray(state.problem.points)[
            np.asarray(state.problem.points_mask)]
        np.testing.assert_allclose(cloud, raw.reshape(-1, 2), atol=1e-9)


class TestTimers:
    def test_function_timer(self):
        messages = []
        with FunctionTimer("unit", printer=messages.append) as t:
            pass
        assert t.elapsed_ms is not None
        assert "unit took" in messages[0]

    def test_cumulative_timer(self):
        t = CumulativeFunctionTimer("cumul-test")
        for _ in range(3):
            with t.scope():
                pass
        assert t.invocations == 3
        assert "3 invocations" in t.report()


class TestCheckpoint:
    def test_roundtrip_with_hitl_and_lc(self, tmp_path):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=360)
        cfg = load_config_text(CFG).replace(translation_weight=0.05,
                                            rotation_weight=0.05)
        solver = Solver(state, cfg)
        msg = HitlSlamInputMsg.from_points(
            (-5.2, -5.0), (5.2, -5.0), (-5.2, -4.8), (5.2, -4.8))
        hitl_callback(solver, msg, verbose=False)
        state.lc_factors.append(
            (0, 3, np.array([0.5, 0.2]), 0.1, 2.0, 2.0))
        f = tmp_path / "session.npz"
        save_state(state, f)

        fresh, _ = make_problem(num_nodes=6, world_kind="room", num_beams=360)
        load_state(fresh, f)
        np.testing.assert_allclose(fresh.solution, state.solution)
        assert len(fresh.hitl_constraints) == len(state.hitl_constraints)
        if state.hitl_constraints:
            a = state.hitl_constraints[0]
            b = fresh.hitl_constraints[0]
            np.testing.assert_allclose(a.line_a[0], b.line_a[0])
            assert [n for n, _ in a.line_a_poses] == [
                n for n, _ in b.line_a_poses]
        assert len(fresh.lc_factors) == 1
        np.testing.assert_allclose(fresh.lc_factors[0][2], [0.5, 0.2])
        # The restored state solves identically.
        s2 = Solver(fresh, cfg).solve_slam()
        assert np.isfinite(s2.final_cost)


class TestVectorize:
    def test_extract_lines_square(self):
        # A square room: 4 walls -> ~4 segments.
        xs = np.linspace(0, 4, 300)
        walls = np.concatenate([
            np.stack([xs, np.zeros_like(xs)], -1),
            np.stack([xs, np.full_like(xs, 4.0)], -1),
            np.stack([np.zeros_like(xs), xs], -1),
            np.stack([np.full_like(xs, 4.0), xs], -1)])
        segs = extract_lines(walls, min_inliers=50)
        assert 4 <= len(segs) <= 6
        # Each extracted segment is ~4 long and axis-aligned.
        for a, b in segs:
            length = np.linalg.norm(b - a)
            assert length > 3.0
            d = (b - a) / length
            assert min(abs(d[0]), abs(d[1])) < 0.05

    def test_vectorize_writes_csv(self, tmp_path):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=360)
        out = tmp_path / "map.txt"
        lines = vectorize(state, out, verbose=False)
        assert out.exists()
        rows = out.read_text().strip().splitlines()
        assert len(rows) == len(lines)
        assert all(len(r.split(",")) == 4 for r in rows)


class TestCorrespondenceViz:
    def test_correspondences_recorded(self):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=360)
        cfg = load_config_text(CFG)
        vis = SnapshotVisualizer(record_clouds=False)
        Solver(state, cfg, visualizer=vis).solve_slam()
        assert len(vis.correspondences) > 0
        rec = vis.correspondences[0]
        assert rec["src_pts"].shape == rec["tgt_pts"].shape
        assert len(rec["src_node"]) == len(rec["src_pts"])

    def test_auto_lc_draws_scans(self):
        from nautilus_tpu.loop_closure.auto_lc import solve_auto_lc
        from nautilus_tpu.kernels.csm import CSMParams
        state, _ = make_problem(num_nodes=20, world_kind="building",
                                num_beams=360, seed=8)
        cfg = load_config_text(CFG + """
lc_translation_weight=1
lc_rotation_weight=1
csm_score_threshold=-5.0
max_lidar_range=10
""")
        vis = SnapshotVisualizer(record_clouds=False)
        solver = Solver(state, cfg, visualizer=vis)
        solver.solve_slam()
        solve_auto_lc(solver, apply=False, verbose=False,
                      csm_params=CSMParams(scan_range=10.0, high_res=0.05))
        assert len(vis.lc_scans) == 1


class TestMergeColinear:
    def test_merges_split_wall(self):
        from nautilus_tpu.io.vectorize import merge_colinear
        segs = [(np.array([0.0, 0.0]), np.array([2.0, 0.0])),
                (np.array([2.2, 0.01]), np.array([4.0, 0.01])),  # same wall
                (np.array([0.0, 3.0]), np.array([0.0, 5.0]))]    # different
        out = merge_colinear(segs)
        assert len(out) == 2
        lengths = sorted(np.linalg.norm(b - a) for a, b in out)
        assert lengths[-1] == pytest.approx(4.0, abs=0.1)

    def test_far_parallel_not_merged(self):
        from nautilus_tpu.io.vectorize import merge_colinear
        segs = [(np.array([0.0, 0.0]), np.array([2.0, 0.0])),
                (np.array([0.0, 1.0]), np.array([2.0, 1.0]))]  # offset 1m
        assert len(merge_colinear(segs)) == 2

    def test_gap_too_large_not_merged(self):
        from nautilus_tpu.io.vectorize import merge_colinear
        segs = [(np.array([0.0, 0.0]), np.array([1.0, 0.0])),
                (np.array([3.0, 0.0]), np.array([4.0, 0.0]))]  # 2m gap
        assert len(merge_colinear(segs)) == 2


class TestJoinCorners:
    def test_l_corner_snaps_to_intersection(self):
        from nautilus_tpu.io.vectorize import join_corners
        # Two walls stopping 0.2 m short of their shared corner at (2, 0).
        segs = [(np.array([0.0, 0.0]), np.array([1.8, 0.0])),
                (np.array([2.0, 0.2]), np.array([2.0, 3.0]))]
        out = join_corners(segs)
        np.testing.assert_allclose(out[0][1], [2.0, 0.0], atol=1e-9)
        np.testing.assert_allclose(out[1][0], [2.0, 0.0], atol=1e-9)
        # Untouched far endpoints.
        np.testing.assert_allclose(out[0][0], [0.0, 0.0])
        np.testing.assert_allclose(out[1][1], [2.0, 3.0])

    def test_colinear_and_far_pairs_untouched(self):
        from nautilus_tpu.io.vectorize import join_corners
        segs = [(np.array([0.0, 0.0]), np.array([2.0, 0.0])),
                (np.array([2.2, 0.0]), np.array([4.0, 0.0])),   # colinear
                (np.array([6.0, 1.0]), np.array([6.0, 4.0]))]   # far corner
        out = join_corners(segs)
        for (a, b), (oa, ob) in zip(segs, out):
            np.testing.assert_allclose(oa, a)
            np.testing.assert_allclose(ob, b)


class TestPolylineChains:
    def test_open_chain(self):
        from nautilus_tpu.io.vectorize import polyline_chains
        segs = [(np.array([0.0, 0.0]), np.array([1.0, 0.0])),
                (np.array([1.0, 0.0]), np.array([1.0, 1.0])),
                (np.array([5.0, 5.0]), np.array([6.0, 5.0]))]  # separate
        chains = polyline_chains(segs)
        assert sorted(len(c) for c in chains) == [2, 3]

    def test_closed_loop(self):
        from nautilus_tpu.io.vectorize import polyline_chains
        square = [(np.array([0.0, 0.0]), np.array([1.0, 0.0])),
                  (np.array([1.0, 0.0]), np.array([1.0, 1.0])),
                  (np.array([1.0, 1.0]), np.array([0.0, 1.0])),
                  (np.array([0.0, 1.0]), np.array([0.0, 0.0]))]
        chains = polyline_chains(square)
        assert len(chains) == 1
        # 4 segments walked end to end: 5 vertices, closed.
        assert len(chains[0]) == 5
        np.testing.assert_allclose(chains[0][0], chains[0][-1])

    def test_square_room_end_to_end(self):
        from nautilus_tpu.io.vectorize import (extract_lines, merge_colinear,
                                               join_corners, polyline_chains)
        xs = np.linspace(0, 4, 300)
        walls = np.concatenate([
            np.stack([xs, np.zeros_like(xs)], -1),
            np.stack([xs, np.full_like(xs, 4.0)], -1),
            np.stack([np.zeros_like(xs), xs], -1),
            np.stack([np.full_like(xs, 4.0), xs], -1)])
        segs = join_corners(merge_colinear(extract_lines(walls,
                                                         min_inliers=50)))
        chains = polyline_chains(segs, tol=0.1)
        # The four walls close into one loop once corners are joined.
        assert len(chains) == 1 and len(chains[0]) == len(segs) + 1


class TestRosEncode:
    def test_pointcloud2_roundtrip(self, rng):
        from nautilus_tpu.viz.ros_encode import (decode_pointcloud2,
                                                 encode_pointcloud2)
        pts = rng.normal(size=(57, 2)).astype(np.float32)
        msg = encode_pointcloud2(pts)
        assert msg["width"] == 57
        assert msg["point_step"] == 12
        assert len(msg["data"]) == 57 * 12
        assert [f["name"] for f in msg["fields"]] == ["x", "y", "z"]
        np.testing.assert_allclose(decode_pointcloud2(msg), pts, atol=1e-7)


class TestVectorizeGroundTruth:
    """Backlog item: validate the vector map against the synthetic world's
    true wall segments (reference comparison would need rviz + real bags;
    ground-truth walls give a quantitative equivalent)."""

    def test_vectorize_recovers_world_walls(self):
        from nautilus_tpu.ingest.synthetic import make_world

        state, _ = make_problem(num_nodes=20, world_kind="room",
                                num_beams=360, seed=2,
                                odom_noise_trans=0.02, odom_noise_rot=0.01)
        cfg = load_config_text(CFG)
        Solver(state, cfg).solve_slam()
        segs = vectorize(state, None, verbose=False)
        assert len(segs) >= 3   # a room has 4 walls; oblique views may merge

        world = make_world("room")   # [S, 2, 2] true wall segments

        def seg_to_wall_dist(p):
            """Min distance of point p to any true wall segment."""
            a, b = world[:, 0], world[:, 1]
            ab = b - a
            t = np.clip(np.einsum("sd,sd->s", p - a, ab)
                        / np.maximum(np.einsum("sd,sd->s", ab, ab), 1e-12),
                        0.0, 1.0)
            proj = a + t[:, None] * ab
            return np.min(np.linalg.norm(p - proj, axis=1))

        # Precision: every extracted segment hugs a true wall (endpoints
        # and midpoint within 20 cm given 2 cm odometry noise).
        total_len = 0.0
        for s0, s1 in segs:
            s0, s1 = np.asarray(s0, float), np.asarray(s1, float)
            for p in (s0, s1, 0.5 * (s0 + s1)):
                assert seg_to_wall_dist(p) < 0.2, (s0, s1)
            total_len += np.linalg.norm(s1 - s0)

        # Recall: the extracted map covers a meaningful share of the
        # visible wall perimeter.
        perimeter = np.sum(np.linalg.norm(world[:, 1] - world[:, 0], axis=1))
        assert total_len > 0.4 * perimeter
