"""Live-command bridge + wire encoders: the reference's interactive
surface (main.cc:204-213, solver_vis_ros.cc:114-204) without a ROS master.

The bridge subscribes with rospy.AnyMsg and decodes raw buffers through
viz/ros_encode.py; these tests feed wire-encoded messages through
``dispatch()`` — the exact callback path a live rviz operator exercises.
"""

import numpy as np
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.solve.solver import Solver
from nautilus_tpu.viz import ros_encode as enc
from nautilus_tpu.viz.bridge import RosInputBridge

CFG = """
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=3
outlier_threshold=0.25
hitl_lc_topic="/hitl_slam_input"
hitl_line_width=0.3
hitl_pose_point_threshold=5
pose_output_file="poses_out.txt"
map_output_file="map_out.csv"
"""


@pytest.fixture(scope="module")
def solved():
    state, _ = make_problem(num_nodes=16, world_kind="office", num_beams=180,
                            seed=0, pad_multiple=128)
    cfg = load_config_text(CFG)
    solver = Solver(state, cfg)
    solver.solve_slam()
    return solver, cfg


class TestWireCodecs:
    def test_hitl_roundtrip(self):
        pts = [(-1.0, 2.0), (3.5, 2.0), (-1.0, 2.5), (3.5, 2.6)]
        buff = enc.encode_hitl_input(*pts)
        assert len(buff) == 48
        out = enc.decode_hitl_input(buff)
        for got, want in zip(out, pts):
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_hitl_short_buffer_rejected(self):
        with pytest.raises(ValueError):
            enc.decode_hitl_input(b"\x00" * 12)

    def test_write_msg_roundtrip(self):
        assert enc.decode_write_msg(enc.encode_write_msg(True)) is True
        assert enc.decode_write_msg(enc.encode_write_msg(False)) is False

    def test_marker_line_list_layout(self):
        m = enc.encode_marker_line_list([(0, 0), (1, 1)], [(2, 0), (3, 1)])
        assert m["type"] == enc.MARKER_LINE_LIST == 5
        assert m["action"] == enc.MARKER_ADD == 0
        assert m["pose"]["qw"] == 1.0
        assert m["scale_x"] == pytest.approx(0.05)
        # points alternate start, end (gui_helpers::AddLine ordering)
        assert [p["x"] for p in m["points"]] == [0, 2, 1, 3]
        assert all(p["z"] == 0.0 for p in m["points"])
        assert len(m["colors"]) == 4
        assert m["color"] == dict(r=0.0, g=1.0, b=0.0, a=1.0)  # kGreen

    def test_pose_array(self):
        pa = enc.encode_pose_array([[1.0, 2.0, np.pi]])
        p = pa["poses"][0]
        assert (p["x"], p["y"]) == (1.0, 2.0)
        assert p["qz"] == pytest.approx(1.0)
        assert p["qw"] == pytest.approx(0.0, abs=1e-12)

    def test_pose_with_covariance_slots(self):
        cov = np.array([[4.0, 0.5], [0.5, 9.0]])
        d = enc.encode_pose_with_covariance([0, 0, 0], cov, seq=3)
        c = d["covariance"]
        assert len(c) == 36
        # row-major 6x6: [0]=(0,0), [1]=(0,1), [6]=(1,0), [7]=(1,1);
        # slot [7] carries the KNOWN FIX (reference wrote cov(0,1) there).
        assert (c[0], c[1], c[6], c[7]) == (4.0, 0.5, 0.5, 9.0)
        assert sum(abs(v) for v in c) == pytest.approx(14.0)
        assert d["seq"] == 3


class TestBridgeDispatch:
    def test_hitl_message_adds_constraint_and_resolves(self, solved):
        from nautilus_tpu.viz.visualizer import transformed_clouds
        solver, cfg = solved
        n_before = len(solver.state.hitl_constraints)
        # Draw the two lines along the map's densest horizontal wall band.
        cloud = transformed_clouds(solver.state, "all")
        ys = np.round(cloud[:, 1], 1)
        vals, counts = np.unique(ys, return_counts=True)
        y = float(vals[np.argmax(counts)])
        x0, x1 = float(cloud[:, 0].min()), float(cloud[:, 0].max())
        buff = enc.encode_hitl_input((x0, y), (x1, y),
                                     (x0, y + 0.1), (x1, y + 0.1))
        bridge = RosInputBridge(solver, cfg, verbose=False)
        bridge.dispatch("/hitl_slam_input", buff)
        assert len(solver.state.hitl_constraints) == n_before + 1
        assert bridge.handled == 1
        c = solver.state.hitl_constraints[-1]
        assert len(c.line_a_poses) + len(c.line_b_poses) > 0

    def test_write_and_vectorize_routed(self, solved, tmp_path,
                                        monkeypatch):
        solver, cfg = solved
        monkeypatch.chdir(tmp_path)
        bridge = RosInputBridge(solver, cfg, verbose=False)
        bridge.dispatch("/write_output", enc.encode_write_msg())
        assert (tmp_path / "poses_out.txt").exists()
        bridge.dispatch("/vectorize_output", enc.encode_write_msg())
        assert (tmp_path / "map_out.csv").exists()
        assert bridge.handled == 2

    def test_unknown_topic_rejected(self, solved):
        solver, cfg = solved
        bridge = RosInputBridge(solver, cfg, verbose=False)
        with pytest.raises(KeyError):
            bridge.dispatch("/nope", b"")

    def test_topic_name_from_config(self, solved):
        solver, _ = solved
        cfg = load_config_text(CFG.replace('"/hitl_slam_input"',
                                           '"/custom_hitl"'))
        bridge = RosInputBridge(solver, cfg, verbose=False)
        assert "/custom_hitl" in bridge.topics()


class TestCorrespondenceEndpoints:
    def test_world_transform(self, solved):
        from nautilus_tpu.viz.visualizer import (
            correspondence_world_endpoints)
        solver, cfg = solved
        x = solver._current_x()
        graph = solver.build_graph(x, 3)
        starts, ends = correspondence_world_endpoints(solver.state,
                                                      graph.planar)
        assert len(starts) == len(ends) > 0
        # matched pairs should be near each other in world frame
        d = np.linalg.norm(starts - ends, axis=1)
        assert float(np.median(d)) < float(cfg.outlier_threshold) * 2
