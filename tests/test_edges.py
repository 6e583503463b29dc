"""Edge cases across subsystems: CLI interactive loop, Lua corner syntax,
CSM rotation boundary, tiny/degenerate problems."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest.synthetic import (make_problem, make_world, raycast,
                                           scan_to_points)


class TestLuaEdges:
    def test_scientific_notation_and_negatives(self):
        cfg = load_config_text("""
a = 1e-3
b = -2.5E2
c = -a
""")
        assert cfg.a == pytest.approx(1e-3)
        assert cfg.b == pytest.approx(-250.0)
        assert cfg.c == pytest.approx(-1e-3)

    def test_string_concat(self):
        cfg = load_config_text("""
base = "data/"
f = base .. "run" .. 7 .. ".bag"
""")
        assert cfg.f == "data/run7.bag"

    def test_nested_parens_and_power_assoc(self):
        cfg = load_config_text("x = 2 ^ 3 ^ 2\ny = ((1 + 2) * (3 + 4))")
        assert cfg.x == 512  # right-associative
        assert cfg.y == 21


class TestCSMBoundary:
    def test_rotation_near_restriction_edge(self):
        """A rotation close to +-rotation_restriction is still found."""
        from nautilus_tpu.kernels.csm import CSMParams, csm_match
        world = make_world("office")
        pose_b = np.array([1.0, 2.0, 0.3])
        delta = np.array([0.2, -0.1, 1.45])   # near pi/2 limit
        c, s = np.cos(pose_b[2]), np.sin(pose_b[2])
        ta = pose_b[:2] + np.array([[c, -s], [s, c]]) @ delta[:2]
        pose_a = np.array([ta[0], ta[1], pose_b[2] + delta[2]])
        def pad(cl, p=1024):
            out = np.zeros((p, 2), np.float32)
            m = np.zeros(p, bool)
            out[:len(cl)] = cl
            m[:len(cl)] = True
            return jnp.asarray(out), jnp.asarray(m)
        a, ma = pad(scan_to_points(raycast(world, pose_a, 720, max_range=10),
                                   max_range=10))
        b, mb = pad(scan_to_points(raycast(world, pose_b, 720, max_range=10),
                                   max_range=10))
        score, tr = csm_match(a, ma, b, mb, CSMParams(scan_range=10.0))
        assert abs(float(tr[2]) - delta[2]) < 0.06


class TestInteractiveCLI:
    def test_stdin_command_loop(self, tmp_path, monkeypatch):
        from nautilus_tpu import cli
        cfg = tmp_path / "run.lua"
        cfg.write_text(f"""
pose_number=6
differential_odom=false
max_lidar_range=30
rotation_change_for_lidar=math.pi / 18
translation_change_for_lidar=0.25
lidar_topic="/scan"
odom_topic="/odom"
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=2
outlier_threshold=0.25
hitl_line_width=0.3
hitl_pose_point_threshold=10
pose_output_file="{tmp_path}/p.txt"
map_output_file="{tmp_path}/m.txt"
bag_path=""
""")
        monkeypatch.setattr("sys.stdin", io.StringIO(
            "write\nbogus_command\nhitl bad args\nquit\n"))
        rc = cli.main(["--config_file", str(cfg), "--synthetic", "room",
                       "--interactive", "--quiet"])
        assert rc == 0
        assert (tmp_path / "p.txt").exists()


class TestDegenerate:
    def test_minimum_two_node_problem(self):
        state, _ = make_problem(num_nodes=2, world_kind="room", num_beams=180)
        from nautilus_tpu.solve.solver import Solver
        cfg = load_config_text("""
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=1
outlier_threshold=0.25
""")
        stats = Solver(state, cfg).solve_slam()
        assert np.isfinite(stats.final_cost)

    def test_no_feature_overlap(self):
        """Nodes so far apart no lidar matches exist: odometry-only solve."""
        state, _ = make_problem(num_nodes=4, world_kind="room", num_beams=180)
        state.solution[:, 0] += np.arange(4) * 100.0  # scatter nodes apart
        from nautilus_tpu.solve.solver import Solver
        cfg = load_config_text("""
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=2
outlier_threshold=0.25
""")
        stats = Solver(state, cfg).solve_slam()
        assert np.isfinite(stats.final_cost)
