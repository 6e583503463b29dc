"""Ingest tests: bag round-trip, builder semantics, full bag->solve flow."""

import numpy as np
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest import rosbag as rb
from nautilus_tpu.ingest.builder import (AbsoluteOdometryTracking,
                                         DifferentialOdometryTracking,
                                         SLAMTypeBuilder, laser_scan_to_points,
                                         process_bag_file,
                                         z_radians_from_quaternion)
from nautilus_tpu.ingest.synthetic import write_synthetic_bag

BASE_CFG = """
pose_number=10
differential_odom=false
max_lidar_range=30
rotation_change_for_lidar=math.pi / 18
translation_change_for_lidar=0.25
lidar_topic="/scan"
odom_topic="/odom"
"""


def _scan(ranges, n=None):
    n = n or len(ranges)
    return rb.LaserScanMsg(
        header=rb.HeaderMsg(0, 1.5, "laser"),
        angle_min=-np.pi, angle_max=np.pi, angle_increment=2 * np.pi / n,
        time_increment=0.0, scan_time=0.1, range_min=0.02, range_max=30.0,
        ranges=np.asarray(ranges, np.float32),
        intensities=np.zeros(0, np.float32))


def _odom(x, y, yaw, t=1.0):
    return rb.OdometryMsg(
        header=rb.HeaderMsg(0, t, "odom"), child_frame_id="base",
        position=np.array([x, y, 0.0]),
        orientation=np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)]),
        twist_linear=np.zeros(3), twist_angular=np.zeros(3))


class TestBagRoundtrip:
    def test_messages_roundtrip(self, tmp_path):
        msgs = [
            ("/odom", 1.0, _odom(1.0, 2.0, 0.3)),
            ("/scan", 1.1, _scan(np.linspace(1, 5, 360))),
            ("/cobot", 1.2, rb.CobotOdometryMsg(rb.HeaderMsg(1, 1.2, "o"),
                                                dr=0.1, dx=0.2, dy=0.3)),
        ]
        path = tmp_path / "t.bag"
        rb.write_bag(path, msgs)
        out = list(rb.read_bag(path))
        assert [m.topic for m in out] == ["/odom", "/scan", "/cobot"]
        odom = out[0].msg
        np.testing.assert_allclose(odom.position[:2], [1.0, 2.0])
        scan = out[1].msg
        assert len(scan.ranges) == 360
        np.testing.assert_allclose(scan.ranges[0], 1.0, rtol=1e-6)
        cob = out[2].msg
        assert cob.dr == pytest.approx(0.1)

    def test_topic_filter(self, tmp_path):
        msgs = [("/a", 1.0, _odom(0, 0, 0)), ("/b", 1.1, _odom(1, 1, 0))]
        path = tmp_path / "t.bag"
        rb.write_bag(path, msgs)
        out = list(rb.read_bag(path, topics=["/b"]))
        assert len(out) == 1 and out[0].topic == "/b"

    def test_magic_check(self, tmp_path):
        p = tmp_path / "bad.bag"
        p.write_bytes(b"not a bag")
        with pytest.raises(ValueError):
            list(rb.read_bag(p))

    @pytest.mark.parametrize("compression", ["bz2", "lz4"])
    def test_compressed_chunk_roundtrip(self, tmp_path, compression):
        """rosbag's standard codec set (main.cc:54-67 gets it via librosbag)."""
        from nautilus_tpu.ingest import lz4f
        if compression == "lz4" and not lz4f.available():
            pytest.skip("liblz4 not present")
        msgs = [
            ("/odom", 1.0, _odom(1.0, 2.0, 0.3)),
            ("/scan", 1.1, _scan(np.linspace(1, 5, 360))),
        ]
        path = tmp_path / f"t_{compression}.bag"
        rb.write_bag(path, msgs, compression=compression)
        out = list(rb.read_bag(path))
        assert [m.topic for m in out] == ["/odom", "/scan"]
        np.testing.assert_allclose(out[0].msg.position[:2], [1.0, 2.0])
        np.testing.assert_allclose(out[1].msg.ranges,
                                   np.linspace(1, 5, 360), rtol=1e-6)


class TestLz4Frame:
    def test_xxh32_reference_vectors(self):
        from nautilus_tpu.ingest import lz4f
        assert lz4f.xxh32(b"") == 0x02CC5D05
        assert lz4f.xxh32(b"abc") == 0x32D153FF

    @pytest.mark.parametrize("payload", [
        b"",
        b"hello lz4 frame " * 3,
        bytes(range(256)) * 1024,                  # 256 KB, multi-block
        np.random.default_rng(3).bytes(100_000),   # incompressible blocks
    ])
    def test_frame_roundtrip(self, payload):
        from nautilus_tpu.ingest import lz4f
        if not lz4f.available():
            pytest.skip("liblz4 not present")
        assert lz4f.decompress(lz4f.compress(payload)) == payload

    def test_bad_magic_rejected(self):
        from nautilus_tpu.ingest import lz4f
        if not lz4f.available():
            pytest.skip("liblz4 not present")
        with pytest.raises(ValueError):
            lz4f.decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")


class TestBuilderSemantics:
    def test_quaternion_yaw(self):
        for yaw in (0.0, 0.5, -1.2, 3.0):
            q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
            assert z_radians_from_quaternion(q) == pytest.approx(yaw, abs=1e-9)

    def test_scan_conversion_gating(self):
        ranges = np.array([0.01, 5.0, 31.0, 10.0])
        scan = _scan(ranges, n=4)
        pts = laser_scan_to_points(scan, 30.0)
        assert len(pts) == 2  # 0.01 below range_min, 31 above max_range
        # First kept point: range 5 at angle -pi + inc*1.
        ang = -np.pi + (2 * np.pi / 4) * 1
        np.testing.assert_allclose(pts[0], [5 * np.cos(ang), 5 * np.sin(ang)],
                                   rtol=1e-5)

    def test_beam_truncation(self):
        cfg = load_config_text(BASE_CFG)
        b = SLAMTypeBuilder(cfg)
        b.abs_tracking.callback(_odom(0, 0, 0))
        b.abs_tracking.callback(_odom(1.0, 0, 0))  # exceeds trans threshold
        assert b.abs_tracking.ready_for_lidar()
        b.lidar_callback(_scan(np.full(720, 10.0)))
        assert len(b.nodes) == 1
        # Truncated: i < 55 (55 beams) or i > 720-55=665 (54 beams) — the
        # reference's strict-greater bound (slam_type_builder.cc:62).
        assert len(b.nodes[0].points) == 720 - 109

    def test_motion_gating_and_cap(self):
        cfg = load_config_text(BASE_CFG).replace(pose_number=3.0)
        b = SLAMTypeBuilder(cfg)
        scan = _scan(np.full(360, 5.0))
        b.odometry_callback(_odom(0, 0, 0))
        b.lidar_callback(scan)       # pending motion 0 -> no capture
        assert len(b.nodes) == 0
        for k in range(1, 10):
            b.odometry_callback(_odom(0.3 * k, 0, 0))
            b.lidar_callback(scan)
        assert len(b.nodes) == 3     # capped at pose_number
        assert b.done()

    def test_odom_factors_consecutive(self):
        cfg = load_config_text(BASE_CFG)
        b = SLAMTypeBuilder(cfg)
        scan = _scan(np.full(360, 5.0))
        for k in range(4):
            b.odometry_callback(_odom(0.3 * k, 0.1 * k, 0))
            b.lidar_callback(scan)
        raw = b.to_raw_nodes()
        assert list(raw.odom_i) == list(range(len(raw.odom_i)))
        assert list(raw.odom_j) == list(range(1, len(raw.odom_i) + 1))
        # Factor = world-frame pose delta.
        np.testing.assert_allclose(
            raw.odom_trans[0],
            raw.initial_poses[1, :2] - raw.initial_poses[0, :2], atol=1e-9)

    def test_differential_tracking(self):
        d = DifferentialOdometryTracking(np.pi / 18, 0.25)
        d.callback(rb.CobotOdometryMsg(rb.HeaderMsg(0, 0, ""), 0, 0.3, 0.0))
        # First message initializes only.
        assert not d.ready_for_lidar()
        d.callback(rb.CobotOdometryMsg(rb.HeaderMsg(0, 0, ""), 0, 0.3, 0.0))
        assert d.ready_for_lidar()
        pose = d.get_pose()
        np.testing.assert_allclose(pose, [0.3, 0.0, 0.0], atol=1e-9)

    def test_differential_requires_config(self):
        cfg = load_config_text(BASE_CFG)
        b = SLAMTypeBuilder(cfg)
        with pytest.raises(ValueError):
            b.odometry_callback(
                rb.CobotOdometryMsg(rb.HeaderMsg(0, 0, ""), 0, 0.1, 0))


class TestBagToSolve:
    def test_synthetic_bag_full_pipeline(self, tmp_path):
        bag = tmp_path / "synth.bag"
        write_synthetic_bag(bag, num_nodes=8, world_kind="room",
                            num_beams=360, seed=2)
        cfg = load_config_text(BASE_CFG + """
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=2
outlier_threshold=0.25
""").replace(pose_number=8.0)
        raw = process_bag_file(bag, cfg, verbose=False)
        n = raw.points.shape[0]
        assert 4 <= n <= 8
        # Full solve on the ingested problem.
        from nautilus_tpu.core.preprocess import preprocess
        from nautilus_tpu.core.problem import SLAMState, build_problem
        from nautilus_tpu.solve.solver import Solver
        normals, pi_, pm, ei, em, _ = preprocess(raw.points, raw.points_mask)
        problem = build_problem(raw, normals, pi_, pm, ei, em)
        state = SLAMState.from_problem(problem, raw.timestamps)
        stats = Solver(state, cfg).solve_slam()
        assert np.isfinite(stats.final_cost)
        assert stats.windows[-1].final_cost <= stats.windows[-1].initial_cost


class TestIngestCache:
    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        from nautilus_tpu.ingest import cache as cache_mod
        monkeypatch.setattr(cache_mod, "cache_dir", lambda: tmp_path)
        bag = tmp_path / "c.bag"
        write_synthetic_bag(bag, num_nodes=6, world_kind="room",
                            num_beams=180, seed=1)
        cfg = load_config_text(BASE_CFG)
        r1 = cache_mod.load_or_ingest(bag, cfg, verbose=False)
        assert len(list(tmp_path.glob("*.npz"))) == 1
        r2 = cache_mod.load_or_ingest(bag, cfg, verbose=False)
        np.testing.assert_array_equal(r1.points, r2.points)
        np.testing.assert_array_equal(r1.initial_poses, r2.initial_poses)

    def test_cache_invalidated_by_config(self, tmp_path, monkeypatch):
        from nautilus_tpu.ingest import cache as cache_mod
        monkeypatch.setattr(cache_mod, "cache_dir", lambda: tmp_path)
        bag = tmp_path / "c.bag"
        write_synthetic_bag(bag, num_nodes=6, world_kind="room",
                            num_beams=180, seed=1)
        cfg = load_config_text(BASE_CFG)
        cache_mod.load_or_ingest(bag, cfg, verbose=False)
        cache_mod.load_or_ingest(bag, cfg.replace(pose_number=4.0),
                                 verbose=False)
        assert len(list(tmp_path.glob("*.npz"))) == 2


class TestConfigValidation:
    def test_missing_keys_listed(self):
        from nautilus_tpu.core.luaconf import (LuaConfigError,
                                               validate_config)
        cfg = load_config_text("pose_number=5")
        with pytest.raises(LuaConfigError) as e:
            validate_config(cfg)
        assert "outlier_threshold" in str(e.value)
        assert "lidar_topic" in str(e.value)

    def test_full_config_passes(self):
        from pathlib import Path
        from nautilus_tpu.core.luaconf import load_config, validate_config
        cfg = load_config(Path(__file__).parent.parent /
                          "config/gdc_2020_config.lua")
        validate_config(cfg)
