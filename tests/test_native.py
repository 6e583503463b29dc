"""Native C++ bag reader: parity with the Python parser + speed sanity."""

import time

import numpy as np
import pytest

from nautilus_tpu.ingest import rosbag as rb
from nautilus_tpu.ingest.native import available, read_bag_native
from nautilus_tpu.ingest.synthetic import write_synthetic_bag

pytestmark = pytest.mark.skipif(not available(),
                                reason="native bag reader unavailable")


@pytest.fixture(scope="module")
def bag(tmp_path_factory):
    path = tmp_path_factory.mktemp("bags") / "native.bag"
    write_synthetic_bag(path, num_nodes=10, world_kind="room", num_beams=360,
                        seed=5)
    return path


def test_parity_with_python_parser(bag):
    py_msgs = list(rb.read_bag(bag, topics=["/scan", "/odom"]))
    nat_msgs = read_bag_native(bag, "/scan", "/odom")
    assert len(py_msgs) == len(nat_msgs)
    for pm, nm in zip(py_msgs, nat_msgs):
        assert pm.topic == nm.topic
        assert type(pm.msg) is type(nm.msg)
        if isinstance(pm.msg, rb.LaserScanMsg):
            np.testing.assert_array_equal(pm.msg.ranges, nm.msg.ranges)
            assert pm.msg.angle_min == pytest.approx(nm.msg.angle_min)
            assert pm.msg.header.stamp == pytest.approx(nm.msg.header.stamp,
                                                        abs=1e-6)
        else:
            np.testing.assert_allclose(pm.msg.position, nm.msg.position)
            np.testing.assert_allclose(pm.msg.orientation, nm.msg.orientation)


def test_differential_messages(tmp_path):
    path = tmp_path / "diff.bag"
    write_synthetic_bag(path, num_nodes=6, world_kind="room", num_beams=180,
                        differential=True, odom_topic="/cobot")
    nat = read_bag_native(path, "/scan", "/cobot")
    py = list(rb.read_bag(path, topics=["/scan", "/cobot"]))
    cob_n = [m for m in nat if isinstance(m.msg, rb.CobotOdometryMsg)]
    cob_p = [m for m in py if isinstance(m.msg, rb.CobotOdometryMsg)]
    assert len(cob_n) == len(cob_p) > 0
    for a, b in zip(cob_p, cob_n):
        assert a.msg.dr == pytest.approx(b.msg.dr, abs=1e-6)
        assert a.msg.dx == pytest.approx(b.msg.dx, abs=1e-6)


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.bag"
    p.write_bytes(b"garbage")
    with pytest.raises(ValueError):
        read_bag_native(p, "/scan", "/odom")


def test_native_ingest_builds_same_problem(bag):
    from nautilus_tpu.core.luaconf import load_config_text
    from nautilus_tpu.ingest.builder import process_bag_file
    cfg = load_config_text("""
pose_number=10
differential_odom=false
max_lidar_range=30
rotation_change_for_lidar=math.pi / 18
translation_change_for_lidar=0.25
lidar_topic="/scan"
odom_topic="/odom"
""")
    raw_native = process_bag_file(bag, cfg, verbose=False)
    # Force the Python path by monkeypatching availability.
    import nautilus_tpu.ingest.native as native_mod
    saved, native_mod._lib, native_mod._build_failed = native_mod._lib, None, True
    try:
        raw_py = process_bag_file(bag, cfg, verbose=False)
    finally:
        native_mod._lib, native_mod._build_failed = saved, False
    np.testing.assert_array_equal(raw_native.points_mask, raw_py.points_mask)
    np.testing.assert_allclose(raw_native.points, raw_py.points, atol=1e-6)
    np.testing.assert_allclose(raw_native.initial_poses, raw_py.initial_poses,
                               atol=1e-9)
