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


@pytest.mark.parametrize("compression", ["bz2", "lz4"])
def test_compressed_chunk_parity(tmp_path, compression):
    from nautilus_tpu.ingest import lz4f
    if compression == "lz4" and not lz4f.available():
        pytest.skip("liblz4 not present")
    path = tmp_path / f"c_{compression}.bag"
    scan = rb.LaserScanMsg(
        header=rb.HeaderMsg(0, 2.0, "laser"),
        angle_min=-np.pi, angle_max=np.pi, angle_increment=2 * np.pi / 360,
        time_increment=0.0, scan_time=0.1, range_min=0.02, range_max=30.0,
        ranges=np.linspace(1, 9, 360).astype(np.float32),
        intensities=np.zeros(0, np.float32))
    odom = rb.OdometryMsg(
        header=rb.HeaderMsg(0, 2.1, "odom"), child_frame_id="base",
        position=np.array([1.0, 2.0, 0.0]),
        orientation=np.array([0.0, 0.0, 0.0, 1.0]),
        twist_linear=np.zeros(3), twist_angular=np.zeros(3))
    rb.write_bag(path, [("/scan", 2.0, scan), ("/odom", 2.1, odom)],
                 compression=compression)
    nat = read_bag_native(path, "/scan", "/odom")
    py = list(rb.read_bag(path, topics=["/scan", "/odom"]))
    assert len(nat) == len(py) == 2
    np.testing.assert_array_equal(nat[0].msg.ranges, py[0].msg.ranges)
    np.testing.assert_allclose(nat[1].msg.position, py[1].msg.position)


def test_shuffled_chunks_time_order(tmp_path):
    """Chunks stored out of time order (reindexed/appended-bag layout —
    NOT producible by the in-repo writer): both readers must iterate in
    record-time order, matching rosbag::View (reference main.cc:65-71)."""
    import sys
    from pathlib import Path
    fixtures = Path(__file__).resolve().parent / "fixtures"
    sys.path.insert(0, str(fixtures))
    try:
        from gen_shuffled_bag import write_shuffled_bag
    finally:
        sys.path.pop(0)
    path = tmp_path / "shuffled.bag"
    expected = write_shuffled_bag(path)
    # The freshly-generated bag must equal the checked-in fixture (the
    # committed artifact is what CI actually parses below).
    committed = fixtures / "shuffled_chunks.bag"
    assert committed.read_bytes() == path.read_bytes()

    for msgs in (list(rb.read_bag(committed, topics=["/scan", "/odom"])),
                 read_bag_native(committed, "/scan", "/odom")):
        got = [(m.topic, round(m.time, 6)) for m in msgs]
        assert got == [(t, round(tt, 6)) for t, tt in expected]
        times = [m.time for m in msgs]
        assert times == sorted(times)
        # Message contents ride along correctly after the sort.
        for m in msgs:
            if isinstance(m.msg, rb.OdometryMsg):
                assert m.msg.position[0] == pytest.approx(m.time, abs=1e-6)
            else:
                np.testing.assert_allclose(m.msg.ranges, m.time, atol=1e-6)


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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_bag_parity(tmp_path, seed):
    """Property test: on randomized bags — shuffled record times, mixed
    wanted/unwanted topics, random scan widths, every compression — the
    native reader and the Python parser return byte-identical message
    streams in the same order."""
    rng = np.random.default_rng(seed)
    msgs = []
    t0 = 1e9
    for k in range(rng.integers(20, 60)):
        t = t0 + float(rng.uniform(0, 30))      # deliberately unsorted
        kind = rng.integers(0, 4)
        if kind == 0:
            n = int(rng.integers(3, 400))
            msgs.append(("/scan", t, rb.LaserScanMsg(
                rb.HeaderMsg(k, t, "laser"),
                angle_min=float(rng.uniform(-np.pi, 0)),
                angle_max=float(rng.uniform(0, np.pi)),
                angle_increment=float(rng.uniform(0.001, 0.1)),
                time_increment=0.0, scan_time=0.05,
                range_min=0.02, range_max=30.0,
                ranges=rng.uniform(0.1, 30.0, n).astype(np.float32),
                intensities=np.zeros(0, np.float32))))
        elif kind == 1:
            q = rng.normal(size=4); q /= np.linalg.norm(q)
            msgs.append(("/odom", t, rb.OdometryMsg(
                rb.HeaderMsg(k, t, "odom"), "base",
                position=rng.normal(size=3),
                orientation=q,
                twist_linear=rng.normal(size=3),
                twist_angular=rng.normal(size=3))))
        elif kind == 2:
            msgs.append(("/other_odom", t, rb.CobotOdometryMsg(
                rb.HeaderMsg(k, t, "odom"),
                dr=float(rng.normal()), dx=float(rng.normal()),
                dy=float(rng.normal()))))
        else:   # unwanted topic the readers must skip consistently
            msgs.append(("/junk_scan", t, rb.LaserScanMsg(
                rb.HeaderMsg(k, t, "laser"), -1.0, 1.0, 0.01, 0.0, 0.05,
                0.02, 30.0, rng.uniform(0.1, 30.0, 10).astype(np.float32),
                np.zeros(0, np.float32))))
    for compression in ("none", "bz2", "lz4"):
        path = tmp_path / f"fuzz_{seed}_{compression}.bag"
        rb.write_bag(path, msgs, compression=compression)
        py_msgs = list(rb.read_bag(path, topics=["/scan", "/odom"]))
        nat_msgs = read_bag_native(path, "/scan", "/odom")
        assert nat_msgs is not None
        assert len(py_msgs) == len(nat_msgs)
        # Streams must be time-sorted and element-wise identical.
        times = [m.time for m in py_msgs]
        assert times == sorted(times)
        for pm, nm in zip(py_msgs, nat_msgs):
            assert pm.topic == nm.topic
            assert pm.time == pytest.approx(nm.time, abs=1e-6)
            assert type(pm.msg) is type(nm.msg)
            if isinstance(pm.msg, rb.LaserScanMsg):
                np.testing.assert_array_equal(pm.msg.ranges, nm.msg.ranges)
                assert pm.msg.angle_increment == pytest.approx(
                    nm.msg.angle_increment)
            else:
                np.testing.assert_allclose(pm.msg.position, nm.msg.position)


def test_truncated_scan_record_errors_not_crashes(tmp_path):
    """A LaserScan record whose ranges-count field exceeds the record is a
    bounds-checked parse error (native reader Reader::need), never an
    out-of-bounds read."""
    import struct
    path = tmp_path / "trunc.bag"
    n_ranges = 7
    scan = rb.LaserScanMsg(
        header=rb.HeaderMsg(0, 2.0, "laser"),
        angle_min=-np.pi, angle_max=np.pi, angle_increment=0.1,
        time_increment=0.0, scan_time=0.1, range_min=0.02, range_max=30.0,
        ranges=np.arange(1, n_ranges + 1, dtype=np.float32),
        intensities=np.zeros(0, np.float32))
    rb.write_bag(path, [("/scan", 2.0, scan)], compression="none")
    raw = path.read_bytes()
    # The ranges array is serialized as u32 count + floats; patch the
    # count to a huge value so the record claims more data than exists.
    needle = struct.pack("<I", n_ranges) + struct.pack("<f", 1.0)
    idx = raw.find(needle)
    assert idx >= 0
    patched = (raw[:idx] + struct.pack("<I", 0x7FFFFFF0)
               + raw[idx + 4:])
    path.write_bytes(patched)
    with pytest.raises(ValueError, match="truncated LaserScan"):
        read_bag_native(path, "/scan", "/odom")
