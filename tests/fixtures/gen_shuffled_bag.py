"""Generator for shuffled_chunks.bag — a bag layout the in-repo writer
never produces.

rosbag files that have been reindexed or appended to can store chunks out
of time order; rosbag::View still iterates messages by record time
(reference main.cc:65-71).  This crafts a THREE-chunk bag at the record
level whose chunks are stored in the order [t=3.x], [t=1.x], [t=2.x], so
any reader that replays stream order interleaves odometry and lidar
wrongly.  Both in-repo readers must return the messages time-sorted.

Run as a script to (re)generate tests/fixtures/shuffled_chunks.bag.
"""

import struct
from pathlib import Path

import numpy as np

from nautilus_tpu.ingest import rosbag as rb


def _msg_record(conn: int, t: float, payload: bytes) -> bytes:
    sec = int(t)
    nsec = int(round((t - sec) * 1e9))
    return rb._record({b"op": bytes([rb.OP_MSG_DATA]),
                       b"conn": struct.pack("<I", conn),
                       b"time": struct.pack("<II", sec, nsec)}, payload)


def _conn_record(conn: int, topic: str, mtype: str) -> bytes:
    return rb._record(
        {b"op": bytes([rb.OP_CONNECTION]),
         b"conn": struct.pack("<I", conn),
         b"topic": topic.encode()},
        rb._build_header({b"topic": topic.encode(),
                          b"type": mtype.encode(),
                          b"md5sum": b"0" * 32,
                          b"message_definition": b""}))


def _scan(t: float) -> bytes:
    return rb.encode_laser_scan(rb.LaserScanMsg(
        header=rb.HeaderMsg(0, t, "laser"),
        angle_min=-np.pi, angle_max=np.pi,
        angle_increment=2 * np.pi / 8, time_increment=0.0, scan_time=0.1,
        range_min=0.02, range_max=30.0,
        ranges=np.full(8, t, np.float32),
        intensities=np.zeros(0, np.float32)))


def _odom(t: float) -> bytes:
    return rb.encode_odometry(rb.OdometryMsg(
        header=rb.HeaderMsg(0, t, "odom"), child_frame_id="base",
        position=np.array([t, -t, 0.0]),
        orientation=np.array([0.0, 0.0, 0.0, 1.0]),
        twist_linear=np.zeros(3), twist_angular=np.zeros(3)))


def _chunk(payload: bytes) -> bytes:
    return rb._record({b"op": bytes([rb.OP_CHUNK]),
                       b"compression": b"none",
                       b"size": struct.pack("<I", len(payload))}, payload)


def write_shuffled_bag(path) -> list:
    """Write the fixture; returns the expected time-sorted (topic, t) list."""
    def block(ts, with_conns=False):
        buf = bytearray()
        if with_conns:
            buf += _conn_record(0, "/odom", "nav_msgs/Odometry")
            buf += _conn_record(1, "/scan", "sensor_msgs/LaserScan")
        for t in ts:
            buf += _msg_record(0, t, _odom(t))
            buf += _msg_record(1, t + 0.04, _scan(t + 0.04))
        return bytes(buf)

    late = [3.0, 3.1, 3.2]
    early = [1.0, 1.1, 1.2]
    mid = [2.0, 2.1, 2.2]
    out = bytearray(rb.BAG_MAGIC)
    out += rb._record({b"op": bytes([rb.OP_BAG_HEADER]),
                       b"index_pos": struct.pack("<Q", 0),
                       b"conn_count": struct.pack("<I", 2),
                       b"chunk_count": struct.pack("<I", 3)}, b" " * 4096)
    # Chunks stored OUT of time order: late, early, mid.  Connections live
    # in the first stored chunk (stream order precedes every use).
    out += _chunk(block(late, with_conns=True))
    out += _chunk(block(early))
    out += _chunk(block(mid))
    Path(path).write_bytes(bytes(out))
    expected = []
    for t in sorted(early + mid + late):
        expected.append(("/odom", t))
        expected.append(("/scan", t + 0.04))
    return sorted(expected, key=lambda e: e[1])


if __name__ == "__main__":
    here = Path(__file__).resolve().parent
    write_shuffled_bag(here / "shuffled_chunks.bag")
    print("wrote", here / "shuffled_chunks.bag")
