"""ROS wire-format encoding for visualization messages (no ROS required).

Host-side equivalents of the reference's PointCloud2 construction
(InitPointcloud/PublishPointcloud/EigenPointcloudToRos,
src/input/pointcloud_helpers.cc:50-109): build the exact field layout and
packed byte payload, so the ROS bridge (viz/visualizer.py) — or any
recorder — can emit reference-identical messages.  Pure functions,
testable without rospy.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

POINT_STEP = 12  # x, y, z float32


def pointcloud2_fields() -> List[Dict]:
    """The x/y/z float32 field table (pointcloud_helpers.cc:52-65)."""
    return [dict(name=n, offset=4 * i, datatype=7, count=1)
            for i, n in enumerate(("x", "y", "z"))]


def encode_pointcloud2(points: np.ndarray, frame_id: str = "map") -> Dict:
    """Pack 2D points into a PointCloud2-shaped dict (z = 0).

    Returns the message fields as plain Python values; a ROS bridge copies
    them into a sensor_msgs/PointCloud2.
    """
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    xyz = np.zeros((len(pts), 3), dtype="<f4")
    xyz[:, :2] = pts
    return dict(
        frame_id=frame_id,
        height=1,
        width=len(pts),
        fields=pointcloud2_fields(),
        is_bigendian=False,
        point_step=POINT_STEP,
        row_step=POINT_STEP * len(pts),
        is_dense=True,
        data=xyz.tobytes(),
    )


def decode_pointcloud2(msg: Dict) -> np.ndarray:
    """Inverse of encode_pointcloud2 (for tests/round-trips)."""
    xyz = np.frombuffer(msg["data"], dtype="<f4").reshape(-1, 3)
    return xyz[:, :2].copy()
