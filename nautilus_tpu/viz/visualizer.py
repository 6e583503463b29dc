"""Visualization backends for solver progress.

The reference publishes 7 rviz topics every LM iteration
(/nautilus/{all_points, all_poses, edge_points, planar_points,
correspondences, auto_lc_scans, covariances} — reference
src/visualization/solver_vis_ros.cc:114-127, redrawn from a
ceres::IterationCallback, solver_vis.h:18-22).  Per-iteration host
callbacks would serialize the TPU loop, so this engine snapshots at window
granularity (documented deviation; the data content matches the topics):

- ``SolverVisualizer``: abstract interface (mirrors solver_vis.h:12-43).
- ``SnapshotVisualizer``: records pose/cloud snapshots in memory and
  optionally to npz files — the headless "topic" stream.
- ``MatplotlibVisualizer``: renders the transformed map to PNG per draw
  (replaces the CImg debug rasterizer, cimg_debug.h:15-114).
- ``RosBridgeVisualizer``: republishes through rospy when available (kept
  off the hot path; import-gated so the library never requires ROS).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import numpy as np

from nautilus_tpu.core import geometry as geo


def transformed_clouds(state, subset: str = "all") -> np.ndarray:
    """All clouds in world frame at the current solution, concatenated."""
    problem = state.problem
    if subset == "all":
        pts = np.asarray(problem.points, np.float64)
        mask = np.asarray(problem.points_mask)
    elif subset == "planar":
        pts = np.asarray(problem.planar_points, np.float64)
        mask = np.asarray(problem.planar_mask)
    elif subset == "edge":
        pts = np.asarray(problem.edge_points, np.float64)
        mask = np.asarray(problem.edge_mask)
    else:
        raise ValueError(subset)
    out = []
    for i in range(state.num_nodes):
        p = pts[i][mask[i]]
        th = state.solution[i, 2]
        c, s = np.cos(th), np.sin(th)
        out.append(p @ np.array([[c, s], [-s, c]]) + state.solution[i, :2])
    return np.concatenate(out, axis=0) if out else np.zeros((0, 2))


class SolverVisualizer:
    """Abstract visualizer (reference solver_vis.h:12-43)."""

    def draw_solution(self, state, window: Optional[int] = None) -> None:
        pass

    def draw_correspondence(self, correspondences) -> None:
        pass

    def draw_scans(self, state, scan_indices: List[int]) -> None:
        pass

    def draw_covariances(self, covariances) -> None:
        pass


@dataclasses.dataclass
class Snapshot:
    window: Optional[int]
    poses: np.ndarray
    all_points: Optional[np.ndarray] = None
    planar_points: Optional[np.ndarray] = None
    edge_points: Optional[np.ndarray] = None


class SnapshotVisualizer(SolverVisualizer):
    """Records per-draw snapshots; optionally persists them as npz."""

    def __init__(self, output_dir=None, record_clouds: bool = True):
        self.output_dir = Path(output_dir) if output_dir else None
        self.record_clouds = record_clouds
        self.snapshots: List[Snapshot] = []
        self.lc_scans: List[List[int]] = []
        self.covariances: list = []
        self.correspondences: list = []
        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)

    def draw_correspondence(self, correspondences) -> None:
        """Record match endpoints (the /nautilus/correspondences line-list
        content, solver_vis_ros.cc:140-164): masked (source, target) point
        pairs with their node indices, in sensor frames."""
        mask = np.asarray(correspondences.mask)
        if mask.size == 0:
            return
        q, s = np.nonzero(mask)
        self.correspondences.append(dict(
            src_node=np.asarray(correspondences.src)[q],
            tgt_node=np.asarray(correspondences.tgt)[q],
            src_pts=np.asarray(correspondences.src_pts)[q, s],
            tgt_pts=np.asarray(correspondences.tgt_pts)[q, s]))

    def draw_solution(self, state, window: Optional[int] = None) -> None:
        snap = Snapshot(window=window, poses=state.solution.copy())
        if self.record_clouds:
            snap.all_points = transformed_clouds(state, "all")
            snap.planar_points = transformed_clouds(state, "planar")
            snap.edge_points = transformed_clouds(state, "edge")
        self.snapshots.append(snap)
        if self.output_dir:
            idx = len(self.snapshots) - 1
            np.savez_compressed(
                self.output_dir / f"snapshot_{idx:04d}.npz",
                window=-1 if window is None else window,
                poses=snap.poses,
                **{k: v for k, v in (("all_points", snap.all_points),
                                     ("planar_points", snap.planar_points),
                                     ("edge_points", snap.edge_points))
                   if v is not None})

    def draw_scans(self, state, scan_indices: List[int]) -> None:
        self.lc_scans.append(list(scan_indices))

    def draw_covariances(self, covariances) -> None:
        self.covariances.append(covariances)


class MatplotlibVisualizer(SolverVisualizer):
    """Render the current map to PNG on each draw (off the hot path)."""

    def __init__(self, output_dir, dpi: int = 120):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.dpi = dpi
        self.count = 0

    def draw_solution(self, state, window: Optional[int] = None) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        cloud = transformed_clouds(state, "all")
        fig, ax = plt.subplots(figsize=(8, 8))
        if len(cloud):
            ax.plot(cloud[:, 0], cloud[:, 1], ".", ms=0.5, color="#333333")
        ax.plot(state.solution[:, 0], state.solution[:, 1], "-", lw=0.8,
                color="tab:red")
        ax.set_aspect("equal")
        tag = "init" if window is None else f"w{window}"
        ax.set_title(f"nautilus_tpu map ({tag})")
        fig.savefig(self.output_dir / f"map_{self.count:04d}_{tag}.png",
                    dpi=self.dpi, bbox_inches="tight")
        plt.close(fig)
        self.count += 1


class RosBridgeVisualizer(SolverVisualizer):
    """Publish the reference's topics via rospy if ROS is present."""

    def __init__(self, topic_prefix: str = "/nautilus"):
        self.topic_prefix = topic_prefix
        self._pubs = {}
        try:
            import rospy
            from geometry_msgs.msg import PoseArray
            from sensor_msgs.msg import PointCloud2
            self._available = True
            # Publishers are created once: per-call registration would be
            # garbage-collected before subscriber handshakes complete.
            self._pubs["all_poses"] = rospy.Publisher(
                f"{topic_prefix}/all_poses", PoseArray, queue_size=1,
                latch=True)
            for topic in ("all_points", "planar_points", "edge_points"):
                self._pubs[topic] = rospy.Publisher(
                    f"{topic_prefix}/{topic}", PointCloud2, queue_size=1,
                    latch=True)
        except ImportError:
            self._available = False

    @property
    def available(self) -> bool:
        return self._available

    def draw_solution(self, state, window: Optional[int] = None) -> None:
        if not self._available:
            return
        # Deliberately minimal: users running inside a ROS environment get
        # the same topic names; the heavy lifting stays host-side.
        from geometry_msgs.msg import PoseArray, Pose
        from sensor_msgs.msg import PointCloud2, PointField
        from nautilus_tpu.viz.ros_encode import encode_pointcloud2
        msg = PoseArray()
        for pose in state.solution:
            p = Pose()
            p.position.x, p.position.y = float(pose[0]), float(pose[1])
            p.orientation.z = float(np.sin(pose[2] / 2))
            p.orientation.w = float(np.cos(pose[2] / 2))
            msg.poses.append(p)
        self._pubs["all_poses"].publish(msg)
        # Cloud topics with the reference's field layout
        # (solver_vis_ros.cc:114-127).
        for subset, topic in (("all", "all_points"),
                              ("planar", "planar_points"),
                              ("edge", "edge_points")):
            enc = encode_pointcloud2(transformed_clouds(state, subset))
            pc = PointCloud2()
            pc.header.frame_id = enc["frame_id"]
            pc.height = enc["height"]
            pc.width = enc["width"]
            pc.fields = [PointField(name=f["name"], offset=f["offset"],
                                    datatype=f["datatype"], count=f["count"])
                         for f in enc["fields"]]
            pc.is_bigendian = enc["is_bigendian"]
            pc.point_step = enc["point_step"]
            pc.row_step = enc["row_step"]
            pc.is_dense = enc["is_dense"]
            pc.data = enc["data"]
            self._pubs[topic].publish(pc)
