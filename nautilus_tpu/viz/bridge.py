"""Live ROS command bridge — the reference's interactive input surface.

The reference subscribes to three topics after the initial solve and spins
forever (src/main.cc:204-213): the configured ``hitl_lc_topic`` (default
/hitl_slam_input, HitlSlamInputMsg), /write_output (WriteMsg) and
/vectorize_output (WriteMsg), routed to Solver::HitlCallback /
WriteCallback / Vectorize.  This module is the rospy equivalent: an rviz
operator with the reference's HITL tool can drive this engine unchanged.

Design: subscriptions use ``rospy.AnyMsg`` and the raw-buffer codecs in
viz/ros_encode.py, so no generated message classes (and no catkin build of
the nautilus msg package) are needed; ``dispatch()`` is the transport-free
core, letting tests feed wire-encoded messages through the exact callback
path without a ROS master.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from nautilus_tpu.viz import ros_encode


class RosInputBridge:
    """Routes command-topic messages to a Solver (main.cc:204-209)."""

    def __init__(self, solver, config, verbose: bool = True,
                 on_write: Optional[Callable] = None,
                 on_vectorize: Optional[Callable] = None):
        self.solver = solver
        self.config = config
        self.verbose = verbose
        self._on_write = on_write
        self._on_vectorize = on_vectorize
        self.hitl_topic = str(config.get("hitl_lc_topic",
                                         "/hitl_slam_input"))
        self.handled = 0
        self._subs = []

    # -- transport-free core -------------------------------------------------

    def topics(self) -> Dict[str, Callable[[bytes], None]]:
        return {
            self.hitl_topic: self.handle_hitl,
            "/write_output": self.handle_write,
            "/vectorize_output": self.handle_vectorize,
        }

    def dispatch(self, topic: str, buff: bytes) -> None:
        """Deliver one wire-encoded message body to its handler."""
        handler = self.topics().get(topic)
        if handler is None:
            raise KeyError(f"bridge does not subscribe to {topic}")
        handler(buff)

    def handle_hitl(self, buff: bytes) -> None:
        from nautilus_tpu.solve.hitl import HitlSlamInputMsg, hitl_callback
        a0, a1, b0, b1 = ros_encode.decode_hitl_input(buff)
        msg = HitlSlamInputMsg.from_points(a0, a1, b0, b1)
        hitl_callback(self.solver, msg, verbose=self.verbose)
        self.handled += 1

    def handle_write(self, buff: bytes) -> None:
        ros_encode.decode_write_msg(buff)   # validate; value unused, as in
        # the reference (WriteCallback ignores msg->write, solver.cc:565).
        if self._on_write is not None:
            self._on_write()
        else:
            from nautilus_tpu.io.poses import write_poses
            write_poses(self.solver.state, self.config.pose_output_file)
            if self.verbose:
                print(f"Wrote poses to {self.config.pose_output_file}")
        self.handled += 1

    def handle_vectorize(self, buff: bytes) -> None:
        ros_encode.decode_write_msg(buff)
        if self._on_vectorize is not None:
            self._on_vectorize()
        else:
            from nautilus_tpu.io.vectorize import vectorize
            lines = vectorize(self.solver.state, self.config.map_output_file,
                              verbose=self.verbose)
            vis = getattr(self.solver, "visualizer", None)
            if vis is not None and hasattr(vis, "publish_debug_lines"):
                vis.publish_debug_lines(lines)
        self.handled += 1

    # -- rospy transport -----------------------------------------------------

    def start(self, node_name: str = "nautilus_tpu") -> None:
        """Subscribe via rospy (raises ImportError when ROS is absent)."""
        import rospy
        if rospy.core.get_node_uri() is None:
            rospy.init_node(node_name, anonymous=True,
                            disable_signals=True)
        for topic, handler in self.topics().items():
            self._subs.append(rospy.Subscriber(
                topic, rospy.AnyMsg,
                (lambda h: lambda m: h(m._buff))(handler),
                queue_size=10))
        if self.verbose:
            print("Waiting for Loop Closure input")

    def spin(self) -> None:
        import rospy
        rospy.spin()

    def stop(self) -> None:
        for s in self._subs:
            s.unregister()
        self._subs.clear()
