-- Outdoor Jackal campus run.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
require("config.default_config")
bag_path="../bags/2020-06-03-jackal-campus-outdoor-1.bag"
lidar_topic="/scan"
odom_topic="/jackal_velocity_controller/odom"
auto_lc=false
pose_number=1200
