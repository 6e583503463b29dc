-- Multi-robot simulation run (robot1's streams).
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
require("config.default_config")
bag_path="../bagfiles/2020-08-24-14-14-49.bag"
lidar_topic="/robot1/scan"
odom_topic="/robot1/odom"
auto_lc=false
pose_number=450
