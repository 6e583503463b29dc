-- Small synthetic 2D lidar run: odometry + lidar factors only.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
dofile(debug.getinfo(1).source:match("@?(.*/)") .. '/default_config.lua')
bag_path="data/synthetic-small.bag"
lidar_topic="/velodyne_2dscan_high_beams"
odom_topic="/odometry/filtered"
auto_lc=false
pose_number=30
accuracy_change_stop_threshold = 0.0001
translation_weight=1
rotation_weight=1
