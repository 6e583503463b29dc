-- Campus-scale Jackal run.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
dofile(debug.getinfo(1).source:match("@?(.*/)") .. '/default_config.lua')
bag_path="data/jackal-2020.bag"
lidar_topic="/scan"
odom_topic="/jackal_velocity_controller/odom"
auto_lc=false
pose_number=1200
translation_weight=1
rotation_weight=1
hitl_line_width=.10
