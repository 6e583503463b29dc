-- GDC 2020 building map: differential odometry, HITL curation workload.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
dofile(debug.getinfo(1).source:match("@?(.*/)") .. '/default_config.lua')
bag_path="data/2020-03-09-19-02-17-GDC3-long.bag"
lidar_topic="/Cobot/Laser"
odom_topic="/Cobot/Odometry"
auto_lc=false
pose_number=1000
differential_odom=true
rotation_weight=1
translation_weight=2
max_lidar_range=8.5
