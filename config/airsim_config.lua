-- AirSim simulated car run: tight outlier threshold, heavy odometry trust.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
require("config.default_config")
bag_path="data/airsim-lidar-scan.bag"
lidar_topic="/scan"
odom_topic="/airsim_node/PhysXCar/odom"
auto_lc=false
pose_number=800
differential_odom=false
rotation_weight=2
translation_weight=10
lc_debug_output_dir="auto_lc_airsim"
outlier_threshold=0.05
stopping_accuracy=0.025
