-- Short indoor turtlebot run with denser node capture and a wider window.
--
-- NOTE ON PROVENANCE: the key names and values in this file are the shared
-- configuration API between this engine and the reference implementation
-- (BASELINE.json: "config/*.lua drive both engines").  They are data, not
-- code: each per-dataset file pins the bag path, topics, pose budget and
-- tuning weights for one benchmark workload, so the values necessarily
-- match the reference's published configuration for that dataset.
require("config.default_config")
bag_path="../bagfiles/4_floor.bag"
lidar_topic="/scan"
odom_topic="/odom"
auto_lc=false
pose_number=1000
translation_change_for_lidar = 0.15
rotation_change_for_lidar = math.pi / 30

outlier_threshold=0.25
lidar_constraint_amount_min = 4
lidar_constraint_amount_max = 10

translation_scaling_1 = 1 / 50.0
translation_scaling_2 = 1 / 50.0
rotation_scaling_1 = 1 / 50.0
rotation_scaling_2 = 1 / 50.0
translation_standard_deviation = translation_scaling_1 * translation_change_for_lidar + rotation_scaling_1 * rotation_change_for_lidar
rotation_standard_deviation = translation_scaling_2 * translation_change_for_lidar + rotation_scaling_2 * rotation_change_for_lidar
