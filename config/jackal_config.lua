-- Outdoor Jackal campus run.
require("config.default_config")
bag_path="../bags/2020-06-03-jackal-campus-outdoor-1.bag"
lidar_topic="/scan"
odom_topic="/jackal_velocity_controller/odom"
auto_lc=false
pose_number=1200
