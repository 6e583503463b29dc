-- Multi-robot simulation run (robot1's streams).
require("config.default_config")
bag_path="../bagfiles/2020-08-24-14-14-49.bag"
lidar_topic="/robot1/scan"
odom_topic="/robot1/odom"
auto_lc=false
pose_number=450
