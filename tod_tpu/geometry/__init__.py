from tod_tpu.geometry.fusion import (  # noqa: F401
    ball_centroids,
    birdseye_project,
    connection_weights,
    depth_correction_factors,
    fuse_scene,
    occupancy_map,
    robot_occupancy,
)
