from mm_masking_tpu.ops.grid_sample import grid_sample_2d, grid_sample_points
from mm_masking_tpu.ops.radar import (
    POLAR_RESOLUTION,
    CART_RESOLUTION,
    CART_PIXEL_WIDTH,
    POLAR_SHAPE,
    load_radar,
    pol_2_cart,
    form_cart_range_angle_grid,
    form_polar_range_grid,
    radar_polar_to_cartesian,
    radar_cartesian_to_polar,
    point_to_cart_idx,
)
from mm_masking_tpu.ops.cfar import (
    cfar_mask,
    mean_peaks,
    extract_pc,
    hardshrink,
)
from mm_masking_tpu.ops.weights import (
    extract_weights,
    extract_bev_from_pts,
    WeightStats,
)
from mm_masking_tpu.ops.preprocessing import (
    knn_indices,
    estimate_normals,
    voxel_downsample,
)
from mm_masking_tpu.ops.detectors import detect, DETECTORS, doppler_shift, motion_undistort
from mm_masking_tpu.ops.descriptors import (
    orb_descriptors,
    basd_descriptors,
    match_descriptors,
)

__all__ = [
    "orb_descriptors",
    "basd_descriptors",
    "match_descriptors",
    "grid_sample_2d",
    "grid_sample_points",
    "POLAR_RESOLUTION",
    "CART_RESOLUTION",
    "CART_PIXEL_WIDTH",
    "POLAR_SHAPE",
    "load_radar",
    "pol_2_cart",
    "form_cart_range_angle_grid",
    "form_polar_range_grid",
    "radar_polar_to_cartesian",
    "radar_cartesian_to_polar",
    "point_to_cart_idx",
    "cfar_mask",
    "mean_peaks",
    "extract_pc",
    "hardshrink",
    "extract_weights",
    "extract_bev_from_pts",
    "WeightStats",
    "knn_indices",
    "estimate_normals",
    "voxel_downsample",
    "detect",
    "DETECTORS",
    "doppler_shift",
    "motion_undistort",
]
