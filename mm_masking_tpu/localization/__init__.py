from mm_masking_tpu.localization.pipeline import (
    LocalizationConfig,
    localize_cloud_sequence,
    localize_clouds,
    localize_frame,
    localize_sequence,
    localize_sequence_to_traj,
    project_map,
)

__all__ = [
    "LocalizationConfig",
    "localize_cloud_sequence",
    "localize_clouds",
    "localize_frame",
    "localize_sequence",
    "localize_sequence_to_traj",
    "project_map",
]
