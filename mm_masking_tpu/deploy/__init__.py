"""Deployment artifacts: serialized, self-contained mask-inference programs.

The reference's deployment forks export the trained UNet to LibTorch and run
mask inference inside the C++ vtr3 pipeline (SURVEY.md §2.3 LibTorch row).
This package is the TPU-native equivalent: `jax.export` StableHLO artifacts
of the full raw-scan→weight-mask program with trained weights baked in.
"""
from mm_masking_tpu.deploy.export import (
    export_from_run_dir,
    export_localizer,
    export_mask_policy,
    load_localizer,
    load_mask_policy,
    read_artifact,
    write_artifact,
)

__all__ = [
    "export_from_run_dir",
    "export_localizer",
    "export_mask_policy",
    "load_localizer",
    "load_mask_policy",
    "read_artifact",
    "write_artifact",
]
