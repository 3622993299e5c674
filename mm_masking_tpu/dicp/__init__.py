from mm_masking_tpu.dicp.icp import (
    ICP,
    ICPConfig,
    icp,
    icp_implicit,
    robust_weight,
    TARGET_PAD_VAL,
)

__all__ = ["ICP", "ICPConfig", "icp", "icp_implicit", "robust_weight", "TARGET_PAD_VAL"]
