from mm_masking_tpu.dicp.icp import (
    ICP,
    ICPConfig,
    icp,
    icp_implicit,
    robust_weight,
    TARGET_PAD_VAL,
)
from mm_masking_tpu.dicp.ct_icp import CTICPConfig, ct_icp

__all__ = [
    "ICP",
    "ICPConfig",
    "icp",
    "icp_implicit",
    "robust_weight",
    "TARGET_PAD_VAL",
    "CTICPConfig",
    "ct_icp",
]
