from mm_masking_tpu.dicp.icp import ICP, ICPConfig, icp, robust_weight, TARGET_PAD_VAL

__all__ = ["ICP", "ICPConfig", "icp", "robust_weight", "TARGET_PAD_VAL"]
