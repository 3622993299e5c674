from mm_masking_tpu.ops.pallas.nn_assoc import (
    nn_argmin,
    nn_argmin_blocked,
    nn_argmin_pallas,
)

__all__ = ["nn_argmin", "nn_argmin_blocked", "nn_argmin_pallas"]
