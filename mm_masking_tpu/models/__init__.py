from mm_masking_tpu.models.unet import UNet, ConvBlock, upsample_bilinear_align_corners
from mm_masking_tpu.models.policy import LearnICPWeightPolicy, PolicyOutput

__all__ = [
    "UNet",
    "ConvBlock",
    "upsample_bilinear_align_corners",
    "LearnICPWeightPolicy",
    "PolicyOutput",
]
