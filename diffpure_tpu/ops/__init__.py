from diffpure_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
    setup_fir_kernel,
)
from diffpure_tpu.ops.fused_act import fused_leaky_relu
from diffpure_tpu.ops.groupnorm import group_norm, group_norm_silu
from diffpure_tpu.ops.attention import spatial_attention, qkv_attention

__all__ = [
    "upfirdn2d", "upsample_2d", "downsample_2d", "upsample_conv_2d",
    "conv_downsample_2d", "naive_upsample_2d", "naive_downsample_2d",
    "setup_fir_kernel",
    "fused_leaky_relu",
    "group_norm", "group_norm_silu",
    "spatial_attention", "qkv_attention",
]
