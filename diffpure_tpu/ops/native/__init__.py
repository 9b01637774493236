from diffpure_tpu.ops.native.build import load_native, native_available
from diffpure_tpu.ops.native.wrappers import (
    upfirdn2d_native,
    fused_leaky_relu_native,
)

__all__ = ["load_native", "native_available", "upfirdn2d_native",
           "fused_leaky_relu_native"]
