"""numpy-facing wrappers over the native host ops."""
from __future__ import annotations

import ctypes

import numpy as np

from diffpure_tpu.ops.native.build import load_native


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def upfirdn2d_native(x: np.ndarray, kernel: np.ndarray, up: int = 1,
                     down: int = 1, pad=(0, 0)) -> np.ndarray:
    """Host upfirdn2d, NHWC float32. Same semantics as the device op
    (diffpure_tpu/ops/upfirdn2d.py)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native ops not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    kernel = np.ascontiguousarray(kernel, dtype=np.float32)
    N, H, W, C = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    oh = (H * up + pad0 + pad1 - kh) // down + 1
    ow = (W * up + pad0 + pad1 - kw) // down + 1
    out = np.empty((N, oh, ow, C), dtype=np.float32)
    lib.upfirdn2d_f32(_ptr(x), _ptr(kernel), _ptr(out),
                      N, H, W, C, kh, kw, up, down, pad0, pad1)
    return out


def fused_leaky_relu_native(x: np.ndarray, bias: np.ndarray,
                            negative_slope: float = 0.2,
                            scale: float = 2.0 ** 0.5) -> np.ndarray:
    """Host fused bias+leaky-relu, channel-last float32."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native ops not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    bias = np.ascontiguousarray(bias, dtype=np.float32)
    C = x.shape[-1]
    n_rows = x.size // C
    out = np.empty_like(x)
    lib.fused_bias_act_f32(_ptr(x), _ptr(bias), _ptr(out), n_rows, C,
                           negative_slope, scale)
    return out
