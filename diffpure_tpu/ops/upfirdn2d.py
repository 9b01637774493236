"""upfirdn2d and StyleGAN2-style FIR resampling, TPU-native.

The reference implements upfirdn2d as a hand-written CUDA kernel
(ref: score_sde/op/upfirdn2d_kernel.cu:1-368) with a pure-torch fallback
(ref: score_sde/op/upfirdn2d.py:167-208) that pins the semantics:

    1. zero-insert upsample by `up` (zeros AFTER each sample),
    2. pad (pad0 before, pad1 after) on both spatial dims,
    3. 2D convolution with the *flipped* FIR kernel,
    4. stride-`down` subsample.

On TPU all four fuse into ONE XLA `conv_general_dilated`: `lhs_dilation`
performs the zero-insert, `padding=(pad0, pad1 + up - 1)` accounts for the
reference's trailing zeros after the last sample, the pre-flipped kernel turns
XLA's correlation into convolution, and `window_strides` performs the
downsample. XLA lowers this to an MXU-tiled conv; there is no gather/scatter
and no extra HBM round-trip, so a separate Pallas kernel buys nothing here —
this *is* the fused kernel.

Layout: NHWC (TPU-native). The resampling wrappers (`upsample_2d`, ...,
`conv_downsample_2d`) mirror score_sde/models/up_or_down_sampling.py:80-265.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
    """Normalize a (possibly separable) FIR kernel to sum 1.

    ref: up_or_down_sampling.py:189-197 (_setup_kernel).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upfirdn2d(x: Array, kernel: Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> Array:
    """Upsample, FIR-filter, downsample in one fused conv.

    Args:
      x: (N, H, W, C).
      kernel: (kh, kw) FIR filter (true convolution: kernel is flipped).
      up / down: integer resampling factors.
      pad: (pad0, pad1) applied to both spatial dims.

    Output spatial size: (H*up + pad0 + pad1 - kh) // down + 1.
    """
    C = x.shape[-1]
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    kh, kw = kernel.shape
    # Flip: the reference convolves (upfirdn2d.py:188-189); XLA correlates.
    w = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
    w = jnp.tile(w, (1, 1, 1, C))
    pad0, pad1 = pad
    return lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample_2d(x: Array, k: Optional[Sequence[float]] = None, factor: int = 2,
                gain: float = 1.0) -> Array:
    """FIR upsample by `factor` (ref up_or_down_sampling.py:203-232)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * (gain * (factor ** 2))
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k: Optional[Sequence[float]] = None,
                  factor: int = 2, gain: float = 1.0) -> Array:
    """FIR downsample by `factor` (ref up_or_down_sampling.py:235-265)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor,
                     pad=((p + 1) // 2, p // 2))


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbor upsample (ref up_or_down_sampling.py:67-71), NHWC."""
    N, H, W, C = x.shape
    x = x.reshape(N, H, 1, W, 1, C)
    x = jnp.broadcast_to(x, (N, H, factor, W, factor, C))
    return x.reshape(N, H * factor, W * factor, C)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
    """Mean-pool downsample (ref up_or_down_sampling.py:74-77), NHWC."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // factor, factor, W // factor, factor, C)
    return jnp.mean(x, axis=(2, 4))


def upsample_conv_2d(x: Array, w: Array, k: Optional[Sequence[float]] = None,
                     factor: int = 2, gain: float = 1.0) -> Array:
    """Fused upsample + conv (ref up_or_down_sampling.py:80-149).

    `w` is HWIO (kh, kw, inC, outC). Equivalent to the reference's
    conv_transpose2d-then-upfirdn: the transpose conv is expressed as a
    zero-dilated correlation with the original (unflipped) weight — the
    reference's double spatial flip cancels — followed by the FIR pass.
    """
    assert w.ndim == 4
    kh, kw, in_c, out_c = w.shape
    assert kh == kw
    assert x.shape[-1] == in_c, "grouped fused upsample not needed by NCSN++"
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * (gain * (factor ** 2))
    p = (k.shape[0] - factor) - (kw - 1)

    # conv_transpose2d(x, ., stride=f, padding=0) == dilate-by-f + full-pad
    # correlation with the original HWIO weight.
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(x, jnp.asarray(k),
                     pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: Array, w: Array, k: Optional[Sequence[float]] = None,
                       factor: int = 2, gain: float = 1.0) -> Array:
    """Fused conv + downsample (ref up_or_down_sampling.py:152-186).

    `w` is HWIO (kh, kw, inC, outC).
    """
    kh, kw, in_c, out_c = w.shape
    assert kh == kw
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * gain
    p = (k.shape[0] - factor) + (kw - 1)
    x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
