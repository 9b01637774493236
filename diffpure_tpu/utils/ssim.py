"""SSIM metric.

JAX rebuild of the vendored mister_ed pytorch_ssim (ref
stadv_eot/recoloradv/mister_ed/utils/pytorch_ssim/__init__.py, 88 LoC):
Gaussian-window structural similarity, used by mister_ed's perceptual
checks; general-purpose image metric here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: Array, img2: Array, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True,
         data_range: float = 1.0) -> Array:
    """SSIM over NHWC images in [0, data_range]."""
    C = img1.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size, sigma))
    w = w.reshape(window_size, window_size, 1, 1)
    w = jnp.tile(w, (1, 1, 1, C))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
