"""CelebA-HQ attribute classifier: StyleGAN-discriminator-style D net.

ref: classifiers/attribute_net.py (WScale conv/linear, downscale blocks,
fixed_size inference path) and attribute_classifier.py (mean-pool to 256,
[-1,1] normalization, [logit, -logit] output).

The DiffPure checkpoints are loaded with fixed_size=True and use_mbstd=False
(ref attribute_classifier.py:55), so only the fromrgb_lod0 path and the
downscale pyramid run; the mbstd layer is still implemented for API parity.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

LRELU = lambda x: jnp.where(x >= 0, x, 0.2 * x)


class WScaleConv(nn.Module):
    """Conv (no bias) scaled by gain/sqrt(fan_in) + learned bias b
    (ref attribute_net.py:17-52)."""
    features: int
    kernel_size: int = 3
    padding: int = 0
    gain: float = float(np.sqrt(2))

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size ** 2
        k = self.kernel_size
        pad = [(self.padding, self.padding)] * 2
        h = nn.Conv(self.features, (k, k), padding=pad, use_bias=False,
                    name="conv")(x)
        b = self.param("b", nn.initializers.normal(1.0), (self.features,))
        return h * (self.gain / np.sqrt(fan_in)) + b.reshape(1, 1, 1, -1)


class WScaleLinear(nn.Module):
    """ref attribute_net.py:55-64."""
    features: int
    gain: float = float(np.sqrt(2))

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        h = nn.Dense(self.features, use_bias=False, name="linear")(x)
        b = self.param("b", nn.initializers.normal(1.0), (self.features,))
        return h * (self.gain / np.sqrt(fan_in)) + b


class FromRGB(nn.Module):
    """1x1 WScale conv + leaky relu (ref attribute_net.py:67-76)."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return LRELU(WScaleConv(self.features, kernel_size=1,
                                name="conv")(x))


def downscale2d(x: Array, factor: int = 2) -> Array:
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))


class DownscaleConvBlock(nn.Module):
    """conv -> act -> conv -> downscale -> act (order matters;
    ref attribute_net.py:88-110)."""
    conv0_features: int
    conv1_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = LRELU(WScaleConv(self.conv0_features, 3, padding=1,
                             name="conv0")(x))
        x = WScaleConv(self.conv1_features, 3, padding=1, name="conv1")(x)
        x = downscale2d(x)
        return LRELU(x)


def minibatch_std(x: Array, group_size: int = 4) -> Array:
    """ref attribute_net.py:113-130 (NHWC port)."""
    g = min(group_size, x.shape[0])
    N, H, W, C = x.shape
    y = x.reshape(g, -1, H, W, C)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(y * y, axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    y = jnp.tile(y, (g, H, W, 1))
    return jnp.concatenate([x, y], axis=-1)


class PredictionBlock(nn.Module):
    """ref attribute_net.py:133-153."""
    dense0_features: int
    dense1_features: int
    out_features: int
    use_mbstd: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_mbstd:
            x = minibatch_std(x)
        x = LRELU(WScaleConv(self.dense0_features, 3, padding=1,
                             name="conv")(x))
        # Flatten NCHW-style (channel-major) to match the torch dense layout.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = LRELU(WScaleLinear(self.dense1_features, name="dense0")(x))
        return WScaleLinear(self.out_features, gain=1.0, name="dense1")(x)


class AttributeD(nn.Module):
    """StyleGAN-style discriminator, fixed_size inference path
    (ref attribute_net.py:156-212 with fixed_size=True)."""
    resolution: int = 256
    num_channels: int = 3
    fmap_base: int = 8192
    fmap_decay: float = 1.0
    fmap_max: int = 512
    use_mbstd: bool = False

    def nf(self, stage: int) -> int:
        return min(int(self.fmap_base / (2.0 ** (stage * self.fmap_decay))),
                   self.fmap_max)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res_log2 = int(np.log2(self.resolution))
        assert 2 ** res_log2 == self.resolution and self.resolution >= 4
        h = FromRGB(self.nf(res_log2 - 1), name="fromrgb_lod0")(x)
        for res in range(res_log2, 2, -1):
            h = DownscaleConvBlock(self.nf(res - 1), self.nf(res - 2),
                                   name=f"block_{2 ** res}x{2 ** res}")(h)
        return PredictionBlock(self.nf(1), self.nf(0), 1,
                               use_mbstd=self.use_mbstd,
                               name="block_4x4")(h)


def mean_pool_to(images: Array, size: int = 256) -> Array:
    """Mean-pool larger inputs down to 256 (ref attribute_classifier.py:15-27)."""
    H = images.shape[1]
    if H > size:
        factor = H // size
        assert factor * size == H
        N, _, W, C = images.shape
        images = images.reshape(N, size, factor, W // factor, factor, C)
        images = images.mean(axis=(2, 4))
        return images
    assert images.shape[2] == size
    return images


def attribute_logits(model: AttributeD, params, ims01: Array) -> Array:
    """[0,1] images -> 2-class logits [logit, -logit]
    (ref attribute_classifier.py:58-65)."""
    x = (ims01 - 0.5) / 0.5
    x = mean_pool_to(x, 256)
    logit = model.apply(params, x)
    return jnp.concatenate([logit, -logit], axis=1)
