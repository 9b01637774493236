"""NCSNv1/v2 legacy building blocks (NHWC flax).

JAX rebuild of the RefineNet machinery in score_sde/models/layers.py:133-500:
CRP/RCU/MSF/Refine blocks (+ conditional variants) and the pre-activation
ResidualBlock with dilation / ConvMeanPool downsampling.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

elu = nn.elu


def ncsn_conv3x3(features: int, stride: int = 1, bias: bool = True,
                 dilation: int = 1, name: Optional[str] = None) -> nn.Conv:
    """ref layers.py:109-116 (plain torch init)."""
    pad = dilation
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation), use_bias=bias,
                   name=name)


def ncsn_conv1x1(features: int, stride: int = 1, bias: bool = True,
                 name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding="VALID", use_bias=bias, name=name)


def _pool5(x: Array, maxpool: bool) -> Array:
    """5x5 stride-1 pooling, padding 2 (ref CRPBlock pool)."""
    if maxpool:
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)),
                    constant_values=-jnp.inf)
        return nn.max_pool(x, (5, 5), strides=(1, 1))
    x_p = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    # torch AvgPool2d(count_include_pad=True): divide by full window
    return nn.avg_pool(x_p, (5, 5), strides=(1, 1))


class CRPBlock(nn.Module):
    """Chained residual pooling (ref layers.py:133-154)."""
    features: int
    n_stages: int = 2
    act: Callable = nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = ncsn_conv3x3(self.features, bias=False,
                                name=f"convs_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """ref layers.py:157-180 (always avg-pool)."""
    features: int
    n_stages: int = 2
    normalizer: Callable = None
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(name=f"norms_{i}")(path, y)
            path = _pool5(path, maxpool=False)
            path = ncsn_conv3x3(self.features, bias=False,
                                name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (ref layers.py:183-205)."""
    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv3x3(self.features, bias=False,
                                 name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """ref layers.py:208-234."""
    features: int
    n_blocks: int = 2
    n_stages: int = 2
    normalizer: Callable = None
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(name=f"{i + 1}_{j + 1}_norm")(x, y)
                x = self.act(x)
                x = ncsn_conv3x3(self.features, bias=False,
                                 name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


def _resize_bilinear_align(x: Array, shape: Tuple[int, int]) -> Array:
    """F.interpolate(mode='bilinear', align_corners=True) equivalent."""
    N, H, W, C = x.shape
    oh, ow = shape
    if (oh, ow) == (H, W):
        return x
    ys = jnp.linspace(0.0, H - 1, oh)
    xs = jnp.linspace(0.0, W - 1, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yy, xx: x[:, yy][:, :, xx]
    out = (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
           + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)
    return out


class MSFBlock(nn.Module):
    """Multi-scale fusion (ref layers.py:237-253)."""
    features: int

    @nn.compact
    def __call__(self, xs: Sequence[Array], shape: Tuple[int, int]) -> Array:
        total = None
        for i, x in enumerate(xs):
            h = ncsn_conv3x3(self.features, bias=True,
                             name=f"convs_{i}")(x)
            h = _resize_bilinear_align(h, shape)
            total = h if total is None else total + h
        return total


class CondMSFBlock(nn.Module):
    """ref layers.py:256-277."""
    features: int
    normalizer: Callable = None

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array,
                 shape: Tuple[int, int]) -> Array:
        total = None
        for i, x in enumerate(xs):
            h = self.normalizer(name=f"norms_{i}")(x, y)
            h = ncsn_conv3x3(self.features, bias=True, name=f"convs_{i}")(h)
            h = _resize_bilinear_align(h, shape)
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block (ref layers.py:280-313)."""
    features: int
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[Array],
                 output_shape: Tuple[int, int]) -> Array:
        hs = []
        for i, x in enumerate(xs):
            h = RCUBlock(x.shape[-1], 2, 2, self.act,
                         name=f"adapt_convs_{i}")(x)
            hs.append(h)
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                     name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output_convs")(h)


class CondRefineBlock(nn.Module):
    """ref layers.py:316-347."""
    features: int
    normalizer: Callable = None
    act: Callable = nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array,
                 output_shape: Tuple[int, int]) -> Array:
        hs = []
        for i, x in enumerate(xs):
            h = CondRCUBlock(x.shape[-1], 2, 2, self.normalizer, self.act,
                             name=f"adapt_convs_{i}")(x, y)
            hs.append(h)
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.normalizer,
                             name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.normalizer, self.act,
                         name="crp")(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.normalizer, self.act,
                            name="output_convs")(h, y)


class ConvMeanPool(nn.Module):
    """Conv then 2x2 mean pool (ref layers.py:350-369)."""
    features: int
    kernel_size: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        p = self.kernel_size // 2
        out = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                      padding=[(p, p), (p, p)], use_bias=self.biases,
                      name="conv")(x)
        return (out[:, ::2, ::2] + out[:, 1::2, ::2] + out[:, ::2, 1::2]
                + out[:, 1::2, 1::2]) / 4.0


class MeanPoolConv(nn.Module):
    """2x2 mean pool then conv (ref layers.py:372-381)."""
    features: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2]
             + x[:, 1::2, 1::2]) / 4.0
        p = self.kernel_size // 2
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       padding=[(p, p), (p, p)], use_bias=self.biases,
                       name="conv")(x)


class UpsampleConv(nn.Module):
    """Pixel-shuffle upsample then conv (ref layers.py:384-395)."""
    features: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        x = jnp.concatenate([x, x, x, x], axis=-1)
        # pixel shuffle r=2 on NHWC
        x = x.reshape(N, H, W, 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, H * 2, W * 2, C)
        p = self.kernel_size // 2
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       padding=[(p, p), (p, p)], use_bias=self.biases,
                       name="conv")(x)


class ResidualBlock(nn.Module):
    """Pre-activation residual block with dilation/downsampling
    (ref layers.py:455-500)."""
    features: int
    resample: Optional[str] = None  # None | 'down'
    act: Callable = elu
    normalization: Callable = None
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        norm = self.normalization
        h = norm(name="normalize1")(x)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(in_dim, dilation=self.dilation,
                                 name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = ncsn_conv3x3(self.features,
                                        dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                h = ncsn_conv3x3(in_dim, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.features, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.features, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        else:
            if self.dilation > 1:
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = (x if in_dim == self.features else
                            ncsn_conv3x3(self.features, dilation=self.dilation,
                                         name="shortcut")(x))
            else:
                h = ncsn_conv3x3(self.features, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, name="conv2")(h)
                shortcut = (x if in_dim == self.features else
                            ncsn_conv1x1(self.features, name="shortcut")(x))
        return shortcut + h


class ConditionalResidualBlock(nn.Module):
    """ref layers.py:397-452 (noise-level-conditioned variant)."""
    features: int
    resample: Optional[str] = None
    act: Callable = elu
    normalization: Callable = None
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        in_dim = x.shape[-1]
        norm = self.normalization
        h = norm(name="normalize1")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(in_dim, dilation=self.dilation,
                                 name="conv1")(h)
                h = norm(name="normalize2")(h, y)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = ncsn_conv3x3(self.features, dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                h = ncsn_conv3x3(in_dim, name="conv1")(h)
                h = norm(name="normalize2")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.features, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.features, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        else:
            if self.dilation > 1:
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv1")(h)
                h = norm(name="normalize2")(h, y)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = ncsn_conv3x3(self.features, dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                h = ncsn_conv3x3(self.features, name="conv1")(h)
                h = norm(name="normalize2")(h, y)
                h = self.act(h)
                h = ncsn_conv3x3(self.features, name="conv2")(h)
                shortcut = (x if in_dim == self.features else
                            nn.Conv(self.features, (1, 1),
                                    name="shortcut")(x))
        return shortcut + h
