"""Shared classifier building blocks (inference-mode, NHWC)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2471, 0.2435, 0.2616)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class BatchNormInference(nn.Module):
    """BatchNorm evaluated with stored running statistics.

    The classifier zoo is eval-only in the reference (ref utils.py:143-253 —
    every model is .eval()), so running stats are plain params
    (scale, bias, mean, var) translated from the torch buffers.
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def normalize(x: Array, mean, std) -> Array:
    """(x - mean) / std with per-channel constants, NHWC."""
    mean = jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std


def conv3x3_nobias(features: int, stride: int = 1, name: str | None = None,
                   padding=((1, 1), (1, 1))) -> nn.Conv:
    # Explicit symmetric padding: torch padding=1 semantics. XLA's "SAME"
    # pads (0,1) under stride 2, which silently shifts the feature map.
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=padding,
                   use_bias=False, name=name)


def conv1x1_nobias(features: int, stride: int = 1, name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding="VALID",
                   use_bias=False, name=name)
