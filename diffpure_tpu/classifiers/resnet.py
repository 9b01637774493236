"""ResNet classifiers: CIFAR ResNet-50 and torchvision-style ImageNet ResNets.

  - CifarResNet50: ref classifiers/cifar10_resnet.py:17-85 (Bottleneck
    [3,4,6,3], 3x3 stem, internal CIFAR normalization, [0,1] inputs).
  - TorchvisionResNet: the standard torchvision arch used for ImageNet
    (resnet18/50/101, wide_resnet50_2; ref utils.py:155-170). The [0,1]->
    normalized wrapper lives in the registry (ref utils.py:144-155
    _Wrapper_ResNet).

NHWC flax; names mirror torch state-dict keys for translation.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffpure_tpu.classifiers.common import (
    CIFAR10_MEAN, CIFAR10_STD, BatchNormInference, conv1x1_nobias,
    conv3x3_nobias, normalize,
)

Array = jax.Array


class CifarBottleneck(nn.Module):
    """ref cifar10_resnet.py:17-42: post-activation bottleneck, shortcut is
    Sequential(conv, bn) -> keys shortcut_0 / shortcut_1."""
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_planes = x.shape[-1]
        out_planes = self.expansion * self.planes
        out = nn.relu(BatchNormInference(name="bn1")(
            conv1x1_nobias(self.planes, name="conv1")(x)))
        out = nn.relu(BatchNormInference(name="bn2")(
            conv3x3_nobias(self.planes, self.stride, name="conv2")(out)))
        out = BatchNormInference(name="bn3")(
            conv1x1_nobias(out_planes, name="conv3")(out))
        if self.stride != 1 or in_planes != out_planes:
            sc = conv1x1_nobias(out_planes, self.stride, name="shortcut_0")(x)
            sc = BatchNormInference(name="shortcut_1")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class CifarResNet50(nn.Module):
    """ref cifar10_resnet.py:45-85 (ResNet50 = Bottleneck [3,4,6,3])."""
    num_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = normalize(x, CIFAR10_MEAN, CIFAR10_STD)
        out = nn.relu(BatchNormInference(name="bn1")(
            conv3x3_nobias(64, name="conv1")(x)))
        planes = [64, 128, 256, 512]
        for li, (p, nb) in enumerate(zip(planes, self.num_blocks), start=1):
            for bi in range(nb):
                stride = (1 if li == 1 else 2) if bi == 0 else 1
                out = CifarBottleneck(p, stride,
                                      name=f"layer{li}_{bi}")(out)
        out = nn.avg_pool(out, (4, 4), strides=(4, 4))
        out = out.reshape(out.shape[0], -1)
        return nn.Dense(self.num_classes, name="linear")(out)


# ---------------------------------------------------------------------------
# torchvision-style ImageNet ResNet
# ---------------------------------------------------------------------------


class TVBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 64
    expansion: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(BatchNormInference(name="bn1")(
            conv3x3_nobias(self.planes, self.stride, name="conv1")(x)))
        out = BatchNormInference(name="bn2")(
            conv3x3_nobias(self.planes, 1, name="conv2")(out))
        if self.downsample:
            x = BatchNormInference(name="downsample_1")(
                conv1x1_nobias(self.planes * self.expansion, self.stride,
                               name="downsample_0")(x))
        return nn.relu(out + x)


class TVBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 64
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        width = int(self.planes * (self.base_width / 64.0))
        out = nn.relu(BatchNormInference(name="bn1")(
            conv1x1_nobias(width, name="conv1")(x)))
        out = nn.relu(BatchNormInference(name="bn2")(
            conv3x3_nobias(width, self.stride, name="conv2")(out)))
        out = BatchNormInference(name="bn3")(
            conv1x1_nobias(self.planes * self.expansion, name="conv3")(out))
        if self.downsample:
            x = BatchNormInference(name="downsample_1")(
                conv1x1_nobias(self.planes * self.expansion, self.stride,
                               name="downsample_0")(x))
        return nn.relu(out + x)


class TorchvisionResNet(nn.Module):
    """torchvision ResNet: 7x7 stem, maxpool, 4 stages, avgpool, fc."""
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    num_classes: int = 1000
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        Block = TVBottleneck if self.block == "bottleneck" else TVBasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                      use_bias=False, name="conv1")(x)
        out = nn.relu(BatchNormInference(name="bn1")(out))
        out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)),
                      constant_values=-jnp.inf)
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        in_planes = 64
        for li, (p, nb) in enumerate(
                zip([64, 128, 256, 512], self.layers), start=1):
            for bi in range(nb):
                stride = 1 if (li == 1 or bi > 0) else 2
                downsample = bi == 0 and (stride != 1
                                          or in_planes != p * expansion)
                out = Block(p, stride, downsample,
                            base_width=self.width_per_group,
                            name=f"layer{li}_{bi}")(out)
                in_planes = p * expansion
        out = jnp.mean(out, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(out)


def resnet18() -> TorchvisionResNet:
    return TorchvisionResNet(layers=(2, 2, 2, 2), block="basic")


def resnet50() -> TorchvisionResNet:
    return TorchvisionResNet(layers=(3, 4, 6, 3), block="bottleneck")


def resnet101() -> TorchvisionResNet:
    return TorchvisionResNet(layers=(3, 4, 23, 3), block="bottleneck")


def wide_resnet50_2() -> TorchvisionResNet:
    return TorchvisionResNet(layers=(3, 4, 6, 3), block="bottleneck",
                             width_per_group=128)
