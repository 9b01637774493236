"""WideResNet classifiers (NHWC flax, inference BatchNorm).

Two architectures from the reference surface:
  - WideResNet: TRADES-style (ref classifiers/cifar10_resnet.py:95-193),
    used for the local wrn-70-16-dropout checkpoint and — without the
    internal normalization — matching the robustbench 'Standard'
    WRN-28-10 (ref utils.py:179-181).
  - DMWideResNet: DeepMind pre-activation variant with Swish, used by the
    robustbench Gowal/Rebuffi AT checkpoints and the local wideresnet-70-16
    (ref utils.py:222-232).

Submodule names mirror the torch state-dict keys ('.'->'_' merge) for
mechanical translation (classifiers/convert.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffpure_tpu.classifiers.common import (
    CIFAR10_MEAN, CIFAR10_STD, BatchNormInference, conv1x1_nobias,
    conv3x3_nobias, normalize,
)

Array = jax.Array


class BasicBlockWRN(nn.Module):
    """TRADES WRN basic block (ref cifar10_resnet.py:95-117)."""
    out_planes: int
    stride: int = 1
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        in_planes = x.shape[-1]
        equal_in_out = in_planes == self.out_planes
        pre = nn.relu(BatchNormInference(name="bn1")(x))
        if not equal_in_out:
            x = pre
        out = pre if equal_in_out else x
        out = conv3x3_nobias(self.out_planes, self.stride, name="conv1")(out)
        out = nn.relu(BatchNormInference(name="bn2")(out))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = conv3x3_nobias(self.out_planes, 1, name="conv2")(out)
        if equal_in_out:
            return x + out
        return conv1x1_nobias(self.out_planes, self.stride,
                              name="convShortcut")(x) + out


class NetworkBlock(nn.Module):
    """ref cifar10_resnet.py:120-132."""
    nb_layers: int
    out_planes: int
    stride: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        for i in range(self.nb_layers):
            x = BasicBlockWRN(self.out_planes,
                              stride=self.stride if i == 0 else 1,
                              drop_rate=self.drop_rate,
                              name=f"layer_{i}")(x, train=train)
        return x


class WideResNet(nn.Module):
    """TRADES-style WRN (ref cifar10_resnet.py:137-193)."""
    depth: int = 28
    widen_factor: int = 10
    num_classes: int = 10
    drop_rate: float = 0.0
    sub_block1: bool = False  # robustbench 'Standard' key-compat dead block
    bias_last: bool = True
    normalize_input: bool = True  # internal CIFAR normalization

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen_factor, 32 * self.widen_factor,
                  64 * self.widen_factor]
        if self.normalize_input:
            x = normalize(x, CIFAR10_MEAN, CIFAR10_STD)
        out = conv3x3_nobias(widths[0], name="conv1")(x)
        out = NetworkBlock(n, widths[1], 1, self.drop_rate,
                           name="block1")(out, train=train)
        if self.sub_block1:
            # present in some checkpoints but unused at runtime
            # (ref cifar10_resnet.py:152-155); materialize for key parity
            NetworkBlock(n, widths[1], 1, self.drop_rate,
                         name="sub_block1")(out * 0, train=train)
        out = NetworkBlock(n, widths[2], 2, self.drop_rate,
                           name="block2")(out, train=train)
        out = NetworkBlock(n, widths[3], 2, self.drop_rate,
                           name="block3")(out, train=train)
        out = nn.relu(BatchNormInference(name="bn1")(out))
        # global spatial mean == the reference's fixed 8x8 avg-pool at the
        # 32x32 design size (ref cifar10_resnet.py:188), size-agnostic here
        out = jnp.mean(out, axis=(1, 2))
        return nn.Dense(self.num_classes, use_bias=self.bias_last,
                        name="fc")(out)


def wrn_70_16_dropout() -> WideResNet:
    """ref cifar10_resnet.py:197-198."""
    return WideResNet(depth=70, widen_factor=16, drop_rate=0.3)


# ---------------------------------------------------------------------------
# DeepMind WRN (robustbench AT checkpoints)
# ---------------------------------------------------------------------------


class DMBlock(nn.Module):
    """Pre-activation block with DM 'SAME' padding quirk: stride-2 convs pad
    (0,1,0,1) (robustbench dm_wide_resnet.py _Block)."""
    out_planes: int
    stride: int = 1
    act: Callable = nn.swish

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_planes = x.shape[-1]
        has_shortcut = in_planes != self.out_planes
        pre = self.act(BatchNormInference(name="batchnorm_0")(x))
        if has_shortcut:
            x = pre
        v = pre
        if self.stride == 1:
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        else:
            v = jnp.pad(v, ((0, 0), (0, 1), (0, 1), (0, 0)))
        out = nn.Conv(self.out_planes, (3, 3), strides=(self.stride,) * 2,
                      padding="VALID", use_bias=False, name="conv_0")(v)
        out = self.act(BatchNormInference(name="batchnorm_1")(out))
        out = conv3x3_nobias(self.out_planes, 1, name="conv_1")(out)
        if has_shortcut:
            sc = conv1x1_nobias(self.out_planes, self.stride,
                                name="shortcut")(x)
        else:
            sc = x
        return sc + out


class DMBlockGroup(nn.Module):
    num_blocks: int
    out_planes: int
    stride: int
    act: Callable = nn.swish

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_blocks):
            x = DMBlock(self.out_planes,
                        stride=self.stride if i == 0 else 1,
                        act=self.act, name=f"block_{i}")(x)
        return x


class DMWideResNet(nn.Module):
    """DeepMind WRN (robustbench dm_wide_resnet.DMWideResNet).

    torch keys: init_conv, layer.{g}.block.{i}.{batchnorm_0,...}, batchnorm,
    logits.
    """
    num_classes: int = 10
    depth: int = 70
    width: int = 16
    act: Callable = nn.swish
    mean: Tuple[float, ...] = CIFAR10_MEAN
    std: Tuple[float, ...] = CIFAR10_STD
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.width, 32 * self.width, 64 * self.width]
        if self.padding:
            p = self.padding
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = normalize(x, self.mean, self.std)
        out = conv3x3_nobias(widths[0], name="init_conv")(x)
        out = DMBlockGroup(n, widths[1], 1, self.act, name="layer_0")(out)
        out = DMBlockGroup(n, widths[2], 2, self.act, name="layer_1")(out)
        out = DMBlockGroup(n, widths[3], 2, self.act, name="layer_2")(out)
        out = self.act(BatchNormInference(name="batchnorm")(out))
        out = jnp.mean(out, axis=(1, 2))
        return nn.Dense(self.num_classes, name="logits")(out)
