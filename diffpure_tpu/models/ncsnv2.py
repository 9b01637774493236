"""NCSNv2 model family (NHWC flax).

JAX rebuild of score_sde/models/ncsnv2.py:43-415: the RefineNet-style score
networks for 64px (NCSNv2), conditional NCSNv1 (NCSN), 128px and 256px
variants, plus the image-size dispatch. Vendored-but-selectable in the
reference (config.model.name); same here via the registry.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.models.legacy_layers import (
    CondRefineBlock, ConditionalResidualBlock, RefineBlock, ResidualBlock,
    ncsn_conv3x3,
)
from diffpure_tpu.models.ncsnpp import get_sigmas
from diffpure_tpu.models.normalization import (
    ConditionalInstanceNorm2dPlus, InstanceNorm2dPlus,
)
from diffpure_tpu.models.registry import register_model

Array = jax.Array


def get_network(image_size: int):
    """ref ncsnv2.py:30-40."""
    if image_size < 96:
        return NCSNv2
    if 96 <= image_size <= 128:
        return NCSNv2_128
    if 128 < image_size <= 256:
        return NCSNv2_256
    raise NotImplementedError(f"no network for {image_size}px")


class _NCSNv2Base(nn.Module):
    """Shared scaffolding: begin conv -> residual pyramid -> refine cascade."""

    image_size: int = 64
    channels: int = 3
    nf: int = 128
    centered: bool = False
    scale_by_sigma: bool = True
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000
    act: Callable = nn.elu

    def _sigmas(self):
        return jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                      self.num_scales), jnp.float32)

    def _scale_output(self, out, x, labels):
        if self.scale_by_sigma:
            used = self._sigmas()[labels].reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1))
            out = out / used
        return out


@register_model(name="ncsnv2_64")
class NCSNv2(_NCSNv2Base):
    """ref ncsnv2.py:43-132 (4 residual stages, 4 refine blocks)."""

    @nn.compact
    def __call__(self, x: Array, labels: Array) -> Array:
        norm = InstanceNorm2dPlus
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        out = ncsn_conv3x3(nf, name="begin_conv")(h)

        res = lambda feats, name, **kw: ResidualBlock(
            feats, act=self.act, normalization=norm, name=name, **kw)

        l1 = res(nf, "res1_0")(out)
        l1 = res(nf, "res1_1")(l1)
        l2 = res(2 * nf, "res2_0", resample="down")(l1)
        l2 = res(2 * nf, "res2_1")(l2)
        l3 = res(2 * nf, "res3_0", resample="down", dilation=2)(l2)
        l3 = res(2 * nf, "res3_1", dilation=2)(l3)
        adjust = self.image_size == 28
        l4 = res(2 * nf, "res4_0", resample="down", dilation=4,
                 adjust_padding=adjust)(l3)
        l4 = res(2 * nf, "res4_1", dilation=4)(l4)

        r1 = RefineBlock(2 * nf, self.act, start=True,
                         name="refine1")([l4], l4.shape[1:3])
        r2 = RefineBlock(2 * nf, self.act, name="refine2")(
            [l3, r1], l3.shape[1:3])
        r3 = RefineBlock(nf, self.act, name="refine3")(
            [l2, r2], l2.shape[1:3])
        out = RefineBlock(nf, self.act, end=True, name="refine4")(
            [l1, r3], l1.shape[1:3])

        out = InstanceNorm2dPlus(name="normalizer")(out)
        out = self.act(out)
        out = ncsn_conv3x3(self.channels, name="end_conv")(out)
        return self._scale_output(out, x, labels)


@register_model(name="ncsn")
class NCSN(_NCSNv2Base):
    """Conditional NCSNv1 (ref ncsnv2.py:135-218): class-conditional norms
    take the noise-level index."""

    @nn.compact
    def __call__(self, x: Array, labels: Array) -> Array:
        norm = functools.partial(ConditionalInstanceNorm2dPlus,
                                 num_classes=self.num_scales)
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        out = ncsn_conv3x3(nf, name="begin_conv")(h)

        res = lambda feats, name, **kw: ConditionalResidualBlock(
            feats, act=self.act, normalization=norm, name=name, **kw)

        l1 = res(nf, "res1_0")(out, labels)
        l1 = res(nf, "res1_1")(l1, labels)
        l2 = res(2 * nf, "res2_0", resample="down")(l1, labels)
        l2 = res(2 * nf, "res2_1")(l2, labels)
        l3 = res(2 * nf, "res3_0", resample="down", dilation=2)(l2, labels)
        l3 = res(2 * nf, "res3_1", dilation=2)(l3, labels)
        adjust = self.image_size == 28
        l4 = res(2 * nf, "res4_0", resample="down", dilation=4,
                 adjust_padding=adjust)(l3, labels)
        l4 = res(2 * nf, "res4_1", dilation=4)(l4, labels)

        r1 = CondRefineBlock(2 * nf, norm, self.act, start=True,
                             name="refine1")([l4], labels, l4.shape[1:3])
        r2 = CondRefineBlock(2 * nf, norm, self.act, name="refine2")(
            [l3, r1], labels, l3.shape[1:3])
        r3 = CondRefineBlock(nf, norm, self.act, name="refine3")(
            [l2, r2], labels, l2.shape[1:3])
        out = CondRefineBlock(nf, norm, self.act, end=True, name="refine4")(
            [l1, r3], labels, l1.shape[1:3])

        out = ConditionalInstanceNorm2dPlus(
            num_classes=self.num_scales, name="normalizer")(out, labels)
        out = self.act(out)
        out = ncsn_conv3x3(self.channels, name="end_conv")(out)
        return self._scale_output(out, x, labels)


@register_model(name="ncsnv2_128")
class NCSNv2_128(_NCSNv2Base):
    """ref ncsnv2.py:221-312 (5 stages for 128px)."""

    @nn.compact
    def __call__(self, x: Array, labels: Array) -> Array:
        norm = InstanceNorm2dPlus
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        out = ncsn_conv3x3(nf, name="begin_conv")(h)

        res = lambda feats, name, **kw: ResidualBlock(
            feats, act=self.act, normalization=norm, name=name, **kw)

        l1 = res(nf, "res1_0")(out)
        l1 = res(nf, "res1_1")(l1)
        l2 = res(2 * nf, "res2_0", resample="down")(l1)
        l2 = res(2 * nf, "res2_1")(l2)
        l3 = res(2 * nf, "res3_0", resample="down")(l2)
        l3 = res(2 * nf, "res3_1")(l3)
        l4 = res(4 * nf, "res4_0", resample="down", dilation=2)(l3)
        l4 = res(4 * nf, "res4_1", dilation=2)(l4)
        l5 = res(4 * nf, "res5_0", resample="down", dilation=4)(l4)
        l5 = res(4 * nf, "res5_1", dilation=4)(l5)

        r1 = RefineBlock(4 * nf, self.act, start=True,
                         name="refine1")([l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, self.act, name="refine2")(
            [l4, r1], l4.shape[1:3])
        r3 = RefineBlock(2 * nf, self.act, name="refine3")(
            [l3, r2], l3.shape[1:3])
        r4 = RefineBlock(nf, self.act, name="refine4")(
            [l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, self.act, end=True, name="refine5")(
            [l1, r4], l1.shape[1:3])

        out = InstanceNorm2dPlus(name="normalizer")(out)
        out = self.act(out)
        out = ncsn_conv3x3(self.channels, name="end_conv")(out)
        return self._scale_output(out, x, labels)


@register_model(name="ncsnv2_256")
class NCSNv2_256(_NCSNv2Base):
    """ref ncsnv2.py:315-415 (6 stages for 256px)."""

    @nn.compact
    def __call__(self, x: Array, labels: Array) -> Array:
        norm = InstanceNorm2dPlus
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        out = ncsn_conv3x3(nf, name="begin_conv")(h)

        res = lambda feats, name, **kw: ResidualBlock(
            feats, act=self.act, normalization=norm, name=name, **kw)

        l1 = res(nf, "res1_0")(out)
        l1 = res(nf, "res1_1")(l1)
        l2 = res(2 * nf, "res2_0", resample="down")(l1)
        l2 = res(2 * nf, "res2_1")(l2)
        l3 = res(2 * nf, "res3_0", resample="down")(l2)
        l3 = res(2 * nf, "res3_1")(l3)
        l31 = res(2 * nf, "res31_0", resample="down")(l3)
        l31 = res(2 * nf, "res31_1")(l31)
        l4 = res(4 * nf, "res4_0", resample="down", dilation=2)(l31)
        l4 = res(4 * nf, "res4_1", dilation=2)(l4)
        l5 = res(4 * nf, "res5_0", resample="down", dilation=4)(l4)
        l5 = res(4 * nf, "res5_1", dilation=4)(l5)

        r1 = RefineBlock(4 * nf, self.act, start=True,
                         name="refine1")([l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, self.act, name="refine2")(
            [l4, r1], l4.shape[1:3])
        r31 = RefineBlock(2 * nf, self.act, name="refine31")(
            [l31, r2], l31.shape[1:3])
        r3 = RefineBlock(2 * nf, self.act, name="refine3")(
            [l3, r31], l3.shape[1:3])
        r4 = RefineBlock(nf, self.act, name="refine4")(
            [l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, self.act, end=True, name="refine5")(
            [l1, r4], l1.shape[1:3])

        out = InstanceNorm2dPlus(name="normalizer")(out)
        out = self.act(out)
        out = ncsn_conv3x3(self.channels, name="end_conv")(out)
        return self._scale_output(out, x, labels)
