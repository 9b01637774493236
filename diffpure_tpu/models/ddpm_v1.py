"""Original DDPM score model from the score_sde registry (NHWC flax).

JAX rebuild of score_sde/models/ddpm.py:39-181 ('ddpm' registered model):
the classic DDPM UNet with the score_sde all_modules walk; modules are
named m{i} like NCSN++ so translation follows the same mechanical map.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffpure_tpu.models.layers import (
    AttnBlockpp, DownsampleLayer, GroupNormTorch, ResnetBlockDDPMpp,
    UpsampleLayer, conv3x3, ddpm_init, get_timestep_embedding,
)
from diffpure_tpu.models.ncsnpp import get_sigmas
from diffpure_tpu.models.registry import register_model
from diffpure_tpu.ops.groupnorm import ncsn_num_groups

Array = jax.Array


@register_model(name="ddpm")
class DDPM(nn.Module):
    """ref score_sde/models/ddpm.py:39-181."""

    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    centered: bool = True
    scale_by_sigma: bool = False
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000

    @nn.compact
    def __call__(self, x: Array, labels: Array, *, train: bool = False
                 ) -> Array:
        act = nn.swish
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_res = [self.image_size // (2 ** i) for i in range(num_resolutions)]

        m_idx = 0

        def next_name():
            nonlocal m_idx
            name = f"m{m_idx}"
            m_idx += 1
            return name

        if self.conditional:
            temb = get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=ddpm_init(),
                            name=next_name())(temb)
            temb = nn.Dense(nf * 4, kernel_init=ddpm_init(),
                            name=next_name())(act(temb))
        else:
            temb = None

        h = x if self.centered else 2 * x - 1.0

        resnet = lambda name, out_ch=None: ResnetBlockDDPMpp(
            out_ch=out_ch, dropout=self.dropout, skip_rescale=False,
            act=act, name=name)

        hs = [conv3x3(nf, name=next_name())(h)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = resnet(next_name(), out_ch)(hs[-1], temb,
                                                deterministic=not train)
                in_ch = out_ch
                if all_res[i_level] in self.attn_resolutions:
                    h = AttnBlockpp(skip_rescale=False, init_scale=0.0,
                                    name=next_name())(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(DownsampleLayer(with_conv=self.resamp_with_conv,
                                          name=next_name())(hs[-1]))

        h = hs[-1]
        h = resnet(next_name())(h, temb, deterministic=not train)
        h = AttnBlockpp(skip_rescale=False, name=next_name())(h)
        h = resnet(next_name())(h, temb, deterministic=not train)

        for i_level in reversed(range(num_resolutions)):
            for _ in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                h = resnet(next_name(), out_ch)(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    deterministic=not train)
                in_ch = out_ch
            if all_res[i_level] in self.attn_resolutions:
                h = AttnBlockpp(skip_rescale=False, name=next_name())(h)
            if i_level != 0:
                h = UpsampleLayer(with_conv=self.resamp_with_conv,
                                  name=next_name())(h)
        assert not hs

        h = act(GroupNormTorch(32, eps=1e-6, name=next_name())(h))
        h = conv3x3(self.num_channels, init_scale=0.0, name=next_name())(h)

        if self.scale_by_sigma:
            sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                            self.num_scales), jnp.float32)
            used = sigmas[labels.astype(jnp.int32)].reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1))
            h = h / used
        return h
