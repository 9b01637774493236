"""NCSN++ score UNet in flax (NHWC), checkpoint-compatible with score_sde.

Re-implementation of the reference NCSN++ (ref: score_sde/models/ncsnpp.py:35-381)
with the same construction walk: every reference `all_modules[i]` corresponds
to a flax submodule named `m{i}`, making the torch->flax checkpoint key map a
mechanical rewrite (models/convert.py). The compute layout is TPU-native
NHWC; convs are HWIO; attention is the fused spatial_attention op.

CIFAR-10 DiffPure configuration (ref configs/cifar10.yml): nf=128,
ch_mult=(1,2,2,2), num_res_blocks=8, attn at 16x16, biggan blocks,
positional embedding, fir=False, skip_rescale=True, progressive none.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.models.layers import (
    INV_SQRT2,
    AttnBlockpp,
    Combine,
    DownsampleLayer,
    GaussianFourierProjection,
    GroupNormTorch,
    ResnetBlockBigGANpp,
    ResnetBlockDDPMpp,
    UpsampleLayer,
    conv3x3,
    ddpm_init,
    get_timestep_embedding,
)
from diffpure_tpu.models.registry import register_model
from diffpure_tpu.ops.groupnorm import ncsn_num_groups

Array = jax.Array


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric noise scales, descending (ref score_sde/models/utils.py:50-60)."""
    return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales))


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    """NCSN++ / DDPM++ score network."""

    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 8
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"  # 'biggan' | 'ddpm'
    progressive: str = "none"  # 'none' | 'output_skip' | 'residual'
    progressive_input: str = "none"  # 'none' | 'input_skip' | 'residual'
    progressive_combine: str = "sum"  # 'sum' | 'cat'
    embedding_type: str = "positional"  # 'positional' | 'fourier'
    fourier_scale: float = 16.0
    init_scale: float = 0.0
    scale_by_sigma: bool = False
    centered: bool = True
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, time_cond: Array, *, train: bool = False) -> Array:
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        act = nn.swish
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_resolutions = [self.image_size // (2 ** i)
                           for i in range(num_resolutions)]
        combine_method = self.progressive_combine.lower()

        def resnet(name, out_ch=None, up=False, down=False):
            if self.resblock_type == "ddpm":
                return ResnetBlockDDPMpp(
                    out_ch=out_ch, dropout=self.dropout,
                    init_scale=self.init_scale,
                    skip_rescale=self.skip_rescale, act=act,
                    dtype=self.dtype, name=name)
            return ResnetBlockBigGANpp(
                out_ch=out_ch, up=up, down=down, dropout=self.dropout,
                fir=self.fir, fir_kernel=self.fir_kernel,
                init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                act=act, dtype=self.dtype, name=name)

        m_idx = 0

        def next_name():
            nonlocal m_idx
            name = f"m{m_idx}"
            m_idx += 1
            return name

        # --- timestep / noise-level embedding (ref ncsnpp.py:232-257) -------
        used_sigmas = None
        if self.embedding_type == "fourier":
            used_sigmas = time_cond
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale,
                name=next_name())(jnp.log(used_sigmas))
        elif self.embedding_type == "positional":
            sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                            self.num_scales), jnp.float32)
            used_sigmas = sigmas[time_cond.astype(jnp.int32)]
            temb = get_timestep_embedding(time_cond, nf)
        else:
            raise ValueError(self.embedding_type)

        if self.conditional:
            temb = nn.Dense(nf * 4, kernel_init=ddpm_init(),
                            name=next_name())(temb)
            temb = nn.Dense(nf * 4, kernel_init=ddpm_init(),
                            name=next_name())(act(temb))
        else:
            temb = None

        if not self.centered:
            x = 2 * x - 1.0

        # bf16 torso: activations in compute dtype, temb too; GroupNorm stats
        # and softmax stay fp32 inside the ops; output head back in fp32.
        input_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if temb is not None:
                temb = temb.astype(self.dtype)

        # --- downsampling trunk (ref ncsnpp.py:263-303) ----------------------
        input_pyramid = x if self.progressive_input != "none" else None
        hs = [conv3x3(nf, name=next_name(), dtype=self.dtype)(x)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = resnet(next_name(), out_ch=out_ch)(
                    hs[-1], temb, deterministic=not train)
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    h = AttnBlockpp(skip_rescale=self.skip_rescale,
                                    init_scale=self.init_scale,
                                    name=next_name())(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = DownsampleLayer(with_conv=self.resamp_with_conv,
                                        fir=self.fir,
                                        fir_kernel=self.fir_kernel,
                                        name=next_name())(hs[-1])
                else:
                    h = resnet(next_name(), down=True)(
                        hs[-1], temb, deterministic=not train)

                if self.progressive_input == "input_skip":
                    input_pyramid = DownsampleLayer(
                        fir=self.fir, fir_kernel=self.fir_kernel,
                        with_conv=False,
                        name=f"pyramid_downsample_{i_level}")(input_pyramid)
                    h = Combine(h.shape[-1], method=combine_method,
                                name=next_name())(input_pyramid, h)
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    input_pyramid = DownsampleLayer(
                        features=in_ch, with_conv=True, fir=self.fir,
                        fir_kernel=self.fir_kernel,
                        name=next_name())(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) * INV_SQRT2
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- middle (ref ncsnpp.py:305-311) ----------------------------------
        h = hs[-1]
        h = resnet(next_name())(h, temb, deterministic=not train)
        h = AttnBlockpp(skip_rescale=self.skip_rescale,
                        init_scale=self.init_scale, name=next_name())(h)
        h = resnet(next_name())(h, temb, deterministic=not train)

        # --- upsampling trunk (ref ncsnpp.py:313-364) -------------------------
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                # (h, skip) pair: the BigGAN block concatenates (in VMEM on
                # the fused TPU path — see ResnetBlockBigGANpp)
                h = resnet(next_name(), out_ch=out_ch)(
                    (h, hs.pop()), temb, deterministic=not train)
                in_ch = out_ch

            if all_resolutions[i_level] in self.attn_resolutions:
                h = AttnBlockpp(skip_rescale=self.skip_rescale,
                                init_scale=self.init_scale,
                                name=next_name())(h)

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = act(GroupNormTorch(
                            ncsn_num_groups(in_ch), eps=1e-6,
                            name=next_name())(h))
                        pyramid = conv3x3(self.num_channels,
                                          init_scale=self.init_scale,
                                          name=next_name())(pyramid)
                    else:  # residual
                        pyramid = act(GroupNormTorch(
                            ncsn_num_groups(in_ch), eps=1e-6,
                            name=next_name())(h))
                        pyramid = conv3x3(in_ch, name=next_name())(pyramid)
                else:
                    if self.progressive == "output_skip":
                        pyramid = UpsampleLayer(
                            fir=self.fir, fir_kernel=self.fir_kernel,
                            with_conv=False,
                            name=f"pyramid_upsample_{i_level}")(pyramid)
                        pyramid_h = act(GroupNormTorch(
                            ncsn_num_groups(in_ch), eps=1e-6,
                            name=next_name())(h))
                        pyramid_h = conv3x3(self.num_channels,
                                            init_scale=self.init_scale,
                                            name=next_name())(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = UpsampleLayer(
                            features=in_ch, with_conv=True, fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=next_name())(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) * INV_SQRT2
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = UpsampleLayer(with_conv=self.resamp_with_conv,
                                      fir=self.fir, fir_kernel=self.fir_kernel,
                                      name=next_name())(h)
                else:
                    h = resnet(next_name(), up=True)(
                        h, temb, deterministic=not train)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = h.astype(input_dtype)
            h = act(GroupNormTorch(ncsn_num_groups(in_ch), eps=1e-6,
                                   name=next_name())(h))
            h = conv3x3(self.num_channels, init_scale=self.init_scale,
                        name=next_name())(h)
        h = h.astype(input_dtype)

        if self.scale_by_sigma:
            used_sigmas = used_sigmas.reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1))
            h = h / used_sigmas
        return h
