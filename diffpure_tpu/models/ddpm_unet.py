"""SDEdit/DDPM UNet in flax (NHWC), checkpoint-compatible with CelebA-HQ ckpt.

Re-implementation of the reference DDPM UNet (ref: ddpm/unet_ddpm.py:200-345).
Flax submodule names mirror torch state-dict keys with '.'->'_'
(`down_0_block_1`, `mid_block_1`, `temb_dense_0`, ...).

CelebA-HQ configuration (ref configs/celeba.yml): ch=128,
ch_mult=(1,1,2,2,4,4), num_res_blocks=2, attn at 16x16, resolution 256.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffpure_tpu.models.layers import get_timestep_embedding
from diffpure_tpu.models.registry import register_model
from diffpure_tpu.ops import spatial_attention
from diffpure_tpu.ops.groupnorm import group_norm

Array = jax.Array


class Normalize(nn.Module):
    """GroupNorm(32, eps=1e-6) (ref unet_ddpm.py:40-41)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return group_norm(x, scale, bias, 32, self.eps)


class NormalizeP(nn.Module):
    """Normalize with setup-defined params for the tiled Pallas GN path."""
    channels: int
    eps: float = 1e-6

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.channels,))

    def __call__(self, x: Array) -> Array:
        return group_norm(x, self.scale, self.bias, 32, self.eps)


def _halo_eligible(blk, x, in_ch: int, out_ch: int, train: bool) -> bool:
    """Gate for the halo-fused eval path: big-enough maps, lane-aligned
    channels (real TPU), weight operands that fit VMEM, no 3x3 conv
    shortcut, eval mode."""
    import jax as _jax

    from diffpure_tpu.models import adm_unet

    if train or blk.is_initializing() or blk.conv_shortcut:
        return False
    if not adm_unet._HALO_CONV:
        return False
    out_shape = _jax.ShapeDtypeStruct(x.shape[:3] + (out_ch,), x.dtype)
    if not (adm_unet._use_tiled_gn(x)
            and adm_unet._use_tiled_gn(out_shape)):
        return False
    interpret = _jax.default_backend() != "tpu"
    if not (interpret or (in_ch % 128 == 0 and out_ch % 128 == 0)):
        return False
    esize = 2 if blk.dtype == jnp.bfloat16 else 4
    return 9 * in_ch * out_ch * esize <= 6 * 1024 * 1024


def _gn_silu(gn: NormalizeP, x: Array, train: bool,
             initializing: bool) -> Array:
    """GN+SiLU. Measured on-chip: the two-pass tiled Pallas GN that wins
    1.44x on ADM-256 is 8% SLOWER here (128-ch bf16 maps — XLA's fused GN
    is already near-roofline), so this model keeps the XLA path."""
    del train, initializing
    return nn.swish(gn(x))


class ResnetBlockDDPM(nn.Module):
    """ref unet_ddpm.py:85-142."""
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, temb: Array, *, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        conv = lambda f, name: nn.Conv(f, (3, 3), padding="SAME",
                                       dtype=self.dtype, name=name)
        norm1 = NormalizeP(in_ch, name="norm1")
        norm2 = NormalizeP(out_ch, name="norm2")

        if _halo_eligible(self, x, in_ch, out_ch, train):
            # halo-fused eval path (ops/halo_conv.py): each
            # [GN+SiLU+conv3x3] runs as stats pass + one streamed halo
            # kernel; the timestep-embedding add folds into the second
            # stage's GN affine analytically (pre_shift) so x+temb is
            # never materialized over the 256px map. 1.43x on ADM-256
            # (docs/PERF.md); measured per-model below before shipping.
            from diffpure_tpu.models.adm_unet import ConvADMP
            from diffpure_tpu.ops.halo_conv import gn_silu_conv_block

            interpret = jax.default_backend() != "tpu"
            conv1 = ConvADMP(in_ch=in_ch, features=out_ch,
                             dtype=self.dtype, name="conv1")
            conv2 = ConvADMP(in_ch=out_ch, features=out_ch,
                             dtype=self.dtype, name="conv2")
            temb_row = nn.Dense(out_ch, dtype=self.dtype,
                                name="temb_proj")(nn.swish(temb))
            if in_ch != out_ch:
                nin = ConvADMP(in_ch=in_ch, features=out_ch, ksize=1,
                               dtype=self.dtype, name="nin_shortcut")
                w_proj, b_out = nin.kernel[0, 0], conv2.bias + nin.bias
            else:
                w_proj, b_out = None, conv2.bias
            h = gn_silu_conv_block(x, norm1.scale, norm1.bias, None, None,
                                   conv1.kernel, conv1.bias, None, None,
                                   None, 32, 1e-6, interpret)
            return gn_silu_conv_block(h, norm2.scale, norm2.bias, None,
                                      None, conv2.kernel, b_out, x, w_proj,
                                      temb_row, 32, 1e-6, interpret)

        h = _gn_silu(norm1, x, train, self.is_initializing())
        h = conv(out_ch, "conv1")(h)
        h = h + nn.Dense(out_ch, dtype=self.dtype,
                         name="temb_proj")(nn.swish(temb))[:, None, None, :]
        h = _gn_silu(norm2, h, train, self.is_initializing())
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv(out_ch, "conv2")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv(out_ch, "conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                            name="nin_shortcut")(x)
        return x + h


class AttnBlockDDPM(nn.Module):
    """Single-head spatial attention via 1x1 convs (ref unet_ddpm.py:144-196)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        h = Normalize(name="norm")(x)
        conv1 = lambda name: nn.Conv(C, (1, 1), dtype=self.dtype, name=name)
        q = conv1("q")(h)
        k = conv1("k")(h)
        v = conv1("v")(h)
        h = spatial_attention(q, k, v)
        h = conv1("proj_out")(h)
        return x + h


@register_model(name="ddpm_sdedit")
class DDPMUNet(nn.Module):
    """ref unet_ddpm.py:200-345."""

    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, t: Array, *, train: bool = False) -> Array:
        assert x.shape[1] == x.shape[2] == self.resolution
        num_resolutions = len(self.ch_mult)
        temb_ch = self.ch * 4

        # timestep embedding (ref unet_ddpm.py:307-311)
        temb = get_timestep_embedding(t, self.ch)
        temb = nn.Dense(temb_ch, name="temb_dense_0")(temb)
        temb = nn.Dense(temb_ch, name="temb_dense_1")(nn.swish(temb))

        input_dtype = x.dtype
        h = x.astype(self.dtype or x.dtype)

        # downsampling (ref unet_ddpm.py:313-324)
        hs = [nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_in")(h)]
        curr_res = self.resolution
        in_ch_mult = (1,) + tuple(self.ch_mult)
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlockDDPM(
                    out_channels=block_out, dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}")(
                        hs[-1], temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockDDPM(dtype=self.dtype,
                                      name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if self.resamp_with_conv:
                    # asymmetric pad + stride-2 conv (ref unet_ddpm.py:64-82)
                    d = jnp.pad(hs[-1], ((0, 0), (0, 1), (0, 1), (0, 0)))
                    d = nn.Conv(hs[-1].shape[-1], (3, 3), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                name=f"down_{i_level}_downsample_conv")(d)
                else:
                    d = nn.avg_pool(hs[-1], (2, 2), strides=(2, 2))
                hs.append(d)
                curr_res //= 2

        # middle (ref unet_ddpm.py:326-330)
        h = hs[-1]
        h = ResnetBlockDDPM(dropout=self.dropout, dtype=self.dtype,
                            name="mid_block_1")(h, temb, train=train)
        h = AttnBlockDDPM(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlockDDPM(dropout=self.dropout, dtype=self.dtype,
                            name="mid_block_2")(h, temb, train=train)

        # upsampling (ref unet_ddpm.py:332-343)
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlockDDPM(
                    out_channels=block_out, dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}")(
                        jnp.concatenate([h, hs.pop()], axis=-1), temb,
                        train=train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockDDPM(dtype=self.dtype,
                                      name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                N, H, W, C = h.shape
                h = jax.image.resize(h, (N, H * 2, W * 2, C), "nearest")
                if self.resamp_with_conv:
                    h = nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"up_{i_level}_upsample_conv")(h)
                curr_res *= 2
        assert not hs

        h = h.astype(input_dtype)
        h = nn.swish(Normalize(name="norm_out")(h))
        return nn.Conv(self.out_ch, (3, 3), padding="SAME",
                       name="conv_out")(h)
