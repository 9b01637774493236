"""Shared flax layers for the diffusion UNets (NHWC, bf16-aware).

Parameter names deliberately mirror the reference module names
(GroupNorm_0, Conv_0, Dense_0, NIN_0, ...) so checkpoint translation is a
mechanical key rewrite (see models/convert.py).

ref: score_sde/models/layers.py, layerspp.py; guided_diffusion/nn.py;
ddpm/unet_ddpm.py.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.ops import (
    group_norm,
    spatial_attention,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
)
from diffpure_tpu.ops.groupnorm import group_norm_silu, \
    group_norm_silu_pallas, ncsn_num_groups

Array = jax.Array

# Python float (weakly typed): keeps bf16 activations bf16. A numpy scalar
# here would silently promote every skip-rescale output to float32, forcing
# full-size fp32 materializations through the bf16 torso.
INV_SQRT2 = float(1.0 / np.sqrt(2.0))

# Fused GroupNorm+SiLU Pallas path (one read+write per feature map).
# Off by default for bit-parity with the jnp chain; enable with
# set_fused_gn_silu(True) (bench/serving configs).
_FUSED_GN_SILU = False


def set_fused_gn_silu(enable: bool) -> None:
    global _FUSED_GN_SILU
    _FUSED_GN_SILU = enable


# Whole-resblock Pallas fusion (ops/fused_resblock.py): the BigGAN block
# runs as one VMEM-resident kernel (eval mode, no up/down). "auto" enables
# it on TPU backends; True forces (interpret on CPU — tests only).
_FUSED_RESBLOCK = "auto"


def set_fused_resblock(mode) -> None:
    """mode: True | False | 'auto' (TPU only)."""
    global _FUSED_RESBLOCK
    _FUSED_RESBLOCK = mode


def _fused_resblock_active() -> bool:
    if _FUSED_RESBLOCK is True:
        return True
    if _FUSED_RESBLOCK == "auto":
        return jax.default_backend() == "tpu"
    return False


class GNSiLU(nn.Module):
    """GroupNorm+SiLU with the same param names as GroupNormTorch, so the
    fused and unfused paths share checkpoints."""
    num_groups: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        N, H, W, _ = x.shape
        fits_vmem = H * W * C * 4 <= 4 * 1024 * 1024
        if _FUSED_GN_SILU and fits_vmem and jax.default_backend() == "tpu":
            return group_norm_silu_pallas(x, scale, bias, self.num_groups,
                                          self.eps)
        return group_norm_silu(x, scale, bias, self.num_groups, self.eps)


def ddpm_init(scale: float = 1.0):
    """DDPM default init: variance_scaling(scale, fan_avg, uniform).

    ref: score_sde/models/layers.py:54-91 (itself ported from JAX — this is
    the round trip home). scale==0 is clamped to 1e-10 as in the reference.
    """
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_timestep_embedding(timesteps: Array, embedding_dim: int,
                           max_positions: int = 10000) -> Array:
    """DDPM sinusoidal embedding: [sin, cos], freq factor /(half-1).

    ref: score_sde/models/layers.py:515-532, ddpm/unet_ddpm.py:14-32.
    """
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def adm_timestep_embedding(timesteps: Array, dim: int,
                           max_period: int = 10000) -> Array:
    """ADM sinusoidal embedding: [cos, sin], freq factor /half.

    NOTE the two conventions differ in both ordering and denominator —
    a classic silent-mismatch trap (ref guided_diffusion/nn.py:110-128).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class GroupNormTorch(nn.Module):
    """GroupNorm with torch semantics and fp32 statistics.

    Param names `scale`/`bias` translate from torch `weight`/`bias`.
    """
    num_groups: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return group_norm(x, scale.astype(x.dtype), bias.astype(x.dtype),
                          self.num_groups, self.eps)


class GroupNormP(nn.Module):
    """GroupNormTorch with setup-defined params so fused kernels can read
    `.scale`/`.bias` directly (same names/shapes -> same checkpoints)."""
    channels: int
    num_groups: int
    eps: float = 1e-6

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.channels,))

    def __call__(self, x: Array) -> Array:
        return group_norm(x, self.scale.astype(x.dtype),
                          self.bias.astype(x.dtype), self.num_groups,
                          self.eps)


class Conv2dP(nn.Module):
    """SAME conv with setup-defined params (`kernel` HWIO / `bias`), numerics
    matching flax nn.Conv with dtype= (inputs/kernel/bias cast to dtype)."""
    in_ch: int
    features: int
    ksize: int = 3
    init_scale: float = 1.0
    dtype: Optional[Any] = None

    def setup(self):
        self.kernel = self.param(
            "kernel", ddpm_init(self.init_scale),
            (self.ksize, self.ksize, self.in_ch, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x: Array) -> Array:
        cdt = self.dtype or x.dtype
        pad = self.ksize // 2
        y = jax.lax.conv_general_dilated(
            x.astype(cdt), self.kernel.astype(cdt), (1, 1),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.astype(cdt)


class DenseP(nn.Module):
    """Dense with setup-defined params, numerics matching flax nn.Dense."""
    in_features: int
    features: int
    dtype: Optional[Any] = None

    def setup(self):
        self.kernel = self.param("kernel", ddpm_init(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x: Array) -> Array:
        cdt = self.dtype or x.dtype
        return x.astype(cdt) @ self.kernel.astype(cdt) \
            + self.bias.astype(cdt)


class NIN(nn.Module):
    """1x1 'network-in-network': dense over the channel axis.

    Torch stores W (in, out) + b — identical to a flax Dense kernel, so in
    NHWC this *is* a Dense (ref score_sde/models/layers.py:546-556).
    """
    features: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        W = self.param("W", ddpm_init(self.init_scale), (in_dim, self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return x @ W.astype(x.dtype) + b.astype(x.dtype)


def conv3x3(features: int, init_scale: float = 1.0, stride: int = 1,
            padding="SAME", bias: bool = True, name: Optional[str] = None,
            dtype=None) -> nn.Conv:
    """3x3 conv with DDPM init (ref layers.py:118-127)."""
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=padding,
                   use_bias=bias, kernel_init=ddpm_init(init_scale),
                   bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def conv1x1(features: int, init_scale: float = 1.0, stride: int = 1,
            bias: bool = True, name: Optional[str] = None, dtype=None) -> nn.Conv:
    """1x1 conv with DDPM init (ref layers.py:100-107)."""
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding="VALID",
                   use_bias=bias, kernel_init=ddpm_init(init_scale),
                   bias_init=nn.initializers.zeros, name=name, dtype=dtype)


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for continuous noise levels.

    ref: score_sde/models/layerspp.py:32-41. `W` is a frozen random
    projection loaded from the checkpoint.
    """
    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        W = self.param(
            "W", lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,))
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
    """Combine a pyramid skip with the trunk (ref layerspp.py:44-59)."""
    features: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        h = conv1x1(self.features, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(self.method)


class NINP(nn.Module):
    """NIN with setup-defined params (`W` (in,out) / `b`) so fused kernels
    can read them; numerics identical to NIN."""
    in_dim: int
    features: int
    init_scale: float = 0.1

    def setup(self):
        self.W = self.param("W", ddpm_init(self.init_scale),
                            (self.in_dim, self.features))
        self.b = self.param("b", nn.initializers.zeros, (self.features,))

    def __call__(self, x: Array) -> Array:
        return x @ self.W.astype(x.dtype) + self.b.astype(x.dtype)


class AttnBlockpp(nn.Module):
    """NCSN++ channel-wise self-attention block (ref layerspp.py:62-91)."""
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        gn = GroupNormP(C, ncsn_num_groups(C), eps=1e-6, name="GroupNorm_0")
        ninq = NINP(C, C, name="NIN_0")
        nink = NINP(C, C, name="NIN_1")
        ninv = NINP(C, C, name="NIN_2")
        nino = NINP(C, C, init_scale=self.init_scale, name="NIN_3")

        interpret = jax.default_backend() != "tpu"
        if (_fused_resblock_active() and (interpret or C % 128 == 0)
                and not self.is_initializing()):
            from diffpure_tpu.ops.fused_attnblock import fused_attnblock
            params = (gn.scale, gn.bias, ninq.W, ninq.b, nink.W, nink.b,
                      ninv.W, ninv.b, nino.W, nino.b)
            return fused_attnblock(x, params, ncsn_num_groups(C), 1e-6,
                                   self.skip_rescale, interpret)

        h = gn(x)
        q = ninq(h)
        k = nink(h)
        v = ninv(h)
        h = spatial_attention(q, k, v)
        h = nino(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) * INV_SQRT2


class FIRConv2d(nn.Module):
    """StyleGAN2 Conv2d with fused FIR up/downsampling.

    Param `weight` is HWIO (torch stores OIHW; translated). ref
    up_or_down_sampling.py:31-64.
    """
    features: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        # Named `kernel` (HWIO) so the generic OIHW->HWIO ckpt transform applies.
        w = self.param("kernel", ddpm_init(),
                       (self.kernel, self.kernel, in_ch, self.features))
        w = w.astype(x.dtype)
        if self.up:
            x = upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1),
                ((self.kernel // 2,) * 2, (self.kernel // 2,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            x = x + b.astype(x.dtype).reshape(1, 1, 1, -1)
        return x


class UpsampleLayer(nn.Module):
    """NCSN++ Upsample (ref layerspp.py:94-126)."""
    features: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        out_ch = self.features or C
        if not self.fir:
            h = jax.image.resize(x, (N, H * 2, W * 2, C), method="nearest")
            if self.with_conv:
                h = conv3x3(out_ch, name="Conv_0")(h)
        else:
            if not self.with_conv:
                h = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = FIRConv2d(out_ch, kernel=3, up=True,
                              resample_kernel=self.fir_kernel,
                              name="Conv2d_0")(x)
        return h


class DownsampleLayer(nn.Module):
    """NCSN++ Downsample (ref layerspp.py:129-163)."""
    features: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        out_ch = self.features or C
        if not self.fir:
            if self.with_conv:
                # Asymmetric (0,1) pad then stride-2 VALID conv
                # (ref layerspp.py:152-154).
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = conv3x3(out_ch, stride=2, padding="VALID", name="Conv_0")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = FIRConv2d(out_ch, kernel=3, down=True,
                              resample_kernel=self.fir_kernel,
                              name="Conv2d_0")(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (ref layerspp.py:166-209)."""
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    act: Callable = nn.swish
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, temb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        if isinstance(x, tuple):  # (h, skip) pair from the UNet up path
            x = jnp.concatenate(x, axis=-1)
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = GNSiLU(ncsn_num_groups(in_ch), eps=1e-6,
                   name="GroupNorm_0")(x) if self.act is nn.swish else \
            self.act(GroupNormTorch(ncsn_num_groups(in_ch), eps=1e-6,
                                    name="GroupNorm_0")(x))
        h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=ddpm_init(), dtype=self.dtype,
                             name="Dense_0")(self.act(temb))[:, None, None, :]
        h = GNSiLU(ncsn_num_groups(out_ch), eps=1e-6,
                   name="GroupNorm_1")(h) if self.act is nn.swish else \
            self.act(GroupNormTorch(ncsn_num_groups(out_ch), eps=1e-6,
                                    name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=self.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2", dtype=self.dtype)(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) * INV_SQRT2


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with optional resampling
    (ref layerspp.py:212-274)."""
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    act: Callable = nn.swish
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, temb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        # x may be a (h, skip) pair from the UNet up path: the fused kernel
        # concatenates in VMEM (saves the XLA concat materialization); the
        # unfused path concatenates here.
        x_pair = x if isinstance(x, tuple) else None
        if x_pair is not None:
            in_ch = x_pair[0].shape[-1] + x_pair[1].shape[-1]
        else:
            in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        g1, g2 = ncsn_num_groups(in_ch), ncsn_num_groups(out_ch)
        has_proj = in_ch != out_ch or self.up or self.down

        # param-exposing modules (names/shapes identical to the nn.Conv /
        # nn.Dense / GroupNormTorch tree -> same checkpoints)
        gn1 = GroupNormP(in_ch, g1, eps=1e-6, name="GroupNorm_0")
        conv0 = Conv2dP(in_ch, out_ch, dtype=self.dtype, name="Conv_0")
        dense = (DenseP(temb.shape[-1], out_ch, dtype=self.dtype,
                        name="Dense_0") if temb is not None else None)
        gn2 = GroupNormP(out_ch, g2, eps=1e-6, name="GroupNorm_1")
        conv1 = Conv2dP(out_ch, out_ch, init_scale=self.init_scale,
                        dtype=self.dtype, name="Conv_1")
        proj = (Conv2dP(in_ch, out_ch, ksize=1, dtype=self.dtype,
                        name="Conv_2") if has_proj else None)

        # --- fused single-kernel path (ops/fused_resblock.py) -------------
        # eval mode (dropout identity), swish act; naive (non-FIR) up/down
        # resampling runs in-kernel too
        # lane alignment: on real TPUs the kernels' reshape tricks
        # (resample lane-merge, seam-aligned concat stores) need
        # 128-multiple channel counts — true for every published NCSN++
        # config (nf >= 128); smaller experiment models (e.g. the defense
        # demo's nf=32) fall back to the unfused XLA graph, where they are
        # fast anyway. Interpret mode (off-TPU tests) has no lane
        # constraint.
        interpret = jax.default_backend() != "tpu"
        lanes_ok = interpret or (in_ch % 128 == 0 and out_ch % 128 == 0)
        if (_fused_resblock_active() and deterministic and lanes_ok
                and self.act is nn.swish and temb is not None
                and not ((self.up or self.down) and self.fir)
                and not self.is_initializing()):
            from diffpure_tpu.ops.fused_resblock import (fused_resblock,
                                                         fused_resblock_cat)
            temb_row = dense(self.act(temb))
            params = (gn1.scale, gn1.bias, conv0.kernel, conv0.bias,
                      gn2.scale, gn2.bias, conv1.kernel, conv1.bias,
                      proj.kernel[0, 0] if has_proj else None,
                      proj.bias if has_proj else None)
            resample = "up" if self.up else ("down" if self.down
                                             else "none")
            if (x_pair is not None and has_proj and resample == "none"
                    and x_pair[0].shape[-1] % 128 == 0):
                return fused_resblock_cat(x_pair[0], x_pair[1], temb_row,
                                          params, g1, g2, 1e-6,
                                          self.skip_rescale, interpret)
            if x_pair is not None:
                x = jnp.concatenate(x_pair, axis=-1)
            return fused_resblock(x, temb_row, params, g1, g2, 1e-6,
                                  self.skip_rescale, interpret, resample)

        if x_pair is not None:
            x = jnp.concatenate(x_pair, axis=-1)
        h = self.act(gn1(x))
        if self.up:
            if self.fir:
                h = upsample_2d(h, self.fir_kernel, factor=2)
                x = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_upsample_2d(h, factor=2)
                x = naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, self.fir_kernel, factor=2)
                x = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_downsample_2d(h, factor=2)
                x = naive_downsample_2d(x, factor=2)
        h = conv0(h)
        if temb is not None:
            h = h + dense(self.act(temb))[:, None, None, :]
        h = self.act(gn2(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv1(h)
        if has_proj:
            x = proj(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) * INV_SQRT2
