"""ADM (guided-diffusion) UNet in flax (NHWC), checkpoint-compatible.

Re-implementation of the reference UNetModel (ref: guided_diffusion/unet.py:404-671)
used for ImageNet 256x256 purification (552M params, learn_sigma 6-channel
output). Flax submodule names mirror torch state-dict keys with '.'->'_'
(`input_blocks_4_0`, `time_embed_0`, ...), so translation is a key rewrite.

TPU-native decisions:
  - NHWC + HWIO everywhere; the reference's 1D attention convs become Dense
    layers over the channel axis.
  - Mixed precision: params fp32, compute dtype configurable (bf16 on TPU —
    replaces the reference fp16 torso + fp32 GroupNorm, unet.py:626-640);
    GroupNorm statistics always fp32 (ops/groupnorm.py), softmax fp32
    (ops/attention.py).
  - Gradient checkpointing: flax remat on res/attention blocks mirrors
    use_checkpoint (unet.py:240,305) — configured by the purify runner, since
    under lax.scan the scan-level remat already bounds memory.

ImageNet-256 configuration (ref configs/imagenet.yml + script_util.py:156-168):
model_channels=256, channel_mult=(1,1,2,2,4,4), num_res_blocks=2,
attention at ds 8/16/32, num_head_channels=64, resblock_updown=True,
use_scale_shift_norm=True, out_channels=6.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffpure_tpu.models.layers import adm_timestep_embedding
from diffpure_tpu.models.registry import register_model
from diffpure_tpu.ops import qkv_attention
from diffpure_tpu.ops.groupnorm import group_norm

Array = jax.Array


def zero_init():
    """zero_module init (ref guided_diffusion/nn.py:76-82)."""
    return nn.initializers.zeros


class GroupNorm32(nn.Module):
    """32-group GroupNorm, fp32 statistics (ref nn.py:20-27,101-108)."""
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        shaped = x if x.ndim == 4 else x[:, :, None, :]
        out = group_norm(shaped, scale, bias, self.num_groups, self.eps)
        return out if x.ndim == 4 else out[:, :, 0, :]


class GroupNorm32P(nn.Module):
    """GroupNorm32 with setup-defined params so the tiled Pallas path can
    read `.scale`/`.bias` (same names/shapes -> same checkpoints)."""
    channels: int
    num_groups: int = 32
    eps: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.channels,))

    def __call__(self, x: Array) -> Array:
        shaped = x if x.ndim == 4 else x[:, :, None, :]
        out = group_norm(shaped, self.scale, self.bias, self.num_groups,
                         self.eps)
        return out if x.ndim == 4 else out[:, :, 0, :]


# maps larger than this (fp32 bytes per example) route GroupNorm through
# the two-pass tiled Pallas op (ops/tiled_groupnorm.py) — the 256px UNets
# are HBM-bound and this is 2r+1w instead of XLA's ~5-7 traversals
_TILED_GN_MIN_BYTES = 2 * 1024 * 1024

# Halo-tiled GN+SiLU+conv fusion (ops/halo_conv.py) with double-buffered
# DMA prefetch: measured 1.43x on ADM-256 at B=4 (115.5 -> 80.7 ms/eval)
# and 1.14x at B=8 (166.3 -> 145.8) — matched-batch A/B in docs/PERF.md.
_HALO_CONV = True


def set_halo_conv(enable: bool) -> None:
    global _HALO_CONV
    _HALO_CONV = enable


def set_tiled_gn_min_bytes(n: Optional[int]) -> None:
    """Override the tiled-GN/halo engage threshold (None restores the
    default 2 MiB). Lets tests and the multichip dryrun exercise the
    256px kernel family (tiled GN + halo conv) on dryrun-sized feature
    maps instead of needing a >=2 MiB map per example."""
    global _TILED_GN_MIN_BYTES
    _TILED_GN_MIN_BYTES = (2 * 1024 * 1024) if n is None else int(n)


def _use_tiled_gn(x) -> bool:
    from diffpure_tpu.models.layers import _fused_resblock_active
    if x.ndim != 4:
        return False
    H, W, C = x.shape[1], x.shape[2], x.shape[3]
    return (_fused_resblock_active()
            and H * W * C * 4 >= _TILED_GN_MIN_BYTES and H % 2 == 0)


class ConvADMP(nn.Module):
    """SAME conv with setup-defined params so the halo-fused path can read
    `.kernel`/`.bias` directly. Same param names/shapes and numerics as the
    nn.Conv modules it shadows (the init/unfused path) — one checkpoint
    serves both paths."""
    in_ch: int
    features: int
    ksize: int = 3
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.kernel = self.param(
            "kernel", self.kernel_init,
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


class ResBlockADM(nn.Module):
    """ADM residual block with FiLM conditioning (ref unet.py:151-265)."""
    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_conv_skip: bool = False
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, emb: Array, train: bool = False) -> Array:
        # `train` is positional-friendly so nn.remat(static_argnums=(2,))
        # can wrap this block (the use_checkpoint analog, ref unet.py:240).
        in_ch = x.shape[-1]
        conv = lambda feats, name, init=nn.initializers.lecun_normal(): nn.Conv(
            feats, (3, 3), padding="SAME", kernel_init=init, dtype=self.dtype,
            name=name)

        gn_in = GroupNorm32P(in_ch, name="in_layers_0")
        gn_out = GroupNorm32P(self.out_channels, name="out_layers_0")
        tiled = (not train and not self.is_initializing()
                 and _use_tiled_gn(x))
        interpret = jax.default_backend() != "tpu"

        # --- halo-fused path: [GN+SiLU+conv] and [GN+FiLM+SiLU+conv+skip]
        # each as ONE streamed pass with a 1-row halo (ops/halo_conv.py) —
        # the 256px maps exceed VMEM, so this 2-kernel pipeline (stats ->
        # halo conv) is the bandwidth optimum (docs/PERF.md).
        lanes_ok = interpret or (in_ch % 128 == 0
                                 and self.out_channels % 128 == 0)
        # weight operands are replicated into VMEM: the up-path concat
        # blocks (in_ch up to 1536) would blow the 16 MB scoped-vmem limit
        # on their 9*cin*cout kernel alone — those keep the tiled-GN path.
        # Charge at the block's actual compute-dtype itemsize (fp32 runs
        # double the bf16 estimate); _pick_tile_halo additionally returns
        # None past the hard cap so the kernel wrapper de-fuses safely.
        esize = 2 if self.dtype == jnp.bfloat16 else 4
        weights_fit = (9 * in_ch * self.out_channels * esize
                       <= 6 * 1024 * 1024)
        if (_HALO_CONV and tiled and lanes_ok and weights_fit
                and not (self.up or self.down)
                and self.use_scale_shift_norm and not self.use_conv_skip
                and _use_tiled_gn(
                    jax.ShapeDtypeStruct(
                        x.shape[:3] + (self.out_channels,), x.dtype))):
            from diffpure_tpu.ops.halo_conv import gn_silu_conv_block

            conv_in = ConvADMP(in_ch=in_ch, features=self.out_channels,
                               dtype=self.dtype, name="in_layers_2")
            conv_out = ConvADMP(in_ch=self.out_channels,
                                features=self.out_channels,
                                kernel_init=zero_init(), dtype=self.dtype,
                                name="out_layers_3")
            emb_out = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                               name="emb_layers_1")(nn.swish(emb))
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if in_ch != self.out_channels:
                proj = ConvADMP(in_ch=in_ch, features=self.out_channels,
                                ksize=1, dtype=self.dtype,
                                name="skip_connection")
                w_proj, x_skip = proj.kernel[0, 0], x
                # fold the skip-projection bias into the conv bias
                b_out = conv_out.bias + proj.bias
            else:
                w_proj, x_skip, b_out = None, x, conv_out.bias

            h = gn_silu_conv_block(x, gn_in.scale, gn_in.bias, None, None,
                                   conv_in.kernel, conv_in.bias, None,
                                   None, None, 32, 1e-5, interpret)
            return gn_silu_conv_block(h, gn_out.scale, gn_out.bias, scale,
                                      shift, conv_out.kernel, b_out,
                                      x_skip, w_proj, None, 32, 1e-5,
                                      interpret)

        if tiled:
            from diffpure_tpu.ops.tiled_groupnorm import group_norm_film_silu
            h = group_norm_film_silu(x, gn_in.scale, gn_in.bias, 32, 1e-5,
                                     None, None, True, interpret)
        else:
            h = nn.swish(gn_in(x))
        if self.up:
            N, H, W, C = h.shape
            h = jax.image.resize(h, (N, H * 2, W * 2, C), "nearest")
            x = jax.image.resize(x, (N, H * 2, W * 2, in_ch), "nearest")
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = conv(self.out_channels, "in_layers_2")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            dtype=self.dtype, name="emb_layers_1")(nn.swish(emb))

        tiled_h = (not train and not self.is_initializing()
                   and _use_tiled_gn(h))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out.astype(h.dtype), 2, axis=-1)
            if tiled_h:
                from diffpure_tpu.ops.tiled_groupnorm import \
                    group_norm_film_silu
                h = group_norm_film_silu(h, gn_out.scale, gn_out.bias, 32,
                                         1e-5, scale, shift, True,
                                         interpret)
            else:
                h = gn_out(h) * (1 + scale[:, None, None, :]) \
                    + shift[:, None, None, :]
                h = nn.swish(h)
        else:
            h = h + emb_out[:, None, None, :].astype(h.dtype)
            if tiled_h:
                from diffpure_tpu.ops.tiled_groupnorm import \
                    group_norm_film_silu
                h = group_norm_film_silu(h, gn_out.scale, gn_out.bias, 32,
                                         1e-5, None, None, True, interpret)
            else:
                h = nn.swish(gn_out(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv(self.out_channels, "out_layers_3", init=zero_init())(h)

        if self.out_channels == in_ch:
            skip = x
        elif self.use_conv_skip:
            skip = conv(self.out_channels, "skip_connection")(x)
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip_connection")(x)
        return skip + h


class AttentionBlockADM(nn.Module):
    """Spatial self-attention (ref unet.py:267-333).

    The reference's 1x1 conv1d qkv/proj become Dense layers on the channel
    axis (translated from torch (out,in,1) weights). With use_flash the
    >=1024-token blocks (32x32 feature maps — the largest the ImageNet-256
    config attends at, ref script_util.py:170-172) run the blockwise
    Pallas kernel (ops/flash_attention.py) on TPU instead of materializing
    the score matrix; on other backends the dense qkv_attention path (same
    fp32-softmax semantics) is used — interpret-mode Pallas would be
    orders of magnitude slower there for zero benefit.
    """
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    use_flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert C % self.num_head_channels == 0
            heads = C // self.num_head_channels
        h = x.reshape(N, H * W, C)
        h_norm = GroupNorm32(name="norm")(h)
        qkv = nn.Dense(C * 3, dtype=self.dtype, name="qkv")(h_norm)
        order = "new" if self.use_new_attention_order else "legacy"
        if (self.use_flash and (H * W) >= 1024
                and jax.default_backend() == "tpu"):
            from diffpure_tpu.ops.flash_attention import qkv_flash_attention
            a = qkv_flash_attention(qkv, heads, order=order)
        else:
            a = qkv_attention(qkv, heads, order=order)
        a = nn.Dense(C, kernel_init=zero_init(), dtype=self.dtype,
                     name="proj_out")(a)
        return (h + a).reshape(N, H, W, C)


class UpsampleADM(nn.Module):
    """Nearest 2x upsample + optional conv (ref unet.py:89-118)."""
    out_channels: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), "nearest")
        if self.use_conv:
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv")(x)
        return x


class DownsampleADM(nn.Module):
    """Stride-2 conv or avg-pool downsample (ref unet.py:121-144)."""
    out_channels: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_conv:
            # torch padding=1 under stride 2 (explicit; != XLA "SAME")
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


@register_model(name="adm")
class ADMUNet(nn.Module):
    """Full ADM UNet (ref unet.py:404-671)."""

    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6  # learn_sigma
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16, 32)  # ds values
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    use_flash: bool = False  # Pallas blockwise attention for T>=1024
    use_checkpoint: bool = False  # remat res/attn blocks (ref unet.py:240,305)
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 torso)

    @nn.compact
    def __call__(self, x: Array, timesteps: Array,
                 y: Optional[Array] = None, *, train: bool = False) -> Array:
        assert (y is not None) == (self.num_classes is not None)
        heads_up = (self.num_heads if self.num_heads_upsample == -1
                    else self.num_heads_upsample)
        time_embed_dim = self.model_channels * 4

        emb = adm_timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.swish(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim,
                                 name="label_emb")(y)

        ResCls = (nn.remat(ResBlockADM, static_argnums=(3,))
                  if self.use_checkpoint else ResBlockADM)
        AttnCls = (nn.remat(AttentionBlockADM)
                   if self.use_checkpoint else AttentionBlockADM)

        def resblock(name, ch_out, up=False, down=False):
            return ResCls(out_channels=ch_out,
                          emb_channels=time_embed_dim,
                          dropout=self.dropout,
                          use_scale_shift_norm=self.use_scale_shift_norm,
                          up=up, down=down, dtype=self.dtype, name=name)

        def attnblock(name, heads):
            return AttnCls(
                num_heads=heads, num_head_channels=self.num_head_channels,
                use_new_attention_order=self.use_new_attention_order,
                use_flash=self.use_flash, dtype=self.dtype, name=name)

        input_dtype = x.dtype
        h = x.astype(self.dtype or x.dtype)

        # --- input blocks (ref unet.py:489-546) ------------------------------
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_blocks_0_0")(h)
        hs = [h]
        input_block_chans = [ch]
        ds = 1
        block_i = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = resblock(f"input_blocks_{block_i}_0", ch)(h, emb, train)
                if ds in self.attention_resolutions:
                    h = attnblock(f"input_blocks_{block_i}_1", self.num_heads)(h)
                hs.append(h)
                input_block_chans.append(ch)
                block_i += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = resblock(f"input_blocks_{block_i}_0", ch,
                                 down=True)(h, emb, train)
                else:
                    h = DownsampleADM(ch, self.conv_resample, dtype=self.dtype,
                                      name=f"input_blocks_{block_i}_0")(h)
                hs.append(h)
                input_block_chans.append(ch)
                ds *= 2
                block_i += 1

        # --- middle (ref unet.py:548-571) -------------------------------------
        h = resblock("middle_block_0", ch)(h, emb, train)
        h = attnblock("middle_block_1", self.num_heads)(h)
        h = resblock("middle_block_2", ch)(h, emb, train)

        # --- output blocks (ref unet.py:573-618) -------------------------------
        block_i = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(self.model_channels * mult)
                h = resblock(f"output_blocks_{block_i}_0", ch)(h, emb,
                                                               train)
                layer_j = 1
                if ds in self.attention_resolutions:
                    h = attnblock(f"output_blocks_{block_i}_{layer_j}",
                                  heads_up)(h)
                    layer_j += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = resblock(f"output_blocks_{block_i}_{layer_j}", ch,
                                     up=True)(h, emb, train)
                    else:
                        h = UpsampleADM(ch, self.conv_resample,
                                        dtype=self.dtype,
                                        name=f"output_blocks_{block_i}_{layer_j}")(h)
                    ds //= 2
                block_i += 1
        assert not hs

        h = h.astype(input_dtype)
        h = nn.swish(GroupNorm32(name="out_0")(h))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       kernel_init=zero_init(), name="out_2")(h)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (ref unet.py:30-60)."""
    spacial_dim: int
    embed_dim: int
    num_heads_channels: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        h = x.reshape(N, H * W, C)
        h = jnp.concatenate([h.mean(axis=1, keepdims=True), h], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda k, s: jax.random.normal(k, s) / (self.embed_dim ** 0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim))
        h = h + pos[None].astype(h.dtype)
        qkv = nn.Dense(3 * C, name="qkv_proj")(h)
        a = qkv_attention(qkv, C // self.num_heads_channels, order="new")
        a = nn.Dense(self.output_dim or C, name="c_proj")(a)
        return a[:, 0]


class SuperResADM(ADMUNet):
    """Super-resolution variant: conditions on an upsampled low-res image
    (ref unet.py:674-690). in_channels doubles internally."""

    @nn.compact
    def __call__(self, x: Array, timesteps: Array,
                 low_res: Optional[Array] = None,
                 y: Optional[Array] = None, *, train: bool = False) -> Array:
        N, H, W, C = x.shape
        upsampled = jax.image.resize(low_res, (low_res.shape[0], H, W, C),
                                     "bilinear")
        x = jnp.concatenate([x, upsampled], axis=-1)
        return ADMUNet.__call__(self, x, timesteps, y=y, train=train)


class EncoderUNetADM(nn.Module):
    """Half-UNet encoder with pooled output head — the guidance classifier
    (ref unet.py:691-880)."""

    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16, 32)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    pool: str = "attention"  # 'adaptive' | 'attention' | 'spatial'
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, *,
                 train: bool = False) -> Array:
        time_embed_dim = self.model_channels * 4
        emb = adm_timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.swish(emb))

        def resblock(name, ch_out, down=False):
            return ResBlockADM(out_channels=ch_out,
                               emb_channels=time_embed_dim,
                               dropout=self.dropout,
                               use_scale_shift_norm=self.use_scale_shift_norm,
                               down=down, dtype=self.dtype, name=name)

        input_dtype = x.dtype
        h = x.astype(self.dtype or x.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_blocks_0_0")(h)
        ds = 1
        block_i = 1
        results = []
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = resblock(f"input_blocks_{block_i}_0", ch)(h, emb,
                                                              train)
                if ds in self.attention_resolutions:
                    h = AttentionBlockADM(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        use_new_attention_order=self.use_new_attention_order,
                        dtype=self.dtype,
                        name=f"input_blocks_{block_i}_1")(h)
                if self.pool == "spatial":
                    results.append(h.astype(input_dtype).mean(axis=(1, 2)))
                block_i += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = resblock(f"input_blocks_{block_i}_0", ch,
                                 down=True)(h, emb, train)
                else:
                    h = DownsampleADM(ch, self.conv_resample,
                                      dtype=self.dtype,
                                      name=f"input_blocks_{block_i}_0")(h)
                ds *= 2
                block_i += 1

        h = resblock("middle_block_0", ch)(h, emb, train)
        h = AttentionBlockADM(num_heads=self.num_heads,
                              num_head_channels=self.num_head_channels,
                              use_new_attention_order=self.use_new_attention_order,
                              dtype=self.dtype, name="middle_block_1")(h)
        h = resblock("middle_block_2", ch)(h, emb, train)

        if self.pool == "adaptive":
            h = h.astype(input_dtype)
            h = nn.swish(GroupNorm32(name="out_0")(h))
            h = h.mean(axis=(1, 2), keepdims=True)
            h = nn.Conv(self.out_channels, (1, 1), kernel_init=zero_init(),
                        name="out_2")(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            h = h.astype(input_dtype)
            h = nn.swish(GroupNorm32(name="out_0")(h))
            return AttentionPool2d(
                spacial_dim=self.image_size // ds, embed_dim=ch,
                num_heads_channels=self.num_head_channels,
                output_dim=self.out_channels, name="out_2")(h)
        if self.pool == "spatial":
            results.append(h.astype(input_dtype).mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1)
            h = nn.relu(nn.Dense(2048, name="out_0")(h))
            return nn.Dense(self.out_channels, name="out_2")(h)
        raise NotImplementedError(self.pool)


def imagenet256_config(use_bf16: bool = True) -> dict:
    """ADM hyperparameters for the 256x256_diffusion_uncond checkpoint.

    ref: configs/imagenet.yml + guided_diffusion/script_util.py:138-192.
    """
    return dict(
        image_size=256, in_channels=3, model_channels=256, out_channels=6,
        num_res_blocks=2, attention_resolutions=(8, 16, 32), dropout=0.0,
        channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4, num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=False,
        # Pallas online-softmax attention at the 1024-token level: ~4%
        # faster end-to-end and avoids materializing (B,heads,1024,1024)
        # score tensors (measured on-chip, docs/PERF.md)
        use_flash=True,
        dtype=jnp.bfloat16 if use_bf16 else None,
    )
