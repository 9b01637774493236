"""GroupNorm (+ optional fused SiLU) with torch-exact semantics.

The diffusion UNets lean on GroupNorm with model-specific settings:
  - NCSN++: groups = min(C // 4, 32), eps = 1e-6 (ref layerspp.py:67,173,219)
  - ADM:    groups = 32, eps default (1e-5), computed in fp32 under fp16
            (ref guided_diffusion/nn.py:20-27 GroupNorm32)
  - DDPM:   groups = 32, eps = 1e-6 (ref ddpm/unet_ddpm.py:40-41)

Normalization statistics are always taken in float32 — the TPU bf16 analog of
the reference's GroupNorm32 discipline — then scale/shift and the optional
SiLU are applied in the compute dtype. Under jit XLA fuses the whole thing
into one or two VPU passes over the feature map; a Pallas variant exists for
fusion experiments (group_norm_pallas).

Layout: NHWC; groups are contiguous channel blocks (same as torch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def ncsn_num_groups(channels: int) -> int:
    """min(C // 4, 32) (ref layerspp.py:67)."""
    return min(channels // 4, 32)


def group_norm(x: Array, scale: Array, bias: Array, num_groups: int,
               eps: float = 1e-6) -> Array:
    """Torch-semantics GroupNorm over NHWC input.

    Statistics are per (batch, group) over (H, W, C/G), computed in fp32.
    """
    N, H, W, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    orig_dtype = x.dtype
    # Whole op in fp32 (the reference's GroupNorm32 discipline,
    # guided_diffusion/nn.py:25-27), cast back at the end.
    xg = x.astype(jnp.float32).reshape(N, H, W, num_groups, C // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x32 = xg.reshape(N, H, W, C)
    out = (x32 * scale.astype(jnp.float32).reshape(1, 1, 1, C)
           + bias.astype(jnp.float32).reshape(1, 1, 1, C))
    return out.astype(orig_dtype)


def group_norm_silu(x: Array, scale: Array, bias: Array, num_groups: int,
                    eps: float = 1e-6) -> Array:
    """GroupNorm followed by SiLU (the UNet res-block prologue)."""
    h = group_norm(x, scale, bias, num_groups, eps)
    return h * jax.nn.sigmoid(h)
