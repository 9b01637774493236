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
fusion experiments (group_norm_silu_pallas).

Layout: NHWC; groups are contiguous channel blocks (same as torch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, m_ref, mt_ref, o_ref,
                    *, eps: float, hw: int, cg: int):
    """One example per grid step: stats via MXU matmuls with the group
    one-hot matrix (keeps the lane dimension intact — no reshape across
    lanes), then a single fused normalize+affine+SiLU pass."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    M = m_ref[:]                      # (C, G) one-hot group membership
    MT = mt_ref[:]                    # (G, C)
    n = float(hw * cg)
    sums = jnp.dot(jnp.sum(x, axis=0, keepdims=True), M,
                   preferred_element_type=jnp.float32)      # (1, G)
    sumsq = jnp.dot(jnp.sum(x * x, axis=0, keepdims=True), M,
                    preferred_element_type=jnp.float32)     # (1, G)
    mean_g = sums / n
    var_g = sumsq / n - mean_g * mean_g
    mean_c = jnp.dot(mean_g, MT, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), MT,
                     preferred_element_type=jnp.float32)    # (1, C)
    h = (x - mean_c) * rstd_c * scale_ref[:] + bias_ref[:]
    o_ref[0] = (h * jax.nn.sigmoid(h)).astype(o_ref.dtype)


def group_norm_silu_pallas(x: Array, scale: Array, bias: Array,
                           num_groups: int, eps: float = 1e-6,
                           interpret: bool = False) -> Array:
    """Fused GN+SiLU Pallas kernel: one read + one write of the feature map.

    Requires the per-example feature map (H*W x C fp32) to fit in VMEM —
    true for every NCSN++/CIFAR level; larger maps fall back to the jnp
    path in the caller.
    """
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, C = x.shape
    assert C % num_groups == 0
    cg = C // num_groups
    hw = H * W
    x2 = x.reshape(N, hw, C)

    M = np.zeros((C, num_groups), np.float32)
    for c in range(C):
        M[c, c // cg] = 1.0
    MT = M.T.copy()

    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, eps=eps, hw=hw, cg=cg),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, scale.astype(jnp.float32).reshape(1, C),
      bias.astype(jnp.float32).reshape(1, C), jnp.asarray(M),
      jnp.asarray(MT))
    return out.reshape(N, H, W, C)
