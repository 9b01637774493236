"""Tiled two-pass GroupNorm(+FiLM)(+SiLU) for large feature maps.

The 256px UNets (ADM ImageNet, CelebA DDPM) are HBM-bandwidth-bound
(docs/PERF.md): their 256x256x256 maps exceed VMEM, so the CIFAR
whole-block fusion cannot apply — but GroupNorm needs no halo, so it tiles
trivially. XLA's fp32-stats GroupNorm costs ~5-7 effective traversals
(casts + stats + normalize); this op costs exactly 2 reads + 1 write:

  pass 1 (Pallas): per-(example, row-tile) partial sums / sum-of-squares
  combine (XLA, tiny): group stats -> per-(example, channel) affine A, B
     folding GN scale/bias AND the optional FiLM (1+s)/shift into one
     multiply-add (the ADM scale-shift norm, ref guided_diffusion/nn.py +
     unet.py:244-264)
  pass 2 (Pallas): out = [silu](x * A + B), one read one write

Gradients: custom_vjp whose backward is XLA autodiff of the jnp reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _pick_tile(H: int, W: int, C: int, budget: int = 4 * 1024 * 1024) -> int:
    """Largest row-tile dividing H with the fp32 tile under budget."""
    for th in (64, 32, 16, 8, 4, 2, 1):
        if H % th == 0 and th * W * C * 4 <= budget:
            return th
    return 1


def _stats_kernel(x_ref, s_ref, q_ref):
    x = x_ref[...].astype(jnp.float32)
    C = x.shape[-1]
    s_ref[...] = jnp.sum(x, axis=(1, 2)).reshape(1, 1, 1, C)
    q_ref[...] = jnp.sum(x * x, axis=(1, 2)).reshape(1, 1, 1, C)


def _norm_kernel(x_ref, a_ref, b_ref, o_ref, *, apply_silu: bool):
    x = x_ref[...].astype(jnp.float32)
    h = x * a_ref[...][:, :, None, :] + b_ref[...][:, :, None, :]  # (1,1,C)
    if apply_silu:
        h = h * jax.nn.sigmoid(h)
    o_ref[...] = h.astype(o_ref.dtype)


def group_stats_affine(x: Array, scale: Array, bias: Array,
                       num_groups: int, eps: float = 1e-5,
                       film_scale: Optional[Array] = None,
                       film_shift: Optional[Array] = None,
                       interpret: bool = False,
                       pre_shift: Optional[Array] = None):
    """(A, B) per-(example, channel) fp32 affine such that
    GN(x + pre_shift)*(1+film_scale)+film_shift == x*A + B.

    One Pallas stats pass (partial sums per row-tile) + a tiny XLA combine.
    Shared by the tiled-GN normalize pass and the halo-fused conv
    (ops/halo_conv.py), which consume A/B instead of re-deriving stats.

    pre_shift (N, C): a per-(example, channel) additive shift applied
    BEFORE the GroupNorm — the DDPM blocks' timestep-embedding add
    (ref unet_ddpm.py:107-110). Its effect on the statistics is exact
    channel algebra (sum += HW*t, sumsq += 2*t*sum + HW*t^2) and its
    residual lands in B (x*A + (B + t*A) == (x+t)*A + B), so the halo
    kernel never materializes x + t.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, C = x.shape
    G = num_groups
    th = _pick_tile(H, W, C)
    T = H // th

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(N, T),
        in_specs=[pl.BlockSpec((1, th, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            # (N,T,1,C): the tiled dim must not be among the last two
            # (Mosaic requires those divisible by (8,128) or full)
            pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((N, T, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((N, T, 1, C), jnp.float32)),
        interpret=interpret,
    )(x)

    # tiny XLA combine: (N,C) -> group stats -> per-channel affine
    n_per_group = H * W * (C // G)
    s_c = sums.sum(axis=(1, 2))                  # (N, C)
    q_c = sqs.sum(axis=(1, 2))
    s_g = s_c.reshape(N, G, C // G).sum(-1)      # (N, G)
    q_g = q_c.reshape(N, G, C // G).sum(-1)
    mean_g = s_g / n_per_group
    var_g = q_g / n_per_group - mean_g * mean_g
    if pre_shift is not None:
        # cancellation-free shift algebra: folding t into the raw sums
        # (sumsq += 2t*sum + HW*t^2) loses ~|t|^2/var(x) relative digits
        # in fp32; instead adjust the group moments directly:
        #   mean' = mean + E[t],  var' = var + 2 cov(x,t) + var(t)
        sh = pre_shift.astype(jnp.float32)
        t_mean_g = sh.reshape(N, G, C // G).mean(-1)
        xt_g = (sh * s_c).reshape(N, G, C // G).sum(-1) / n_per_group
        t2_g = (sh * sh).reshape(N, G, C // G).sum(-1) * (H * W) \
            / n_per_group
        var_g = var_g + 2.0 * (xt_g - mean_g * t_mean_g) \
            + (t2_g - t_mean_g * t_mean_g)
        mean_g = mean_g + t_mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, C // G, axis=-1)  # (N, C)
    rstd_c = jnp.repeat(rstd_g, C // G, axis=-1)

    sc = scale.astype(jnp.float32)[None, :]
    bc = bias.astype(jnp.float32)[None, :]
    A = rstd_c * sc
    B = bc - mean_c * A
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        A = A * fs
        B = B * fs + film_shift.astype(jnp.float32)
    if pre_shift is not None:
        B = B + sh * A
    return A, B


def group_norm_film_silu_tiled(x: Array, scale: Array, bias: Array,
                               num_groups: int, eps: float = 1e-5,
                               film_scale: Optional[Array] = None,
                               film_shift: Optional[Array] = None,
                               apply_silu: bool = True,
                               interpret: bool = False) -> Array:
    """silu(GN(x) * (1 + film_scale) + film_shift) in 2 reads + 1 write.

    x (N,H,W,C); scale/bias (C,); film_scale/film_shift (N,C) or None.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, C = x.shape
    th = _pick_tile(H, W, C)
    T = H // th
    A, B = group_stats_affine(x, scale, bias, num_groups, eps, film_scale,
                              film_shift, interpret=interpret)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, apply_silu=apply_silu),
        grid=(N, T),
        in_specs=[
            pl.BlockSpec((1, th, W, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # A/B as (N,1,C): batch must not be among the last two dims
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, A[:, None, :], B[:, None, :])
    return out


def group_norm_film_silu_reference(x: Array, scale: Array, bias: Array,
                                   num_groups: int, eps: float = 1e-5,
                                   film_scale: Optional[Array] = None,
                                   film_shift: Optional[Array] = None,
                                   apply_silu: bool = True) -> Array:
    """jnp reference (fp32 stats, same affine folding); the vjp backward."""
    from diffpure_tpu.ops.groupnorm import group_norm

    h = group_norm(x, scale.astype(x.dtype), bias.astype(x.dtype),
                   num_groups, eps).astype(jnp.float32)
    if film_scale is not None:
        h = h * (1.0 + film_scale.astype(jnp.float32)[:, None, None, :]) \
            + film_shift.astype(jnp.float32)[:, None, None, :]
    if apply_silu:
        h = h * jax.nn.sigmoid(h)
    return h.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7, 8))
def group_norm_film_silu(x: Array, scale: Array, bias: Array,
                         num_groups: int, eps: float,
                         film_scale: Optional[Array],
                         film_shift: Optional[Array],
                         apply_silu: bool = True,
                         interpret: bool = False) -> Array:
    return group_norm_film_silu_tiled(
        x, scale, bias, num_groups, eps, film_scale, film_shift,
        apply_silu=apply_silu, interpret=interpret)


def _gnfs_fwd(x, scale, bias, num_groups, eps, film_scale, film_shift,
              apply_silu, interpret):
    out = group_norm_film_silu_tiled(
        x, scale, bias, num_groups, eps, film_scale, film_shift,
        apply_silu=apply_silu, interpret=interpret)
    return out, (x, scale, bias, film_scale, film_shift)


def _gnfs_bwd(num_groups, eps, apply_silu, interpret, res, g):
    x, scale, bias, film_scale, film_shift = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, fs, fh: group_norm_film_silu_reference(
            xx, ss, bb, num_groups, eps, fs, fh, apply_silu=apply_silu),
        x, scale, bias, film_scale, film_shift)
    return vjp(g)


group_norm_film_silu.defvjp(_gnfs_fwd, _gnfs_bwd)
