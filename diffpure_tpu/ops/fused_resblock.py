"""Fused BigGAN residual block as a single Pallas TPU kernel.

The NCSN++ hot path (ref score_sde/models/layerspp.py:212-271) is
HBM-bandwidth-bound under XLA: GN stats, normalize+SiLU, two convs, the temb
broadcast and the skip add each traverse the full feature map in HBM
(~12-14 traversals per block; measured 38 GB/eval at batch 128 = 100% of
the v5e bandwidth roofline, docs/PERF.md). This kernel keeps the whole block
in VMEM per batch-tile: one read of x, one write of the output, weights
streamed once per tile.

Structure per grid step (bt examples, full spatial map):
  GN1 stats via one-hot-group matmuls (lane dim stays intact) -> normalize
  + SiLU -> 3x3 conv as 9 shifted (bt*H*W, Cin) @ (Cin, Cout) MXU matmuls
  accumulated in fp32 -> + bias + temb row -> GN2 + SiLU -> second conv ->
  + bias -> optional 1x1-conv skip projection -> (skip + h) * scale.

Eval-mode only (dropout is identity at eval; ref applies dropout between
GN2 and conv1). Gradients: custom_vjp whose backward is XLA autodiff of the
numerically-equivalent jnp reference (fused_resblock_reference) — attack
paths differentiate through it unchanged.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

INV_SQRT2 = float(1.0 / np.sqrt(2.0))


def _group_onehot_inkernel(C: int, G: int):
    """One-hot group-membership matrix built in-kernel from iota: passing it
    as an operand would bake a per-call jaxpr constant (70 blocks x ~64 KB,
    enough to blow remote-compile upload limits on gradient graphs)."""
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    return ((c_ids // (C // G)) == g_ids).astype(jnp.float32)


def _gn_silu_inkernel(x32, scale, bias, C, G, n, eps):
    """GroupNorm (+SiLU) on an fp32 (bt, H, W, C) VMEM tensor via one-hot
    matmuls; returns fp32."""
    M = _group_onehot_inkernel(C, G)
    MT = M.T
    sums = jnp.sum(x32, axis=(1, 2))            # (bt, C)
    sqs = jnp.sum(x32 * x32, axis=(1, 2))       # (bt, C)
    g_sum = jnp.dot(sums, M, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(sqs, M, preferred_element_type=jnp.float32)
    mean_g = g_sum / n
    var_g = g_sq / n - mean_g * mean_g
    mean_c = jnp.dot(mean_g, MT, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), MT,
                     preferred_element_type=jnp.float32)
    h = (x32 - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    h = h * scale[None, None, None, :] + bias[None, None, None, :]
    return h * jax.nn.sigmoid(h)


def _conv3x3_inkernel(pad_ref, h, w9, bt, H, W, cin, cout, compute_dtype):
    """3x3 SAME conv via 9 shifted matmuls; pad_ref is a zeroed
    (bt, H+2, W+2, cin) VMEM scratch. Returns fp32 (bt, H, W, cout)."""
    pad_ref[:, 1:H + 1, 1:W + 1, :] = h.astype(compute_dtype)
    acc = jnp.zeros((bt, H, W, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = pad_ref[:, dy:dy + H, dx:dx + W, :]
            win2 = win.reshape(bt * H * W, cin)
            wk = w9[3 * dy + dx].astype(compute_dtype)
            acc = acc + jnp.dot(win2, wk,
                                preferred_element_type=jnp.float32
                                ).reshape(bt, H, W, cout)
    return acc


def _downsample2x_inkernel(x):
    """2x average pool via lane-merge reshape + major-dim split (stride-2
    slices lower to unsupported gathers in Mosaic)."""
    B, H, W, C = x.shape
    x2 = x.reshape(B, H, W // 2, 2 * C)          # adjacent W pairs -> lanes
    wp = 0.5 * (x2[..., :C] + x2[..., C:])
    x3 = wp.reshape(B, H // 2, 2, W // 2, C)
    return 0.5 * (x3[:, :, 0] + x3[:, :, 1])


def _upsample2x_inkernel(x):
    """2x nearest-neighbor via lane-interleave + major-dim stack."""
    B, H, W, C = x.shape
    xw = jnp.concatenate([x[..., None, :], x[..., None, :]], axis=-2)
    xw = xw.reshape(B, H, 2 * W, C)
    xh = jnp.concatenate([xw[:, :, None], xw[:, :, None]], axis=2)
    return xh.reshape(B, 2 * H, 2 * W, C)


def _fused_resblock_kernel(x_ref, temb_ref, gn1s_ref, gn1b_ref, w0_ref,
                           b0_ref, gn2s_ref, gn2b_ref, w1_ref, b1_ref,
                           wskip_ref, bskip_ref, o_ref, pad0_ref, pad1_ref,
                           *, eps: float, has_skip_proj: bool,
                           rescale: bool, H: int, W: int, cin: int,
                           cout: int, bt: int, g1: int, g2: int,
                           resample: str, compute_dtype):
    x32 = x_ref[...].astype(jnp.float32)

    # zero the conv halos once per grid step (scratch persists across steps)
    pad0_ref[...] = jnp.zeros_like(pad0_ref)
    pad1_ref[...] = jnp.zeros_like(pad1_ref)

    n1 = float(H * W * cin // g1)
    h = _gn_silu_inkernel(x32, gn1s_ref[0], gn1b_ref[0], cin, g1, n1, eps)
    # BigGAN resample order: GN1+SiLU, then resample h AND the skip input
    # (ref layerspp.py:224-236, naive up/down; fir handled unfused)
    if resample == "down":
        h = _downsample2x_inkernel(h)
        xs_base = _downsample2x_inkernel(x32)
        Ho, Wo = H // 2, W // 2
    elif resample == "up":
        h = _upsample2x_inkernel(h)
        xs_base = _upsample2x_inkernel(x32)
        Ho, Wo = H * 2, W * 2
    else:
        xs_base = x32
        Ho, Wo = H, W
    acc = _conv3x3_inkernel(pad0_ref, h, w0_ref, bt, Ho, Wo, cin, cout,
                            compute_dtype)
    acc = acc + b0_ref[0][None, None, None, :]
    acc = acc + temb_ref[...].astype(jnp.float32)[:, :, None, :]  # (bt,1,C)

    n2 = float(Ho * Wo * cout // g2)
    h2 = _gn_silu_inkernel(acc, gn2s_ref[0], gn2b_ref[0], cout, g2, n2,
                           eps)
    acc2 = _conv3x3_inkernel(pad1_ref, h2, w1_ref, bt, Ho, Wo, cout, cout,
                             compute_dtype)
    acc2 = acc2 + b1_ref[0][None, None, None, :]

    if has_skip_proj:
        xs2 = xs_base.astype(compute_dtype).reshape(bt * Ho * Wo, cin)
        xs = jnp.dot(xs2, wskip_ref[...].astype(compute_dtype),
                     preferred_element_type=jnp.float32
                     ).reshape(bt, Ho, Wo, cout)
        xs = xs + bskip_ref[0][None, None, None, :]
    else:
        xs = xs_base

    out = xs + acc2
    if rescale:
        out = out * INV_SQRT2
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_batch_tile(N: int, H: int, W: int, cin: int, cout: int,
                     vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest tile (<=8) dividing N whose fp32+bf16 working set fits."""
    per_ex = ((H + 2) * (W + 2) * (cin + cout) * 2        # pad scratches bf16
              + H * W * cin * 4 + 2 * H * W * cout * 4    # x32 + two accs
              + H * W * max(cin, cout) * 4)               # gn intermediate
    for bt in (8, 4, 2, 1):
        if N % bt == 0 and bt * per_ex <= vmem_budget:
            return bt
    return 1


def fused_resblock_pallas(x: Array, temb_row: Array, params: Tuple,
                          *, num_groups1: int, num_groups2: int,
                          eps: float = 1e-6, rescale: bool = True,
                          resample: str = "none",
                          interpret: bool = False) -> Array:
    """Raw Pallas call (no custom_vjp). params =
    (gn1_scale, gn1_bias, w0[3,3,cin,cout], b0, gn2_scale, gn2_bias,
     w1[3,3,cout,cout], b1, wskip[cin,cout] | None, bskip | None).
    resample: 'none' | 'up' | 'down' (naive 2x, BigGAN up/down blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (gn1s, gn1b, w0, b0, gn2s, gn2b, w1, b1, wskip, bskip) = params
    N, H, W, cin = x.shape
    cout = w0.shape[-1]
    has_skip_proj = wskip is not None
    compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32

    if resample == "down":
        Ho, Wo = H // 2, W // 2
    elif resample == "up":
        Ho, Wo = H * 2, W * 2
    else:
        Ho, Wo = H, W
    bt = _pick_batch_tile(N, max(H, Ho), max(W, Wo), cin, cout)

    w0_9 = w0.reshape(9, cin, cout)
    w1_9 = w1.reshape(9, cout, cout)
    if not has_skip_proj:
        wskip = jnp.zeros((1, cout), x.dtype)
        bskip = jnp.zeros((cout,), jnp.float32)

    f32 = jnp.float32
    kernel = functools.partial(
        _fused_resblock_kernel, eps=eps, has_skip_proj=has_skip_proj,
        rescale=rescale, H=H, W=W, cin=cin, cout=cout, bt=bt,
        g1=num_groups1, g2=num_groups2, resample=resample,
        compute_dtype=compute_dtype)

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — replicated operand
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(N // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (N, 1, cout): the batch-blocked dim must not be among the
            # last two (Mosaic requires those divisible by (8, 128))
            pl.BlockSpec((bt, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(1, cin), full(1, cin),
            full(9, cin, cout), full(1, cout),
            full(1, cout), full(1, cout),
            full(9, cout, cout), full(1, cout),
            full(*wskip.shape), full(1, cout),
        ],
        out_specs=pl.BlockSpec((bt, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, Ho + 2, Wo + 2, cin), compute_dtype),
            pltpu.VMEM((bt, Ho + 2, Wo + 2, cout), compute_dtype),
        ],
        interpret=interpret,
    )(x, temb_row.astype(x.dtype)[:, None, :],
      gn1s.astype(f32).reshape(1, cin), gn1b.astype(f32).reshape(1, cin),
      w0_9, b0.astype(f32).reshape(1, cout),
      gn2s.astype(f32).reshape(1, cout), gn2b.astype(f32).reshape(1, cout),
      w1_9, b1.astype(f32).reshape(1, cout),
      wskip, bskip.astype(f32).reshape(1, cout))
    return out


def fused_resblock_reference(x: Array, temb_row: Array, params: Tuple,
                             *, num_groups1: int, num_groups2: int,
                             eps: float = 1e-6, rescale: bool = True,
                             resample: str = "none") -> Array:
    """jnp reference with the kernel's exact numerics (fp32 accumulation,
    fp32 GN on the accumulator). Differentiable — the custom_vjp backward."""
    from diffpure_tpu.ops.groupnorm import group_norm
    from diffpure_tpu.ops.upfirdn2d import naive_downsample_2d, \
        naive_upsample_2d

    (gn1s, gn1b, w0, b0, gn2s, gn2b, w1, b1, wskip, bskip) = params
    cdt = x.dtype

    # convs run in the compute dtype then upcast (a mixed-dtype
    # preferred_element_type conv is not transposable under vjp); the one
    # numeric difference vs the kernel's fp32 accumulators is the bf16
    # rounding of each conv output — below test tolerance.
    h = group_norm(x.astype(jnp.float32), gn1s, gn1b, num_groups1, eps)
    h = h * jax.nn.sigmoid(h)
    if resample == "down":
        h = naive_downsample_2d(h, factor=2)
        x = naive_downsample_2d(x, factor=2)
    elif resample == "up":
        h = naive_upsample_2d(h, factor=2)
        x = naive_upsample_2d(x, factor=2)
    h = jax.lax.conv_general_dilated(
        h.astype(cdt), w0.astype(cdt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    h = h + b0.astype(jnp.float32)
    h = h + temb_row.astype(jnp.float32)[:, None, None, :]
    h = group_norm(h, gn2s, gn2b, num_groups2, eps)
    h = h * jax.nn.sigmoid(h)
    h = jax.lax.conv_general_dilated(
        h.astype(cdt), w1.astype(cdt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    h = h + b1.astype(jnp.float32)

    if wskip is not None:
        xs = jnp.einsum("nhwc,cd->nhwd", x.astype(cdt),
                        wskip.astype(cdt)).astype(jnp.float32)
        xs = xs + bskip.astype(jnp.float32)
    else:
        xs = x.astype(jnp.float32)
    out = xs + h
    if rescale:
        out = out * INV_SQRT2
    return out.astype(x.dtype)


def _fused_resblock_cat_kernel(x1_ref, x2_ref, temb_ref, gn1sa_ref,
                               gn1ba_ref, gn1sb_ref, gn1bb_ref,
                               w0_ref, b0_ref, gn2s_ref, gn2b_ref, w1_ref,
                               b1_ref, wskipa_ref, wskipb_ref, bskip_ref,
                               o_ref, pad0_ref,
                               pad1_ref, *, eps: float, rescale: bool,
                               H: int, W: int, c1: int, c2: int, cout: int,
                               bt: int, g1: int, g2: int, compute_dtype):
    """Concat-input variant: the UNet up path feeds concat(h, skip) into the
    block (ref ncsnpp.py:330); concatenating in VMEM saves the XLA
    materialization (one full write + read of the widest tensors per
    up-block). Requires c1 % 128 == 0 (lane-aligned seam) — true for every
    NCSN++ configuration (channels are nf multiples).
    """
    cin = c1 + c2
    x1 = x1_ref[...].astype(jnp.float32)
    x2 = x2_ref[...].astype(jnp.float32)

    pad0_ref[...] = jnp.zeros_like(pad0_ref)
    pad1_ref[...] = jnp.zeros_like(pad1_ref)

    # GN1 across the seam: global groups, per-part one-hot blocks.
    # Per-part stats/broadcasts go through per-part matmuls (lane-dim
    # slices of the broadcast vectors lower to unsupported gathers).
    M = _group_onehot_inkernel(cin, g1)
    Ma = M[:c1]   # (c1, G) — sublane slices are supported
    Mb = M[c1:]
    n1 = float(H * W * cin // g1)
    sums = jnp.dot(jnp.sum(x1, axis=(1, 2)), Ma,
                   preferred_element_type=jnp.float32) \
        + jnp.dot(jnp.sum(x2, axis=(1, 2)), Mb,
                  preferred_element_type=jnp.float32)
    sqs = jnp.dot(jnp.sum(x1 * x1, axis=(1, 2)), Ma,
                  preferred_element_type=jnp.float32) \
        + jnp.dot(jnp.sum(x2 * x2, axis=(1, 2)), Mb,
                  preferred_element_type=jnp.float32)
    mean_g = sums / n1
    var_g = sqs / n1 - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    def norm_part(xp, Mp, scale_p, bias_p):
        mean_p = jnp.dot(mean_g, Mp.T, preferred_element_type=jnp.float32)
        rstd_p = jnp.dot(rstd_g, Mp.T, preferred_element_type=jnp.float32)
        h = (xp - mean_p[:, None, None, :]) * rstd_p[:, None, None, :]
        h = h * scale_p[None, None, None, :] + bias_p[None, None, None, :]
        return h * jax.nn.sigmoid(h)

    pad0_ref[:, 1:H + 1, 1:W + 1, :c1] = norm_part(
        x1, Ma, gn1sa_ref[0], gn1ba_ref[0]).astype(compute_dtype)
    pad0_ref[:, 1:H + 1, 1:W + 1, c1:] = norm_part(
        x2, Mb, gn1sb_ref[0], gn1bb_ref[0]).astype(compute_dtype)

    acc = jnp.zeros((bt, H, W, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = pad0_ref[:, dy:dy + H, dx:dx + W, :]
            win2 = win.reshape(bt * H * W, cin)
            wk = w0_ref[3 * dy + dx].astype(compute_dtype)
            acc = acc + jnp.dot(win2, wk,
                                preferred_element_type=jnp.float32
                                ).reshape(bt, H, W, cout)
    acc = acc + b0_ref[0][None, None, None, :]
    acc = acc + temb_ref[...].astype(jnp.float32)[:, :, None, :]

    n2 = float(H * W * cout // g2)
    h2 = _gn_silu_inkernel(acc, gn2s_ref[0], gn2b_ref[0], cout, g2, n2, eps)
    acc2 = _conv3x3_inkernel(pad1_ref, h2, w1_ref, bt, H, W, cout, cout,
                             compute_dtype)
    acc2 = acc2 + b1_ref[0][None, None, None, :]

    # skip projection on the concat input, split at the seam
    xs = jnp.dot(x1_ref[...].astype(compute_dtype).reshape(bt * H * W, c1),
                 wskipa_ref[...].astype(compute_dtype),
                 preferred_element_type=jnp.float32) \
        + jnp.dot(x2_ref[...].astype(compute_dtype).reshape(bt * H * W, c2),
                  wskipb_ref[...].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    xs = xs.reshape(bt, H, W, cout) + bskip_ref[0][None, None, None, :]

    out = xs + acc2
    if rescale:
        out = out * INV_SQRT2
    o_ref[...] = out.astype(o_ref.dtype)


def fused_resblock_cat_pallas(x1: Array, x2: Array, temb_row: Array,
                              params: Tuple, *, num_groups1: int,
                              num_groups2: int, eps: float = 1e-6,
                              rescale: bool = True,
                              interpret: bool = False) -> Array:
    """Concat-input raw Pallas call; params as fused_resblock_pallas with
    w0 (3,3,c1+c2,cout) and wskip (c1+c2,cout) mandatory."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (gn1s, gn1b, w0, b0, gn2s, gn2b, w1, b1, wskip, bskip) = params
    N, H, W, c1 = x1.shape
    c2 = x2.shape[-1]
    cin = c1 + c2
    cout = w0.shape[-1]
    assert wskip is not None, "concat blocks always project the skip"
    compute_dtype = x1.dtype if x1.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    bt = _pick_batch_tile(N, H, W, cin, cout)

    w0_9 = w0.reshape(9, cin, cout)
    w1_9 = w1.reshape(9, cout, cout)
    f32 = jnp.float32

    kernel = functools.partial(
        _fused_resblock_cat_kernel, eps=eps, rescale=rescale, H=H, W=W,
        c1=c1, c2=c2, cout=cout, bt=bt, g1=num_groups1, g2=num_groups2,
        compute_dtype=compute_dtype)

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — replicated operand
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(N // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, W, c2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(1, c1), full(1, c1), full(1, c2), full(1, c2),
            full(9, cin, cout), full(1, cout),
            full(1, cout), full(1, cout),
            full(9, cout, cout), full(1, cout),
            full(c1, cout), full(c2, cout), full(1, cout),
        ],
        out_specs=pl.BlockSpec((bt, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), x1.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, H + 2, W + 2, cin), compute_dtype),
            pltpu.VMEM((bt, H + 2, W + 2, cout), compute_dtype),
        ],
        interpret=interpret,
    )(x1, x2, temb_row.astype(x1.dtype)[:, None, :],
      gn1s[:c1].astype(f32).reshape(1, c1),
      gn1b[:c1].astype(f32).reshape(1, c1),
      gn1s[c1:].astype(f32).reshape(1, c2),
      gn1b[c1:].astype(f32).reshape(1, c2),
      w0_9, b0.astype(f32).reshape(1, cout),
      gn2s.astype(f32).reshape(1, cout), gn2b.astype(f32).reshape(1, cout),
      w1_9, b1.astype(f32).reshape(1, cout),
      wskip[:c1], wskip[c1:], bskip.astype(f32).reshape(1, cout))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_resblock_cat(x1: Array, x2: Array, temb_row: Array, params: Tuple,
                       num_groups1: int, num_groups2: int,
                       eps: float = 1e-6, rescale: bool = True,
                       interpret: bool = False) -> Array:
    return fused_resblock_cat_pallas(
        x1, x2, temb_row, params, num_groups1=num_groups1,
        num_groups2=num_groups2, eps=eps, rescale=rescale,
        interpret=interpret)


def _frbc_fwd(x1, x2, temb_row, params, num_groups1, num_groups2, eps,
              rescale, interpret):
    out = fused_resblock_cat_pallas(
        x1, x2, temb_row, params, num_groups1=num_groups1,
        num_groups2=num_groups2, eps=eps, rescale=rescale,
        interpret=interpret)
    return out, (x1, x2, temb_row, params)


def _frbc_bwd(num_groups1, num_groups2, eps, rescale, interpret, res, g):
    x1, x2, temb_row, params = res

    def ref(xx1, xx2, tt, pp):
        return fused_resblock_reference(
            jnp.concatenate([xx1, xx2], axis=-1), tt, pp,
            num_groups1=num_groups1, num_groups2=num_groups2, eps=eps,
            rescale=rescale)

    _, vjp = jax.vjp(ref, x1, x2, temb_row, params)
    return vjp(g)


fused_resblock_cat.defvjp(_frbc_fwd, _frbc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_resblock(x: Array, temb_row: Array, params: Tuple,
                   num_groups1: int, num_groups2: int, eps: float = 1e-6,
                   rescale: bool = True, interpret: bool = False,
                   resample: str = "none") -> Array:
    return fused_resblock_pallas(x, temb_row, params,
                                 num_groups1=num_groups1,
                                 num_groups2=num_groups2, eps=eps,
                                 rescale=rescale, resample=resample,
                                 interpret=interpret)


def _frb_fwd(x, temb_row, params, num_groups1, num_groups2, eps, rescale,
             interpret, resample):
    out = fused_resblock_pallas(x, temb_row, params,
                                num_groups1=num_groups1,
                                num_groups2=num_groups2, eps=eps,
                                rescale=rescale, resample=resample,
                                interpret=interpret)
    return out, (x, temb_row, params)


def _frb_bwd(num_groups1, num_groups2, eps, rescale, interpret, resample,
             res, g):
    x, temb_row, params = res
    _, vjp = jax.vjp(
        lambda xx, tt, pp: fused_resblock_reference(
            xx, tt, pp, num_groups1=num_groups1, num_groups2=num_groups2,
            eps=eps, rescale=rescale, resample=resample),
        x, temb_row, params)
    return vjp(g)


fused_resblock.defvjp(_frb_fwd, _frb_bwd)
