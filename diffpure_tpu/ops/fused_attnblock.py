"""Fused NCSN++ attention block as a single Pallas TPU kernel.

AttnBlockpp (ref score_sde/models/layerspp.py:62-91) under XLA traverses
its feature map in HBM ~10x (GN stats+normalize, 4 NIN matmuls, two
attention einsums, softmax, skip add). At DiffPure's shapes the whole
per-example map is tiny (16x16x256 = 256 KB fp32), so the entire block fits
in VMEM per batch-tile: one HBM read of x, one write of the output.

Per grid step (bt examples): GN via one-hot-group matmuls -> q,k,v,out
projections as (bt*HW, C) @ (C, C) MXU matmuls -> per-example attention
scores (HW, HW) with fp32 softmax -> skip add (* 1/sqrt(2) when rescaled).

Gradients: custom_vjp whose backward is XLA autodiff of the equivalent jnp
reference — attack paths differentiate through it unchanged.
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
    """Built from iota in-kernel to avoid per-call jaxpr constants (see
    ops/fused_resblock.py)."""
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    return ((c_ids // (C // G)) == g_ids).astype(jnp.float32)


def _attn_kernel(x_ref, gns_ref, gnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                 wv_ref, bv_ref, wo_ref, bo_ref, o_ref, *,
                 eps: float, rescale: bool, H: int, W: int, C: int, bt: int,
                 G: int, compute_dtype):
    hw = H * W
    x32 = x_ref[...].astype(jnp.float32).reshape(bt, hw, C)

    # GroupNorm via one-hot matmuls (fp32 stats)
    M = _group_onehot_inkernel(C, G)
    MT = M.T
    n = float(hw * C // G)
    sums = jnp.sum(x32, axis=1)                  # (bt, C)
    sqs = jnp.sum(x32 * x32, axis=1)
    g_sum = jnp.dot(sums, M, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(sqs, M, preferred_element_type=jnp.float32)
    mean_g = g_sum / n
    var_g = g_sq / n - mean_g * mean_g
    mean_c = jnp.dot(mean_g, MT, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), MT,
                     preferred_element_type=jnp.float32)
    h = (x32 - mean_c[:, None, :]) * rstd_c[:, None, :]
    h = h * gns_ref[0][None, None, :] + gnb_ref[0][None, None, :]
    h2 = h.reshape(bt * hw, C).astype(compute_dtype)

    def nin(w_ref, b_ref):
        return (jnp.dot(h2, w_ref[...].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
                + b_ref[0][None, :]).reshape(bt, hw, C)

    q = nin(wq_ref, bq_ref)
    k = nin(wk_ref, bk_ref)
    v = nin(wv_ref, bv_ref)

    scale = float(int(C) ** (-0.5))
    outs = []
    for b in range(bt):  # static unroll; bt is small
        s = jnp.dot(q[b].astype(compute_dtype),
                    k[b].astype(compute_dtype).T,
                    preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(compute_dtype),
                            v[b].astype(compute_dtype),
                            preferred_element_type=jnp.float32))
    a = jnp.stack(outs, axis=0)  # (bt, hw, C)

    o = (jnp.dot(a.reshape(bt * hw, C).astype(compute_dtype),
                 wo_ref[...].astype(compute_dtype),
                 preferred_element_type=jnp.float32)
         + bo_ref[0][None, :]).reshape(bt, hw, C)

    out = x32 + o
    if rescale:
        out = out * INV_SQRT2
    o_ref[...] = out.reshape(bt, H, W, C).astype(o_ref.dtype)


def _pick_bt(N: int, H: int, W: int, C: int,
             budget: int = 8 * 1024 * 1024) -> int:
    hw = H * W
    per_ex = hw * C * 4 * 6 + hw * hw * 4 * 2
    for bt in (8, 4, 2, 1):
        if N % bt == 0 and bt * per_ex <= budget:
            return bt
    return 1


def fused_attnblock_pallas(x: Array, params: Tuple, *, num_groups: int,
                           eps: float = 1e-6, rescale: bool = True,
                           interpret: bool = False) -> Array:
    """params = (gn_scale, gn_bias, Wq, bq, Wk, bk, Wv, bv, Wout, bout);
    all W are (C, C) NIN matrices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (gns, gnb, wq, bq, wk, bk, wv, bv, wo, bo) = params
    N, H, W, C = x.shape
    compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    bt = _pick_bt(N, H, W, C)
    f32 = jnp.float32

    kernel = functools.partial(_attn_kernel, eps=eps, rescale=rescale,
                               H=H, W=W, C=C, bt=bt, G=num_groups,
                               compute_dtype=compute_dtype)

    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    cvec = lambda: full(1, C)  # noqa: E731

    out = pl.pallas_call(
        kernel,
        grid=(N // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cvec(), cvec(),
            full(C, C), cvec(), full(C, C), cvec(),
            full(C, C), cvec(), full(C, C), cvec(),
        ],
        out_specs=pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x,
      gns.astype(f32).reshape(1, C), gnb.astype(f32).reshape(1, C),
      wq, bq.astype(f32).reshape(1, C), wk, bk.astype(f32).reshape(1, C),
      wv, bv.astype(f32).reshape(1, C), wo, bo.astype(f32).reshape(1, C))
    return out


def fused_attnblock_reference(x: Array, params: Tuple, *, num_groups: int,
                              eps: float = 1e-6, rescale: bool = True
                              ) -> Array:
    """jnp reference with the kernel's numerics; the custom_vjp backward."""
    from diffpure_tpu.ops.groupnorm import group_norm

    (gns, gnb, wq, bq, wk, bk, wv, bv, wo, bo) = params
    N, H, W, C = x.shape
    hw = H * W
    cdt = x.dtype
    h = group_norm(x.astype(jnp.float32), gns, gnb, num_groups, eps)
    h2 = h.reshape(N, hw, C).astype(cdt)

    # einsums run in the compute dtype then upcast (mixed-dtype
    # preferred_element_type contractions are not transposable under vjp)
    def nin(w, b):
        return (jnp.einsum("npc,cd->npd", h2,
                           w.astype(cdt)).astype(jnp.float32)
                + b.astype(jnp.float32))

    q, k, v = nin(wq, bq), nin(wk, bk), nin(wv, bv)
    s = jnp.einsum("npc,nqc->npq", q.astype(cdt),
                   k.astype(cdt)).astype(jnp.float32) * float(C) ** (-0.5)
    p = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("npq,nqc->npc", p.astype(cdt),
                   v.astype(cdt)).astype(jnp.float32)
    o = (jnp.einsum("npc,cd->npd", a.astype(cdt),
                    wo.astype(cdt)).astype(jnp.float32)
         + bo.astype(jnp.float32))
    out = x.astype(jnp.float32) + o.reshape(N, H, W, C)
    if rescale:
        out = out * INV_SQRT2
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_attnblock(x: Array, params: Tuple, num_groups: int,
                    eps: float = 1e-6, rescale: bool = True,
                    interpret: bool = False) -> Array:
    return fused_attnblock_pallas(x, params, num_groups=num_groups, eps=eps,
                                  rescale=rescale, interpret=interpret)


def _fab_fwd(x, params, num_groups, eps, rescale, interpret):
    out = fused_attnblock_pallas(x, params, num_groups=num_groups, eps=eps,
                                 rescale=rescale, interpret=interpret)
    return out, (x, params)


def _fab_bwd(num_groups, eps, rescale, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda xx, pp: fused_attnblock_reference(
            xx, pp, num_groups=num_groups, eps=eps, rescale=rescale),
        x, params)
    return vjp(g)


fused_attnblock.defvjp(_fab_fwd, _fab_bwd)
