"""Blockwise (flash-style) attention Pallas kernel.

The ImageNet-256 ADM config attends at downsample factors 8/16/32, i.e.
32x32 = **1024-token** sequences at most (ref
guided_diffusion/script_util.py:170-172, attention_resolutions "32,16,8"
with image_size 256); models/adm_unet.py engages this kernel at
>= 1024 tokens. Materializing the (T, T) score matrix there costs
T^2 x heads x batch floats of HBM traffic per block; this kernel keeps
the online-softmax running state (m, l, acc) in VMEM and never writes the
score matrix — a memory optimization, not a parallelism one (no
cross-chip attention sharding is warranted at these sizes; the 4096-token
figure previously quoted here, inherited from SURVEY.md §5.7, was wrong —
pinned by tests/test_flash_attention.py::test_imagenet256_token_counts).

Layout: q, k, v are (BH, T, D) — batch*heads flattened into the grid's
first axis; D = head channels (64 for ADM -> padded to 128 lanes by Mosaic).
The softmax accumulates in fp32 regardless of input dtype (matches
ops/attention.py semantics, ref unet.py:358).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, T, D); o_ref: (1, block_q, D)
    q = q_ref[0].astype(jnp.float32) * scale
    T = k_ref.shape[1]
    D = q.shape[1]
    block_q = q.shape[0]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk * scale,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, T // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool = False) -> Array:
    """softmax(q kᵀ · scale²) v without materializing the score matrix.

    q, k, v: (BH, T, D). `scale` is applied to BOTH q and k (the ADM
    1/sqrt(sqrt(ch)) convention, ref unet.py:354-357).

    Differentiable: the ImageNet-256 white-box protocol takes gradients
    THROUGH the ADM purifier (ref eval_sde_adv.py:103-110 with
    --diffusion_type sde), so this kernel carries a custom VJP. The
    backward recomputes exact softmax attention in fp32 and differentiates
    it, chunked over the batch*head axis (lax.map over slabs of <= 32
    heads) so the transiently materialized (chunk, T, T) score tensor
    stays bounded regardless of attack batch size; the forward stays the
    online-softmax Pallas kernel.
    """
    block_q = min(block_q, q.shape[1])
    block_k = min(block_k, q.shape[1])
    return _flash_attention(q, k, v, scale, block_q, block_k, interpret)


def _reference_attention(q: Array, k: Array, v: Array,
                         scale: float) -> Array:
    """Exact-softmax semantics of the kernel (fp32 accumulation, output
    cast to q.dtype) — the differentiation target for the custom VJP and
    the oracle in tests/test_flash_attention.py."""
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32) * scale
    s = jnp.einsum("btd,bsd->bts", qf, kf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bts,bsd->btd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q: Array, k: Array, v: Array, scale: float,
                     block_q: int, block_k: int,
                     interpret: bool) -> Array:
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _largest_divisor_leq(n: int, cap: int) -> int:
    for c in range(min(n, cap), 0, -1):
        if n % c == 0:
            return c
    return 1


def _flash_vjp_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    BH = q.shape[0]

    def dense_vjp(args):
        q_, k_, v_, g_ = args
        _, vjp = jax.vjp(
            lambda a, b, c: _reference_attention(a, b, c, scale),
            q_, k_, v_)
        return vjp(g_)

    chunk = _largest_divisor_leq(BH, 32)
    if chunk == BH:
        return dense_vjp((q, k, v, g))
    # bound the transient (chunk, T, T) score tensor: lax.map over slabs
    shaped = lambda t: t.reshape(BH // chunk, chunk, *t.shape[1:])
    dq, dk, dv = jax.lax.map(dense_vjp,
                             (shaped(q), shaped(k), shaped(v), shaped(g)))
    unshape = lambda t: t.reshape(BH, *t.shape[2:])
    return unshape(dq), unshape(dk), unshape(dv)


_flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _flash_forward(q: Array, k: Array, v: Array, scale: float,
                   block_q: int, block_k: int,
                   interpret: bool) -> Array:
    BH, T, D = q.shape
    assert T % block_q == 0 and T % block_k == 0, (T, block_q, block_k)

    grid = (BH, T // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def qkv_flash_attention(qkv: Array, n_heads: int, order: str = "legacy",
                        interpret: bool = False) -> Array:
    """Drop-in for ops.attention.qkv_attention using the flash kernel.

    qkv: (B, T, 3*H*ch) packed as in the ADM checkpoints.
    """
    B, T, width = qkv.shape
    ch = width // (3 * n_heads)
    if order == "legacy":
        qkv_r = qkv.reshape(B, T, n_heads, 3 * ch)
        q, k, v = jnp.split(qkv_r, 3, axis=-1)
    elif order == "new":
        qkv_r = qkv.reshape(B, T, 3, n_heads, ch)
        q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    else:
        raise ValueError(order)
    # (B, T, H, ch) -> (B*H, T, ch)
    to_bh = lambda t: t.transpose(0, 2, 1, 3).reshape(B * n_heads, T, ch)
    scale = 1.0 / (ch ** 0.25)
    out = flash_attention(to_bh(q), to_bh(k), to_bh(v), scale,
                          interpret=interpret)
    out = out.reshape(B, n_heads, T, ch).transpose(0, 2, 1, 3)
    return out.reshape(B, T, n_heads * ch)
