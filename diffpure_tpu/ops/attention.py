"""Self-attention primitives for the diffusion UNets.

Three attention formulations exist in the reference and must match
numerically (SURVEY.md §7.1):
  - NCSN++ AttnBlockpp / DDPM AttnBlock: single-head over spatial positions,
    scale C^-0.5 applied AFTER the QK product (ref layerspp.py:82-86,
    ddpm/unet_ddpm.py:172-197 — identical math, different einsum spelling).
  - ADM QKVAttentionLegacy: heads split BEFORE qkv split; channel layout
    [h0(q,k,v), h1(q,k,v), ...]; scale 1/sqrt(sqrt(ch)) applied to BOTH q and
    k before the product, softmax in fp32 (ref guided_diffusion/unet.py:336-362).
  - ADM QKVAttention ("new order"): qkv split before heads; layout
    [q(all heads), k(all), v(all)] (ref unet.py:369-397).

All are expressed as batched matmuls (MXU) with fp32 softmax — XLA fuses the
scale/softmax chain; sequence lengths here are <= 32*32 = 1024 (the
ImageNet-256 config attends at ds 8/16/32, ref script_util.py:170-172), so a
flash-style Pallas kernel is a memory optimization, not a parallelism one;
one is provided for the >=1024-token ADM blocks (ops/flash_attention.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _softmax_f32(w: Array) -> Array:
    """Softmax over the last axis in float32, cast back (ref unet.py:358)."""
    dtype = w.dtype
    return jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(dtype)


def spatial_attention(q: Array, k: Array, v: Array) -> Array:
    """Single-head spatial self-attention over NHWC feature maps.

    w[b,p,p'] = softmax_p'( <q_bp, k_bp'> * C^-0.5 );  out = w @ v.
    Matches NCSN++'s bchw,bcij einsum form and DDPM's bmm form
    (ref layerspp.py:82-86, unet_ddpm.py:172-192).
    """
    N, H, W, C = q.shape
    q2 = q.reshape(N, H * W, C)
    k2 = k.reshape(N, H * W, C)
    v2 = v.reshape(N, H * W, C)
    w = jnp.einsum("bpc,bqc->bpq", q2, k2,
                   preferred_element_type=jnp.float32) * (int(C) ** (-0.5))
    w = _softmax_f32(w.astype(q.dtype))
    out = jnp.einsum("bpq,bqc->bpc", w, v2, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(N, H, W, C)


def qkv_attention(qkv: Array, n_heads: int, order: str = "legacy") -> Array:
    """Multi-head attention on a packed qkv tensor.

    Args:
      qkv: (B, T, 3 * n_heads * ch) packed projections. Channel layout depends
        on `order`:
          'legacy': heads-major, [h0q,h0k,h0v, h1q,...] (ref unet.py:336-362)
          'new':    qkv-major, [q_allheads, k_allheads, v_allheads]
                    (ref unet.py:369-397)
      n_heads: number of heads.

    Returns: (B, T, n_heads * ch).
    """
    B, T, width = qkv.shape
    assert width % (3 * n_heads) == 0, (width, n_heads)
    ch = width // (3 * n_heads)
    if order == "legacy":
        qkv = qkv.reshape(B, T, n_heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, T, heads, ch)
    elif order == "new":
        qkv = qkv.reshape(B, T, 3, n_heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        raise ValueError(order)

    scale = 1.0 / (ch ** 0.25)  # applied to both q and k (ref unet.py:354-357)
    w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    w = _softmax_f32(w)
    a = jnp.einsum("bhts,bshc->bthc", w, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return a.reshape(B, T, n_heads * ch)
