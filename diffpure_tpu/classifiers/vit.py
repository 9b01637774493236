"""Vision Transformer (DeiT-S) classifier, timm-checkpoint-compatible.

The reference loads deit_small_patch16_224 via torch.hub (ref utils.py:171-174)
for ImageNet evaluation. Flax reimplementation with timm state-dict naming:
patch_embed.proj, cls_token, pos_embed, blocks.{i}.{norm1,attn.qkv,attn.proj,
norm2,mlp.fc1,mlp.fc2}, norm, head.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MHSA(nn.Module):
    """timm-style attention: packed qkv dense, per-head softmax."""
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, T, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, T, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = head_dim ** -0.5
        w = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(C, name="proj")(out.reshape(B, T, C))


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + MHSA(self.num_heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp_fc2")(h)
        return x + h


class ViT(nn.Module):
    """DeiT/ViT with cls token and learned position embeddings."""
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        B, H_in = x.shape[0], x.shape[1]
        n_patches = (self.image_size // self.patch_size) ** 2
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed_proj")(x)
        grid_in = H_in // self.patch_size
        x = x.reshape(B, grid_in * grid_in, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n_patches + 1, self.embed_dim))
        if grid_in * grid_in != n_patches:
            # dynamic input size (the ImageNet purifier hands the classifier
            # 256px images, ref eval_sde_adv.py:75-89 never resizes back):
            # bicubically resample the positional grid, timm-style
            g0 = int(n_patches ** 0.5)
            grid_pos = pos[:, 1:].reshape(1, g0, g0, self.embed_dim)
            grid_pos = jax.image.resize(
                grid_pos, (1, grid_in, grid_in, self.embed_dim), "bicubic")
            pos = jnp.concatenate(
                [pos[:, :1],
                 grid_pos.reshape(1, grid_in * grid_in, self.embed_dim)],
                axis=1)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)), x],
                            axis=1)
        x = x + pos
        for i in range(self.depth):
            x = ViTBlock(self.num_heads, self.mlp_ratio, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(x[:, 0])


def deit_small_config() -> dict:
    """deit_small_patch16_224 (ref utils.py:171-174)."""
    return dict(image_size=224, patch_size=16, embed_dim=384, depth=12,
                num_heads=6, mlp_ratio=4.0, num_classes=1000)
