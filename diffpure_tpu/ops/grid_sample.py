"""Bilinear grid sampling with torch F.grid_sample semantics.

Used by the StAdv flow-field attack (ref stadv_eot/recoloradv/mister_ed/
spatial_transformers.py:289-291). Semantics: align_corners=False, zeros
padding, NHWC input, grid (N, H, W, 2) in normalized [-1, 1] coords with
grid[..., 0] = x (width) and grid[..., 1] = y (height), matching torch.
Implemented as four gathers + lerp — XLA fuses this into a single
gather-heavy kernel; fully differentiable w.r.t. both input and grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def identity_grid(N: int, H: int, W: int) -> Array:
    """Identity sampling grid (torch affine_grid(align_corners=False))."""
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
    return jnp.broadcast_to(grid[None], (N, H, W, 2))


def grid_sample(x: Array, grid: Array) -> Array:
    """Bilinear sample x (N,H,W,C) at grid (N,Hg,Wg,2); zeros padding."""
    N, H, W, C = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    # unnormalize (align_corners=False)
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1
    iy1 = iy0 + 1
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        valid = ((ix_ >= 0) & (ix_ <= W - 1) & (iy_ >= 0) & (iy_ <= H - 1))
        ixc = jnp.clip(ix_, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_, 0, H - 1).astype(jnp.int32)
        batch = jax.lax.broadcasted_iota(jnp.int32, ixc.shape, 0)
        vals = x[batch, iyc, ixc]  # (N, Hg, Wg, C)
        return vals * valid[..., None].astype(x.dtype)

    out = (gather(iy0, ix0) * (wy0 * wx0)[..., None]
           + gather(iy0, ix1) * (wy0 * wx1)[..., None]
           + gather(iy1, ix0) * (wy1 * wx0)[..., None]
           + gather(iy1, ix1) * (wy1 * wx1)[..., None])
    return out
