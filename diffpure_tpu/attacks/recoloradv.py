"""ReColorAdv: functional color-space perturbations.

JAX rebuild of the vendored recoloradv subsystem (ref stadv_eot/recoloradv/
{color_spaces.py:1-272, color_transformers.py:1-379, perturbations.py:129,
norms.py:51}; vendored by the reference but unused at DiffPure runtime —
kept for API parity). A perturbation re-colors every pixel with a smooth
function of its original color: either an affine color map or a full 3D
lattice (LUT) with trilinear interpolation, optimized under a smoothness
norm, optionally in a perceptual color space.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from diffpure_tpu.attacks.perturbations import Perturbation, batchwise_norm

Array = jax.Array


# --- color spaces (ref color_spaces.py) -------------------------------------

class RGBColorSpace:
    """Identity (ref color_spaces.py RGBColorSpace)."""

    def from_rgb(self, x: Array) -> Array:
        return x

    def to_rgb(self, x: Array) -> Array:
        return jnp.clip(x, 0.0, 1.0)


class YPbPrColorSpace:
    """ITU-R BT.601 YPbPr, shifted to [0,1]^3 (ref color_spaces.py
    YPbPrColorSpace)."""

    KR, KG, KB = 0.299, 0.587, 0.114

    def from_rgb(self, x: Array) -> Array:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = self.KR * r + self.KG * g + self.KB * b
        pb = (b - y) / (2 * (1 - self.KB))
        pr = (r - y) / (2 * (1 - self.KR))
        return jnp.stack([y, pb + 0.5, pr + 0.5], axis=-1)

    def to_rgb(self, x: Array) -> Array:
        y, pb, pr = x[..., 0], x[..., 1] - 0.5, x[..., 2] - 0.5
        b = pb * 2 * (1 - self.KB) + y
        r = pr * 2 * (1 - self.KR) + y
        g = (y - self.KR * r - self.KB * b) / self.KG
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


# --- color transformations (ref color_transformers.py) ----------------------

@dataclasses.dataclass(frozen=True)
class AffineColorTransform:
    """c' = A c + b per example (ref color_transformers.py AffineTransform)."""

    def identity_params(self, x: Array) -> Array:
        N = x.shape[0]
        theta = jnp.zeros((N, 3, 4))
        return theta.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0).at[:, 2, 2].set(1.0)

    def apply(self, theta: Array, x: Array) -> Array:
        A = theta[:, :, :3]
        b = theta[:, :, 3]
        return jnp.einsum("nij,nhwj->nhwi", A, x) + b[:, None, None, :]

    def smoothness_norm(self, theta: Array) -> Array:
        ident = self.identity_params(theta[:, :1, :1] * 0
                                     + jnp.zeros((theta.shape[0], 1, 1, 3)))
        return batchwise_norm(theta - ident, 2)


@dataclasses.dataclass(frozen=True)
class FullSpatialColorTransform:
    """3D color lattice (LUT) with trilinear interpolation
    (ref color_transformers.py FullSpatial). Params: (N, R, R, R, 3) —
    output color at each lattice point; identity = the lattice itself."""
    resolution: int = 8

    def identity_params(self, x: Array) -> Array:
        N = x.shape[0]
        R = self.resolution
        g = jnp.linspace(0.0, 1.0, R)
        gr, gg, gb = jnp.meshgrid(g, g, g, indexing="ij")
        lattice = jnp.stack([gr, gg, gb], axis=-1)  # (R,R,R,3)
        return jnp.broadcast_to(lattice[None], (N, R, R, R, 3))

    def apply(self, lut: Array, x: Array) -> Array:
        """Trilinear LUT lookup per pixel."""
        N, H, W, _ = x.shape
        R = self.resolution
        pos = jnp.clip(x, 0.0, 1.0) * (R - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        lo = jnp.clip(lo, 0, R - 2)
        frac = pos - lo

        def gather(dr, dg, db):
            idx_r = lo[..., 0] + dr
            idx_g = lo[..., 1] + dg
            idx_b = lo[..., 2] + db
            batch = jax.lax.broadcasted_iota(jnp.int32, idx_r.shape, 0)
            return lut[batch, idx_r, idx_g, idx_b]  # (N,H,W,3)

        out = 0.0
        for dr in (0, 1):
            wr = frac[..., 0:1] if dr else 1 - frac[..., 0:1]
            for dg in (0, 1):
                wg = frac[..., 1:2] if dg else 1 - frac[..., 1:2]
                for db in (0, 1):
                    wb = frac[..., 2:3] if db else 1 - frac[..., 2:3]
                    out = out + gather(dr, dg, db) * (wr * wg * wb)
        return out

    def smoothness_norm(self, lut: Array) -> Array:
        """TV over lattice neighbors (ref norms.py smoothness)."""
        ident = self.identity_params(
            jnp.zeros((lut.shape[0], 1, 1, 3)))
        d = lut - ident
        total = jnp.zeros(lut.shape[0])
        for axis in (1, 2, 3):
            diff = jnp.diff(d, axis=axis)
            total = total + jnp.sqrt(
                jnp.sum(diff.reshape(diff.shape[0], -1) ** 2, -1) + 1e-10)
        return total


# --- the perturbation (ref perturbations.py:129) -----------------------------

@dataclasses.dataclass(frozen=True)
class ReColorAdv(Perturbation):
    """Color perturbation in a chosen color space with an linf bound on the
    per-color displacement (ref perturbations.py:129-220)."""
    xform: object = dataclasses.field(default_factory=FullSpatialColorTransform)
    color_space: object = dataclasses.field(default_factory=RGBColorSpace)
    lp_bound: float = 0.06

    def init_params(self, x):
        return self.xform.identity_params(self.color_space.from_rgb(x))

    def apply(self, params, x):
        c = self.color_space.from_rgb(x)
        c2 = self.xform.apply(params, c)
        return self.color_space.to_rgb(c2)

    def project(self, params, x):
        ident = self.xform.identity_params(self.color_space.from_rgb(x))
        return jnp.clip(params, ident - self.lp_bound, ident + self.lp_bound)

    def norm(self, params, x, lp=2):
        return self.xform.smoothness_norm(params)
