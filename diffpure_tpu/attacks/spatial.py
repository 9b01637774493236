"""Parameterized spatial transformations for the perturbation framework.

JAX rebuild of mister_ed/spatial_transformers.py: FullSpatial (the StAdv
grid, ref :107-291), Affine (ref :296+), Rotation and Translation
(restricted affine). Each transform exposes identity_params / apply /
norm / stadv_norm / project over a params pytree.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffpure_tpu.attacks.perturbations import batchwise_norm
from diffpure_tpu.ops.grid_sample import grid_sample, identity_grid

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FullSpatial:
    """Params are the full sampling grid (N,H,W,2) (ref :107-144)."""

    def identity_params(self, x: Array) -> Array:
        N, H, W, _ = x.shape
        return identity_grid(N, H, W)

    def apply(self, grid: Array, x: Array) -> Array:
        return grid_sample(x, grid)

    def norm(self, grid: Array, x: Array, lp=2) -> Array:
        return batchwise_norm(grid - self.identity_params(x), lp)

    def stadv_norm(self, grid: Array, x: Array) -> Array:
        from diffpure_tpu.attacks.stadv import stadv_tv_norm
        return stadv_tv_norm(grid - self.identity_params(x))

    def project(self, grid: Array, x: Array, lp, lp_bound: float) -> Array:
        """clip to [-1,1] then lp-ball around identity (ref :231-285)."""
        ident = self.identity_params(x)
        grid = jnp.clip(grid, -1.0, 1.0)
        if lp == "inf":
            return jnp.clip(grid, ident - lp_bound, ident + lp_bound)
        d = grid - ident
        n = batchwise_norm(d, lp).reshape(-1, 1, 1, 1)
        return ident + d * jnp.minimum(1.0, lp_bound / jnp.maximum(n, 1e-12))


class _AffineBase:
    """Common machinery for affine-family transforms."""

    def _grid_from_theta(self, theta: Array, x: Array) -> Array:
        """Affine grid (align_corners=False): coords = theta @ [gx, gy, 1]."""
        N, H, W, _ = x.shape
        base = identity_grid(N, H, W)  # (N,H,W,2)
        ones = jnp.ones_like(base[..., :1])
        hom = jnp.concatenate([base, ones], axis=-1)  # (N,H,W,3)
        return jnp.einsum("nhwk,njk->nhwj", hom, theta)

    def apply(self, params, x):
        return grid_sample(x, self._grid_from_theta(self._theta(params, x), x))

    def project(self, params, x, lp, lp_bound):
        ident = self.identity_params(x)
        if lp == "inf":
            return jnp.clip(params, ident - lp_bound, ident + lp_bound)
        d = params - ident
        n = batchwise_norm(d, lp).reshape((-1,) + (1,) * (d.ndim - 1))
        return ident + d * jnp.minimum(1.0, lp_bound / jnp.maximum(n, 1e-12))

    def norm(self, params, x, lp=2):
        return batchwise_norm(params - self.identity_params(x), lp)


@dataclasses.dataclass(frozen=True)
class Affine(_AffineBase):
    """Full 2x3 affine params (ref AffineTransform)."""

    def identity_params(self, x: Array) -> Array:
        N = x.shape[0]
        theta = jnp.zeros((N, 2, 3))
        return theta.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)

    def _theta(self, params, x):
        return params


@dataclasses.dataclass(frozen=True)
class Rotation(_AffineBase):
    """Single angle per example (ref RotationTransform)."""

    def identity_params(self, x: Array) -> Array:
        return jnp.zeros((x.shape[0],))

    def _theta(self, angle, x):
        c, s = jnp.cos(angle), jnp.sin(angle)
        zeros = jnp.zeros_like(angle)
        return jnp.stack([jnp.stack([c, -s, zeros], -1),
                          jnp.stack([s, c, zeros], -1)], axis=1)


@dataclasses.dataclass(frozen=True)
class Translation(_AffineBase):
    """(tx, ty) per example (ref TranslationTransform)."""

    def identity_params(self, x: Array) -> Array:
        return jnp.zeros((x.shape[0], 2))

    def _theta(self, txy, x):
        N = txy.shape[0]
        theta = jnp.zeros((N, 2, 3))
        theta = theta.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
        return theta.at[:, 0, 2].set(txy[:, 0]).at[:, 1, 2].set(txy[:, 1])
