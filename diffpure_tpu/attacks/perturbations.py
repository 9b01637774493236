"""Parameterized perturbation framework (mister_ed surface).

Functional JAX rebuild of the vendored mister_ed perturbation objects
(ref stadv_eot/recoloradv/mister_ed/adversarial_perturbations.py:42-720):
a Perturbation bundles init/apply/project/norm/random-init/merge over a
params pytree instead of a stateful nn.Module. ThreatModel is the factory
(ref :390-430). Covers DeltaAddition (ref :431-538), ParameterizedXformAdv
(ref :541-636), and SequentialPerturbation (ref :641-720).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def batchwise_norm(v: Array, lp, flat_start_dim: int = 1) -> Array:
    """Per-example lp norm (ref mister_ed/utils/pytorch_utils.py)."""
    vf = v.reshape(v.shape[0], -1)
    if lp == "inf":
        return jnp.max(jnp.abs(vf), axis=-1)
    return jnp.sum(jnp.abs(vf) ** lp, axis=-1) ** (1.0 / lp)


class Perturbation:
    """Base interface (ref adversarial_perturbations.py:42-230)."""

    def init_params(self, x: Array):
        raise NotImplementedError

    def apply(self, params, x: Array) -> Array:
        raise NotImplementedError

    def project(self, params, x: Array):
        """Constrain params to the threat model (constrain_params +
        make_valid_image)."""
        return params

    def norm(self, params, x: Array, lp=2) -> Array:
        raise NotImplementedError

    def random_init(self, key: Array, params, x: Array):
        return params

    def merge(self, params_a, params_b, mask: Array):
        """Per-example select: mask==1 -> a (ref merge_perturbation)."""
        def sel(a, b):
            m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)
        return jax.tree_util.tree_map(sel, params_a, params_b)


@dataclasses.dataclass(frozen=True)
class ThreatModel:
    """Factory binding a perturbation class to its kwargs (ref :390-430)."""
    perturbation_class: type
    kwargs: Tuple[Tuple[str, Any], ...] = ()

    @staticmethod
    def create(cls, **kwargs) -> "ThreatModel":
        return ThreatModel(cls, tuple(sorted(kwargs.items())))

    def __call__(self) -> Perturbation:
        return self.perturbation_class(**dict(self.kwargs))


@dataclasses.dataclass(frozen=True)
class DeltaAddition(Perturbation):
    """Additive perturbation x + delta with an lp ball (ref :431-538)."""
    lp_style: Any = "inf"  # 'inf' or int
    lp_bound: float = 8 / 255

    def init_params(self, x):
        return jnp.zeros_like(x)

    def apply(self, delta, x):
        return jnp.clip(x + delta, 0.0, 1.0)

    def project(self, delta, x):
        if self.lp_style == "inf":
            delta = jnp.clip(delta, -self.lp_bound, self.lp_bound)
        else:
            n = batchwise_norm(delta, self.lp_style).reshape(
                (-1,) + (1,) * (delta.ndim - 1))
            delta = delta * jnp.minimum(1.0, self.lp_bound
                                        / jnp.maximum(n, 1e-12))
        # keep x + delta a valid image (make_valid_image, ref :505-517)
        return jnp.clip(x + delta, 0.0, 1.0) - x

    def norm(self, delta, x, lp=2):
        return batchwise_norm(delta, lp)

    def random_init(self, key, delta, x):
        if self.lp_style == "inf":
            d = jax.random.uniform(key, x.shape, minval=-self.lp_bound,
                                   maxval=self.lp_bound)
        else:
            d = jax.random.normal(key, x.shape)
            d = d * self.lp_bound / jnp.maximum(
                batchwise_norm(d, self.lp_style).reshape(
                    (-1,) + (1,) * (d.ndim - 1)), 1e-12)
        return self.project(d, x)


@dataclasses.dataclass(frozen=True)
class ParameterizedXformAdv(Perturbation):
    """Perturbation via a parameterized spatial/color transformation
    (ref :541-636). `xform` provides identity_params/apply/norm/project."""
    xform: Any = None  # a transform object from attacks/spatial.py
    lp_style: Any = "inf"
    lp_bound: float = 0.05
    use_stadv: bool = False

    def init_params(self, x):
        return self.xform.identity_params(x)

    def apply(self, params, x):
        return self.xform.apply(params, x)

    def project(self, params, x):
        return self.xform.project(params, x, self.lp_style, self.lp_bound)

    def norm(self, params, x, lp=2):
        if self.use_stadv:
            return self.xform.stadv_norm(params, x)
        return self.xform.norm(params, x, lp)

    def random_init(self, key, params, x):
        ident = self.xform.identity_params(x)
        noise = jax.random.uniform(key, ident.shape, minval=-self.lp_bound,
                                   maxval=self.lp_bound)
        return self.project(ident + noise, x)


@dataclasses.dataclass(frozen=True)
class SequentialPerturbation(Perturbation):
    """Composition of perturbation layers (ref :641-720)."""
    layers: Tuple[Perturbation, ...] = ()

    def init_params(self, x):
        params = []
        cur = x
        for layer in self.layers:
            params.append(layer.init_params(cur))
            cur = layer.apply(params[-1], cur)
        return tuple(params)

    def apply(self, params, x):
        cur = x
        for layer, p in zip(self.layers, params):
            cur = layer.apply(p, cur)
        return cur

    def project(self, params, x):
        out = []
        cur = x
        for layer, p in zip(self.layers, params):
            p = layer.project(p, cur)
            out.append(p)
            cur = layer.apply(p, cur)
        return tuple(out)

    def norm(self, params, x, lp=2):
        total = None
        cur = x
        for layer, p in zip(self.layers, params):
            n = layer.norm(p, cur, lp)
            total = n if total is None else total + n
            cur = layer.apply(p, cur)
        return total

    def random_init(self, key, params, x):
        out = []
        cur = x
        for i, (layer, p) in enumerate(zip(self.layers, params)):
            p = layer.random_init(jax.random.fold_in(key, i), p, cur)
            out.append(p)
            cur = layer.apply(p, cur)
        return tuple(out)
