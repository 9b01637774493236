"""Score-function adapters: epsilon-prediction models -> score(x, t).

Two adapter families exist in the reference and use *different* alpha-bars:
  - score_sde path: continuous labels t*999 and the continuous marginal std
    (ref: score_sde/models/utils.py:128-177).
  - guided_diffusion path: integer steps t*N and the continuous closed-form
    alpha-bar exp(-1/2 (bmax-bmin) t^2 - bmin t)
    (ref: runners/diffpure_sde.py:101-112 and :76-77).
Both are kept, selected by `score_type` (ref eval: --score_type flag).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffpure_tpu.diffusion.sde import SDE, VPSDE, SubVPSDE, VESDE, batch_mul

Array = jax.Array
ModelFn = Callable[..., Array]


def get_score_fn(sde: SDE, model_fn: ModelFn, continuous: bool = True) -> Callable:
    """Convert an epsilon/sigma model into score(x, t).

    Mirrors the reference adapter exactly (ref score_sde/models/utils.py:128-177):
    VP/subVP continuous uses labels t*999 and divides by the continuous
    marginal std; VP discrete uses labels t*(N-1) and the discrete
    sqrt(1-alpha_bar); VE uses the noise scale directly.
    """
    if isinstance(sde, (VPSDE, SubVPSDE)):
        def score_fn(x: Array, t: Array) -> Array:
            if continuous or isinstance(sde, SubVPSDE):
                labels = t * 999
                model_output = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = t * (sde.N - 1)
                model_output = model_fn(x, labels)
                sqrt_1m = jnp.asarray(
                    jnp.sqrt(1.0 - jnp.asarray(sde.alphas_cumprod)), jnp.float32)
                std = sqrt_1m[labels.astype(jnp.int32)]
            return batch_mul(-1.0 / std, model_output)
        return score_fn

    if isinstance(sde, VESDE):
        def score_fn(x: Array, t: Array) -> Array:
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = sde.T - t
                labels = labels * (sde.N - 1)
                labels = jnp.round(labels).astype(jnp.int32)
            return model_fn(x, labels)
        return score_fn

    raise NotImplementedError(f"no score adapter for SDE class {type(sde)}")


def eps_to_score_continuous_vp(eps: Array, t: Array, sde: VPSDE) -> Array:
    """score = -eps / sqrt(1 - alpha_bar_cont(t)) (ref diffpure_sde.py:77,112)."""
    coeff = -1.0 / jnp.sqrt(1.0 - sde.alphas_cumprod_cont(t))
    return batch_mul(coeff, eps)


def make_guided_score_fn(model_fn: ModelFn, sde: VPSDE,
                         learn_sigma: bool = True, **model_kwargs) -> Callable:
    """Score adapter for the guided_diffusion epsilon model.

    The model takes integer steps in [0, N]; with learn_sigma the output
    holds [eps, var] on the channel axis (NHWC here; reference splits dim=1,
    ref runners/diffpure_sde.py:101-112).
    """
    def score_fn(x: Array, t: Array) -> Array:
        disc_steps = (t.astype(jnp.float32) * sde.N).astype(jnp.int32)
        model_output = model_fn(x, disc_steps, **model_kwargs)
        if learn_sigma:
            model_output = jnp.split(model_output, 2, axis=-1)[0]
        return eps_to_score_continuous_vp(model_output, t, sde)
    return score_fn
