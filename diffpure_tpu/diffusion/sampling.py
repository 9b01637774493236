"""Predictor-Corrector sampler library.

JAX rebuild of the vendored score_sde sampler surface
(ref: score_sde/sampling.py:34-485): predictor/corrector registries,
get_pc_sampler, get_ode_sampler. Samplers are lax.scan loops -> one XLA
program; n_steps is static.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.diffusion.sde import SDE, VESDE, VPSDE, batch_mul
from diffpure_tpu.solvers.ode import odeint_euler

Array = jax.Array
ScoreFn = Callable[[Array, Array], Array]

_PREDICTORS: Dict[str, Callable] = {}
_CORRECTORS: Dict[str, Callable] = {}


def register_predictor(name):
    def deco(fn):
        _PREDICTORS[name] = fn
        return fn
    return deco


def register_corrector(name):
    def deco(fn):
        _CORRECTORS[name] = fn
        return fn
    return deco


def get_predictor(name):
    return _PREDICTORS[name]


def get_corrector(name):
    return _CORRECTORS[name]


# --- predictors (ref sampling.py:177-248) ----------------------------------

@register_predictor("euler_maruyama")
def euler_maruyama_predictor(key, sde: SDE, score_fn: ScoreFn, x, t,
                             probability_flow=False):
    dt = -sde.T / sde.N
    rev = sde.reverse(score_fn, probability_flow)
    drift, diffusion = rev.sde(x, t)
    z = jax.random.normal(key, x.shape, x.dtype)
    x_mean = x + drift * dt
    x = x_mean + batch_mul(diffusion, np.sqrt(-dt) * z)
    return x, x_mean


@register_predictor("reverse_diffusion")
def reverse_diffusion_predictor(key, sde: SDE, score_fn: ScoreFn, x, t,
                                probability_flow=False):
    f, G = sde.discretize(x, t)
    score = score_fn(x, t)
    factor = 0.5 if probability_flow else 1.0
    rev_f = f - batch_mul(G ** 2, score) * factor
    z = jax.random.normal(key, x.shape, x.dtype)
    x_mean = x - rev_f
    if probability_flow:
        return x_mean, x_mean
    x = x_mean + batch_mul(G, z)
    return x, x_mean


@register_predictor("ancestral_sampling")
def ancestral_sampling_predictor(key, sde: SDE, score_fn: ScoreFn, x, t,
                                 probability_flow=False):
    """DDPM ancestral sampling (VP/VE only; ref sampling.py:204-248)."""
    assert not probability_flow
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    score = score_fn(x, t)
    z = jax.random.normal(key, x.shape, x.dtype)
    if isinstance(sde, VESDE):
        sigmas = jnp.asarray(sde.discrete_sigmas, jnp.float32)
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma),
                             sigmas[jnp.maximum(timestep - 1, 0)])
        x_mean = x + batch_mul(sigma ** 2 - adjacent ** 2, score)
        std = jnp.sqrt(adjacent ** 2 * (sigma ** 2 - adjacent ** 2)
                       / jnp.maximum(sigma ** 2, 1e-20))
        return x_mean + batch_mul(std, z), x_mean
    if isinstance(sde, VPSDE):
        betas = jnp.asarray(sde.discrete_betas, jnp.float32)
        beta = betas[timestep]
        x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta),
                           x + batch_mul(beta, score))
        return x_mean + batch_mul(jnp.sqrt(beta), z), x_mean
    raise NotImplementedError(type(sde))


@register_predictor("none")
def none_predictor(key, sde, score_fn, x, t, probability_flow=False):
    return x, x


# --- correctors (ref sampling.py:254-330) -----------------------------------

@register_corrector("langevin")
def langevin_corrector(key, sde: SDE, score_fn: ScoreFn, x, t, snr,
                       n_steps):
    if isinstance(sde, VPSDE):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        alphas = jnp.asarray(1.0 - sde.discrete_betas, jnp.float32)
        alpha = alphas[timestep]
    else:
        alpha = jnp.ones_like(t)

    def step(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        grad = score_fn(x, t)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        grad_norm = jnp.sqrt(jnp.mean(grad.reshape(grad.shape[0], -1) ** 2,
                                      axis=-1) * grad[0].size) + 1e-20
        noise_norm = jnp.sqrt(jnp.mean(
            noise.reshape(noise.shape[0], -1) ** 2, axis=-1) * noise[0].size)
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
        x_mean = x + batch_mul(step_size, grad)
        x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
        return (x, k), x_mean

    (x, _), x_means = jax.lax.scan(step, (x, key), jnp.arange(n_steps))
    return x, x_means[-1]


@register_corrector("ald")
def ald_corrector(key, sde: SDE, score_fn: ScoreFn, x, t, snr, n_steps):
    """Annealed Langevin Dynamics (NCSNv2-style; ref sampling.py:286-330)."""
    if isinstance(sde, VPSDE):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        alphas = jnp.asarray(1.0 - sde.discrete_betas, jnp.float32)
        alpha = alphas[timestep]
    else:
        alpha = jnp.ones_like(t)
    std = sde.marginal_prob(x, t)[1]

    def step(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        grad = score_fn(x, t)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        step_size = (snr * std) ** 2 * 2 * alpha
        x_mean = x + batch_mul(step_size, grad)
        x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
        return (x, k), x_mean

    (x, _), x_means = jax.lax.scan(step, (x, key), jnp.arange(n_steps))
    return x, x_means[-1]


@register_corrector("none")
def none_corrector(key, sde, score_fn, x, t, snr, n_steps):
    return x, x


# --- samplers ---------------------------------------------------------------

def get_pc_sampler(sde: SDE, shape: Tuple[int, ...],
                   predictor: str = "euler_maruyama",
                   corrector: str = "none", snr: float = 0.16,
                   n_steps_each: int = 1, probability_flow: bool = False,
                   denoise: bool = True, eps: float = 1e-3):
    """Predictor-Corrector sampling loop (ref sampling.py:338-395).

    Returns sampler(key, score_fn) -> (x, n_function_evals).
    """
    pred = get_predictor(predictor)
    corr = get_corrector(corrector)

    def sampler(key, score_fn: ScoreFn):
        key, sub = jax.random.split(key)
        x = sde.prior_sampling(sub, shape)
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def body(carry, t):
            x, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            vec_t = jnp.full((shape[0],), t)
            x, x_mean = corr(k1, sde, score_fn, x, vec_t, snr, n_steps_each)
            x, x_mean = pred(k2, sde, score_fn, x, vec_t,
                             probability_flow=probability_flow)
            return (x, k), x_mean

        (x, _), x_means = jax.lax.scan(body, (x, key), timesteps)
        out = x_means[-1] if denoise else x
        nfe = sde.N * (n_steps_each + 1)
        return out, nfe

    return sampler


def get_ode_sampler(sde: SDE, shape: Tuple[int, ...], denoise: bool = False,
                    n_steps: Optional[int] = None, eps: float = 1e-3):
    """Probability-flow ODE sampler (ref sampling.py:398-485) using the
    fixed-step Euler integrator (deterministic, jit-compiled)."""
    n = n_steps or sde.N

    def sampler(key, score_fn: ScoreFn):
        key, sub = jax.random.split(key)
        x = sde.prior_sampling(sub, shape)
        rev = sde.reverse(score_fn, probability_flow=True)

        def f(xx, tt):
            return rev.sde(xx, tt)[0]

        x = odeint_euler(f, x, sde.T, eps, n)
        if denoise:
            # Tweedie denoising step at eps (ref sampling.py:421-431)
            vec_eps = jnp.full((shape[0],), eps)
            _, G = sde.discretize(x, vec_eps)
            x = x + batch_mul(G ** 2, score_fn(x, vec_eps))
        return x, n

    return sampler
