"""Continuous-time SDE library (VP / subVP / VE) with reverse-SDE construction.

Functional JAX counterpart of the reference SDE library
(ref: score_sde/sde_lib.py:15-261). All objects are frozen dataclasses of
Python floats/ints, safe to close over in jitted functions; all methods take
and return jnp arrays and are fully traceable.

Time convention: t in [0, T] with T = 1 for VP/subVP/VE. Broadcasting: `t` is
a scalar or a (batch,) vector; per-example coefficients are broadcast against
an arbitrary-rank state `x` by right-padding singleton axes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def batch_mul(coef: Array, x: Array) -> Array:
    """Multiply per-example coefficients (batch,) into state of any rank."""
    coef = jnp.asarray(coef)
    if coef.ndim == 0:
        return coef * x
    return coef.reshape(coef.shape + (1,) * (x.ndim - coef.ndim)) * x


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base class: forward SDE dx = f(x,t) dt + g(t) dW."""

    N: int = 1000  # discretization steps for the discrete-time view

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Mean and std of p_t(x(t) | x(0))."""
        raise NotImplementedError

    def marginal_coeffs(self, t: Array) -> Tuple[Array, Array]:
        """(mean_coef, std) such that x_t = mean_coef * x_0 + std * eps."""
        ones = jnp.ones(())
        mean, std = self.marginal_prob(ones, t)
        return mean, std

    def prior_sampling(self, key: Array, shape) -> Array:
        raise NotImplementedError

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError

    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Euler discretization x_{i+1} = x_i + f_i + G_i z (ref sde_lib.py:58-77)."""
        drift, diffusion = self.sde(x, t)
        dt = self.T / self.N
        return drift * dt, diffusion * np.sqrt(dt)

    def reverse(self, score_fn: Callable[[Array, Array], Array],
                probability_flow: bool = False) -> "ReverseSDE":
        return ReverseSDE(self, score_fn, probability_flow)


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE (ref: score_sde/sde_lib.py:120-172).

    dx = -1/2 beta(t) x dt + sqrt(beta(t)) dW,
    beta(t) = beta_min + t * (beta_max - beta_min).
    """

    beta_min: float = 0.1
    beta_max: float = 20.0

    def beta(self, t: Array) -> Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def log_mean_coeff(self, t: Array) -> Array:
        return -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob(self, x, t):
        lmc = self.log_mean_coeff(t)
        mean = batch_mul(jnp.exp(lmc), x)
        std = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * lmc), 0.0))
        return mean, std

    def alphas_cumprod_cont(self, t: Array) -> Array:
        """Continuous alpha-bar: exp(-1/2 (bmax-bmin) t^2 - bmin t).

        ref: runners/diffpure_sde.py:76.
        """
        return jnp.exp(-0.5 * (self.beta_max - self.beta_min) * t ** 2
                       - self.beta_min * t)

    @property
    def discrete_betas(self) -> np.ndarray:
        return np.linspace(self.beta_min / self.N, self.beta_max / self.N,
                           self.N, dtype=np.float64)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.discrete_betas)

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        shape = z.shape
        n = np.prod(shape[1:])
        return (-n / 2.0 * jnp.log(2 * np.pi)
                - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0)

    def discretize(self, x, t):
        """DDPM-style discretization (ref sde_lib.py:160-172)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        betas = jnp.asarray(self.discrete_betas, dtype=x.dtype)
        beta = betas[timestep]
        alpha = 1.0 - beta
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
    """Sub-VP SDE (ref: score_sde/sde_lib.py:175-212)."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    def beta(self, t: Array) -> Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        discount = 1.0 - jnp.exp(-2.0 * self.beta_min * t
                                 - (self.beta_max - self.beta_min) * t ** 2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        mean = batch_mul(jnp.exp(lmc), x)
        std = 1.0 - jnp.exp(2.0 * lmc)  # note: no sqrt (sub-VP)
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        shape = z.shape
        n = np.prod(shape[1:])
        return (-n / 2.0 * jnp.log(2 * np.pi)
                - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0)


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE (ref: score_sde/sde_lib.py:215-261)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def sigma(self, t: Array) -> Array:
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sde(self, x, t):
        sigma = self.sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(2.0 * (np.log(self.sigma_max) - np.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        return x, self.sigma(t)

    @property
    def discrete_sigmas(self) -> np.ndarray:
        return np.exp(np.linspace(np.log(self.sigma_min), np.log(self.sigma_max),
                                  self.N, dtype=np.float64))

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        shape = z.shape
        n = np.prod(shape[1:])
        return (-n / 2.0 * jnp.log(2 * np.pi * self.sigma_max ** 2)
                - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1)
                / (2 * self.sigma_max ** 2))

    def discretize(self, x, t):
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = jnp.asarray(self.discrete_sigmas, dtype=x.dtype)
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma),
                             sigmas[jnp.maximum(timestep - 1, 0)])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma ** 2 - adjacent ** 2)
        return f, G


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE / probability-flow ODE of a forward SDE.

    drift = f(x,t) - g(t)^2 * score(x,t) * (1/2 if probability_flow else 1)
    diffusion = 0 if probability_flow else g(t)
    ref: score_sde/sde_lib.py:79-117.
    """

    forward: SDE
    score_fn: Callable[[Array, Array], Array]
    probability_flow: bool = False

    @property
    def T(self):
        return self.forward.T

    def sde(self, x, t):
        drift, diffusion = self.forward.sde(x, t)
        score = self.score_fn(x, t)
        factor = 0.5 if self.probability_flow else 1.0
        drift = drift - batch_mul(diffusion ** 2, score) * factor
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion
