"""DPM-Solver++(2M): high-order multistep ODE solver for VP diffusion.

Accelerated purification beyond the reference's Euler solvers: the
probability-flow ODE in log-SNR time admits an exponential-integrator
discretization (Lu et al., DPM-Solver++) whose 2nd-order multistep variant
reaches Euler-at-100-steps quality in ~10-20 score evaluations — a direct
NFE (and wall-clock) reduction for the purifier with no model change.

Data-prediction form: with alpha_t, sigma_t the VP marginal coefficients and
lambda = log(alpha/sigma),
    x_{i+1} = (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} (e^{-h} - 1) D_i,
    h = lambda_{i+1} - lambda_i,
    D_i = (1 + 1/(2 r)) x0_i - (1/(2 r)) x0_{i-1},  r = h_{i-1}/h_i
(first step: D_0 = x0_0). x0 predictions come from the epsilon model via
x0 = (x - sigma eps)/alpha.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe

from diffpure_tpu.diffusion.sde import VPSDE

Array = jax.Array
# eps_fn(x, t_batch) -> epsilon prediction
EpsFn = Callable[[Array, Array], Array]


def _coeffs(sde: VPSDE, t: Array):
    lmc = sde.log_mean_coeff(t)
    alpha = jnp.exp(lmc)
    sigma = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * lmc), 1e-12))
    lam = lmc - jnp.log(sigma)
    return alpha, sigma, lam


def dpm_solver_pp_2m(eps_fn: EpsFn, x: Array, t_start: float, t_end: float,
                     n_steps: int, sde: VPSDE) -> Array:
    """Integrate the probability-flow ODE from t_start down to t_end.

    Timesteps are uniform in t (matching the reference's uniform Euler
    grid); the solver is deterministic and fully differentiable.
    """
    B = x.shape[0]
    ts = jnp.linspace(t_start, t_end, n_steps + 1)

    def x0_pred(x, t):
        tb = jnp.full((B,), t, x.dtype)
        alpha, sigma, _ = _coeffs(sde, t)
        eps = eps_fn(x, tb)
        return (x - sigma * eps) / alpha

    # first step: DPM-Solver++(1) == DDIM
    t0, t1 = ts[0], ts[1]
    a0, s0, l0 = _coeffs(sde, t0)
    a1, s1, l1 = _coeffs(sde, t1)
    x0_prev = x0_pred(x, t0)
    h_prev = l1 - l0
    x = (s1 / s0) * x - a1 * (jnp.exp(-h_prev) - 1.0) * x0_prev

    def step(carry, i):
        x, x0_prev, h_prev = carry
        t_i = ts[i]
        t_n = ts[i + 1]
        a_i, s_i, l_i = _coeffs(sde, t_i)
        a_n, s_n, l_n = _coeffs(sde, t_n)
        h = l_n - l_i
        r = h_prev / h
        x0_i = x0_pred(x, t_i)
        D = (1.0 + 1.0 / (2.0 * r)) * x0_i - (1.0 / (2.0 * r)) * x0_prev
        x_new = (s_n / s_i) * x - a_n * (jnp.exp(-h) - 1.0) * D
        return (x_new, x0_i, h), None

    step = jax.checkpoint(step)
    record_nfe("dpm_solver_pp", n_steps)
    (x, _, _), _ = jax.lax.scan(step, (x, x0_prev, h_prev),
                                jnp.arange(1, n_steps))
    return x
