"""O(1)-memory adjoint gradients for the Euler / Euler-Maruyama integrators.

TPU-native replacement for torchsde.sdeint_adjoint / torchdiffeq.odeint_adjoint
(ref: runners/diffpure_sde.py:236-238, runners/diffpure_ode.py:229-238).

The backward pass is a second lax.scan that (1) reconstructs the state
trajectory by integrating the SDE backwards with the *same* Brownian
increments — replayed from the counter-based PRNG, the BrownianInterval
analog — and (2) integrates the adjoint state with one drift VJP per step.
Memory is O(1) in the number of steps (one model activation set alive at a
time); the price is the standard O(dt) adjoint discretization error, same
class as torchsde's. For bit-exact gradients use the checkpointed direct
path (solvers/em.py with remat=True), which is the default in purify/.

Assumptions (hold for all DiffPure runners): diagonal noise whose diffusion
g(t) is state- and parameter-independent (ref diffpure_sde.py:140-148), so the
adjoint picks up no diffusion-term VJP.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe

from diffpure_tpu.solvers.em import brownian_increment, _expand

Array = jax.Array
# drift(params, x, t) -> dx/dt ; diffusion(t) -> per-batch scalar
ParamDriftFn = Callable[[object, Array, Array], Array]
DiffusionFn = Callable[[Array], Array]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4, 5, 6))
def sdeint_em_adjoint(drift: ParamDriftFn, diffusion: DiffusionFn,
                      params, x0: Array, t0: float, t1: float, n_steps: int,
                      key: Array) -> Array:
    """Euler-Maruyama solve differentiable w.r.t. (params, x0) via adjoint."""
    return _em_forward(drift, diffusion, params, x0, t0, t1, n_steps, key)


def _em_forward(drift, diffusion, params, x0, t0, t1, n_steps, key):
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        dw = brownian_increment(key, i, x.shape, dt, x.dtype)
        g = _expand(diffusion(tb), x)
        return x + drift(params, x, tb) * dt + g * dw, None

    record_nfe("sde_euler_adjoint", n_steps)
    x1, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return x1


def _em_fwd(drift, diffusion, params, x0, t0, t1, n_steps, key):
    # Note: fwd receives args in original order; only bwd gets the
    # nondiff args hoisted to the front.
    x1 = _em_forward(drift, diffusion, params, x0, t0, t1, n_steps, key)
    return x1, (params, x1, key)


def _em_bwd(drift, diffusion, t0, t1, n_steps, residuals, g_out):
    params, x1, key = residuals
    dt = (t1 - t0) / n_steps
    zero_p = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, i):
        x, a, gp = carry
        t = t0 + i.astype(x.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        dw = brownian_increment(key, i, x.shape, dt, x.dtype)
        gcoef = _expand(diffusion(tb), x)

        # Reconstruct x_i from x_{i+1} by reversing the Euler step with the
        # replayed noise (drift evaluated at x_{i+1}: the adjoint-SDE approx).
        f_here = drift(params, x, tb)
        x_prev = x - f_here * dt - gcoef * dw

        # Adjoint update: a_i = a_{i+1} + a_{i+1}^T df/dx dt ; param grads
        # accumulate a^T df/dtheta dt. One VJP per step.
        _, pullback = jax.vjp(lambda p, xx: drift(p, xx, tb), params, x_prev)
        dp, dx = pullback(a)
        a = a + dx * dt
        gp = jax.tree_util.tree_map(lambda acc, d: acc + d * dt, gp, dp)
        return (x_prev, a, gp), None

    (x0_rec, a0, gp), _ = jax.lax.scan(
        step, (x1, g_out, zero_p), jnp.arange(n_steps - 1, -1, -1))
    del x0_rec
    return gp, a0, None  # grads for (params, x0, key)


sdeint_em_adjoint.defvjp(_em_fwd, _em_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def odeint_euler_adjoint(func: ParamDriftFn, params, x0: Array,
                         t0: float, t1: float, n_steps: int) -> Array:
    """Euler ODE solve differentiable w.r.t. (params, x0) via adjoint."""
    return _ode_forward(func, params, x0, t0, t1, n_steps)


def _ode_forward(func, params, x0, t0, t1, n_steps):
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        return x + func(params, x, tb) * dt, None

    record_nfe("ode_euler_adjoint", n_steps)
    x1, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return x1


def _ode_fwd(func, params, x0, t0, t1, n_steps):
    x1 = _ode_forward(func, params, x0, t0, t1, n_steps)
    return x1, (params, x1)


def _ode_bwd(func, t0, t1, n_steps, residuals, g_out):
    params, x1 = residuals
    dt = (t1 - t0) / n_steps
    zero_p = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, i):
        x, a, gp = carry
        t = t0 + i.astype(x.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        f_here = func(params, x, tb)
        x_prev = x - f_here * dt
        _, pullback = jax.vjp(lambda p, xx: func(p, xx, tb), params, x_prev)
        dp, dx = pullback(a)
        a = a + dx * dt
        gp = jax.tree_util.tree_map(lambda acc, d: acc + d * dt, gp, dp)
        return (x_prev, a, gp), None

    (_, a0, gp), _ = jax.lax.scan(
        step, (x1, g_out, zero_p), jnp.arange(n_steps - 1, -1, -1))
    return gp, a0


odeint_euler_adjoint.defvjp(_ode_fwd, _ode_bwd)
