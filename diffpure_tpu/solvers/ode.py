"""Fixed-step Euler ODE integrator as a single lax.scan.

TPU-native replacement for torchdiffeq.odeint(method='euler', step_size=...)
(ref: runners/diffpure_ode.py:229-238). Deterministic; differentiable with
exact backprop via checkpointed scan (default) or O(1)-memory adjoint
(solvers/adjoint.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe

Array = jax.Array
OdeFn = Callable[[Array, Array], Array]  # f(x, t) -> dx/dt


def odeint_euler(
    func: OdeFn,
    x0: Array,
    t0: float,
    t1: float,
    n_steps: int,
    *,
    remat: bool = True,
) -> Array:
    """Integrate dx/dt = func(x, t) from t0 to t1 with n_steps Euler steps."""
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        x = x + func(x, tb) * dt
        return x, None

    if remat:
        step = jax.checkpoint(step)
    record_nfe("ode_euler", n_steps)
    x1, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return x1


def odeint_heun(
    func: OdeFn,
    x0: Array,
    t0: float,
    t1: float,
    n_steps: int,
    *,
    remat: bool = True,
) -> Array:
    """Heun's method (explicit trapezoidal, 2nd order): two func evals per
    step, ~quadratic error decay — the fixed-step TPU stand-in for the
    reference's adaptive dopri5 option (ref diffpure_ode.py:243 'dopri5')."""
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        tb1 = tb + dt
        k1 = func(x, tb)
        k2 = func(x + dt * k1, tb1)
        return x + (dt / 2) * (k1 + k2), None

    if remat:
        step = jax.checkpoint(step)
    record_nfe("ode_heun", 2 * n_steps)
    x1, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return x1
