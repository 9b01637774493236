"""Euler-Maruyama SDE integrator as a single lax.scan.

TPU-native replacement for torchsde.sdeint(method='euler')
(ref: runners/diffpure_sde.py:234-238). Design points:

- Fixed step count (static under jit); dt = (t1 - t0) / n_steps. The reference
  relies on torchsde's default dt=1e-3 over a span of t*/1000, i.e. exactly t*
  Euler steps; pass n_steps=t* for step-for-step parity.
- Brownian increments are *counter-based*: dW_i = N(0, dt) drawn from
  fold_in(key, i). This is the BrownianInterval analog — any step's noise is
  reconstructible from (key, i) alone, which the adjoint backward pass uses to
  replay the exact forward noise without storing it.
- Diagonal noise with state-independent diffusion g(t) (the DiffPure case:
  ref diffpure_sde.py:140-148 — g broadcasts a per-batch scalar).
- Differentiable: `jax.checkpoint` on the step body gives exact
  backprop-through-the-solver with O(n_steps * state) memory and one extra
  drift eval per step in the backward pass. For O(1)-memory gradients see
  solvers/adjoint.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe

Array = jax.Array
# drift(x, t) -> dx/dt ; diffusion(t) -> per-batch scalar or broadcastable array
DriftFn = Callable[[Array, Array], Array]
DiffusionFn = Callable[[Array], Array]


def brownian_increment(key: Array, i: Array, shape, dt, dtype=jnp.float32) -> Array:
    """dW_i ~ N(0, |dt|), reconstructible from (key, i).

    |dt| keeps backward-in-time grids (descending ts, e.g. the ODE path
    reusing an SDE solver with zero diffusion) NaN-free: sqrt(negative)
    would poison the state even when multiplied by a zero diffusion.
    """
    return jax.random.normal(jax.random.fold_in(key, i), shape, dtype) * jnp.sqrt(
        jnp.abs(jnp.asarray(dt, dtype)))


def _expand(coef: Array, x: Array) -> Array:
    coef = jnp.asarray(coef)
    if coef.ndim == 0:
        return coef
    return coef.reshape(coef.shape + (1,) * (x.ndim - coef.ndim))


def sdeint_em(
    drift: DriftFn,
    diffusion: DiffusionFn,
    x0: Array,
    t0: float,
    t1: float,
    n_steps: int,
    key: Array,
    *,
    remat: bool = True,
) -> Array:
    """Integrate dx = drift(x,t) dt + diffusion(t) dW from t0 to t1.

    Returns x(t1). Noise is threaded by step counter so the trajectory is a
    pure function of (x0, key).
    """
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        dw = brownian_increment(key, i, x.shape, dt, x.dtype)
        g = _expand(diffusion(tb), x)
        x = x + drift(x, tb) * dt + g * dw
        return x, None

    if remat:
        step = jax.checkpoint(step)
    record_nfe("sde_euler", n_steps)
    x1, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return x1


def sdeint_em_trajectory(
    drift: DriftFn,
    diffusion: DiffusionFn,
    x0: Array,
    t0: float,
    t1: float,
    n_steps: int,
    key: Array,
) -> Array:
    """Like sdeint_em but returns the full (n_steps+1, ...) trajectory.

    Used by tests (fixed-Brownian-path comparison against a hand-rolled loop)
    and debugging dumps; the hot path uses sdeint_em.
    """
    dt = (t1 - t0) / n_steps

    def step(x, i):
        t = t0 + i.astype(x0.dtype) * dt
        tb = jnp.full((x.shape[0],), t, dtype=x.dtype)
        dw = brownian_increment(key, i, x.shape, dt, x.dtype)
        g = _expand(diffusion(tb), x)
        x = x + drift(x, tb) * dt + g * dw
        return x, x

    _, xs = jax.lax.scan(step, x0, jnp.arange(n_steps))
    return jnp.concatenate([x0[None], xs], axis=0)
