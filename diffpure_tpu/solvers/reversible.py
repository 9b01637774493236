"""Reversible Heun: algebraically reversible SDE solver with exact
O(1)-memory gradients.

From "Efficient and Accurate Gradients for Neural SDEs" (Kidger et al.,
arXiv:2105.13493, one of the retrieved technique papers): carry a pair
(y, yhat) and step

    yhat_{n+1} = 2 y_n - yhat_n + f(yhat_n, t_n) dt + g(t_n) dW_n
    y_{n+1}    = y_n + (f(yhat_n,t_n) + f(yhat_{n+1},t_{n+1})) dt/2
                     + (g(t_n) + g(t_{n+1})) dW_n/2

The update is algebraically invertible — applying the same rule backward
in time from (y_{n+1}, yhat_{n+1}) with (-dt, -dW_n) recovers
(y_n, yhat_n) exactly in exact arithmetic — so the backward pass
reconstructs the forward trajectory with NO stored checkpoints and NO
recomputation drift (unlike the replay-based adjoint in solvers/adjoint.py,
whose reconstructed trajectory differs from the forward by local solver
error). Strong order 0.5 / weak order 1 for SDEs, and the deterministic
part is 2nd-order (Heun); converges to the Stratonovich solution, which
equals the Ito solution here because the reverse-VP diffusion g(t) is
state-independent.

TPU-native: both passes are single lax.scans with counter-derived Brownian
noise (solvers/em.brownian_increment), so the compiled program is O(1) in
n_steps and the same dW_n is replayed exactly on the backward pass.

Reference analog: torchsde's 'reversible_heun' method with
sdeint_adjoint (the reference pins torchsde but only uses 'euler';
ref runners/diffpure_sde.py:237-247).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe

from diffpure_tpu.solvers.em import brownian_increment

Array = jax.Array


def _times(t0, t1, n_steps, dtype):
    dt = (jnp.asarray(t1, dtype) - jnp.asarray(t0, dtype)) / n_steps
    return dt


def sdeint_reversible_heun(
    drift: Callable,      # (params, x, t_batch) -> dx
    diffusion: Callable,  # (t_batch,) -> scalar-per-batch diffusion
    params,
    x0: Array,
    t0: float,
    t1: float,
    n_steps: int,
    key: Array,
) -> Array:
    """Integrate with exact-gradient O(1)-memory reversible Heun.

    Same calling convention as solvers.adjoint.sdeint_em_adjoint; the
    custom VJP reconstructs states algebraically instead of re-solving.
    """
    return _rev_heun(drift, diffusion, n_steps, params, x0,
                     jnp.asarray(t0, x0.dtype), jnp.asarray(t1, x0.dtype),
                     key)


def _fwd_scan(drift, diffusion, n_steps, params, x0, t0, t1, key):
    dt = (t1 - t0) / n_steps
    B = x0.shape[0]

    def tb(t):
        return jnp.full((B,), t, dtype=x0.dtype)

    f0 = drift(params, x0, tb(t0))
    g0 = diffusion(tb(t0))

    def step(carry, i):
        y, yhat, f, g = carry
        t_n = t0 + i.astype(x0.dtype) * dt
        t_n1 = t_n + dt
        dw = brownian_increment(key, i, x0.shape, dt)
        gb = g.reshape((B,) + (1,) * (x0.ndim - 1))
        yhat1 = 2.0 * y - yhat + f * dt + gb * dw
        f1 = drift(params, yhat1, tb(t_n1))
        g1 = diffusion(tb(t_n1))
        g1b = g1.reshape((B,) + (1,) * (x0.ndim - 1))
        y1 = y + 0.5 * (f + f1) * dt + 0.5 * (gb + g1b) * dw
        return (y1, yhat1, f1, g1), None

    record_nfe("sde_reversible_heun", n_steps + 1)
    (y, yhat, _, _), _ = jax.lax.scan(
        step, (x0, x0, f0, g0), jnp.arange(n_steps))
    return y, yhat


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _rev_heun(drift, diffusion, n_steps, params, x0, t0, t1, key):
    y, _ = _fwd_scan(drift, diffusion, n_steps, params, x0, t0, t1, key)
    return y


def _rev_heun_fwd(drift, diffusion, n_steps, params, x0, t0, t1, key):
    y, yhat = _fwd_scan(drift, diffusion, n_steps, params, x0, t0, t1, key)
    return y, (params, y, yhat, t0, t1, key)


def _rev_heun_bwd(drift, diffusion, n_steps, res, ybar):
    params, y_T, yhat_T, t0, t1, key = res
    shape, dtype = y_T.shape, y_T.dtype
    B = shape[0]
    dt = (t1 - t0) / n_steps

    def tb(t):
        return jnp.full((B,), t, dtype=dtype)

    def local_step(p, y, yhat, t_n, t_n1, dw):
        """The forward update as a pure function of (p, y, yhat)."""
        f = drift(p, yhat, tb(t_n))
        g = diffusion(tb(t_n)).reshape((B,) + (1,) * (len(shape) - 1))
        yhat1 = 2.0 * y - yhat + f * dt + g * dw
        f1 = drift(p, yhat1, tb(t_n1))
        g1 = diffusion(tb(t_n1)).reshape((B,) + (1,) * (len(shape) - 1))
        y1 = y + 0.5 * (f + f1) * dt + 0.5 * (g + g1) * dw
        return y1, yhat1

    pbar0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, i_rev):
        y1, yhat1, ybar, yhatbar, pbar = carry
        i = n_steps - 1 - i_rev
        t_n = t0 + i.astype(dtype) * dt
        t_n1 = t_n + dt
        dw = brownian_increment(key, i, shape, dt)

        # algebraic reversal: recover (y_n, yhat_n) from (y_{n+1}, yhat_{n+1})
        f1 = drift(params, yhat1, tb(t_n1))
        g1 = diffusion(tb(t_n1)).reshape((B,) + (1,) * (len(shape) - 1))
        yhat = 2.0 * y1 - yhat1 - f1 * dt - g1 * dw
        f = drift(params, yhat, tb(t_n))
        g = diffusion(tb(t_n)).reshape((B,) + (1,) * (len(shape) - 1))
        y = y1 - 0.5 * (f + f1) * dt - 0.5 * (g + g1) * dw

        # exact local vjp at the reconstructed state
        _, vjp = jax.vjp(lambda p, yy, yh: local_step(p, yy, yh, t_n, t_n1,
                                                      dw),
                         params, y, yhat)
        dp, dy, dyhat = vjp((ybar, yhatbar))
        pbar = jax.tree_util.tree_map(jnp.add, pbar, dp)
        return (y, yhat, dy, dyhat, pbar), None

    init = (y_T, yhat_T, ybar, jnp.zeros_like(ybar), pbar0)
    (y0, yhat0, ybar0, yhatbar0, pbar), _ = jax.lax.scan(
        step, init, jnp.arange(n_steps))
    # x0 seeds both y_0 and yhat_0 (and the first drift eval's input); the
    # local vjp chain already folds the f0/g0 dependence into yhat's bar.
    x0bar = ybar0 + yhatbar0
    return pbar, x0bar, None, None, None


_rev_heun.defvjp(_rev_heun_fwd, _rev_heun_bwd)


def odeint_reversible_heun(func: Callable, params, x0: Array, t0: float,
                           t1: float, n_steps: int) -> Array:
    """Deterministic special case (g = 0): reversible Heun's method with
    exact O(1)-memory gradients."""
    zero = lambda t: jnp.zeros_like(t)
    key = jax.random.PRNGKey(0)  # unused: dW multiplied by g = 0
    return sdeint_reversible_heun(func, zero, params, x0, t0, t1, n_steps,
                                  key)
