"""Integrator tests: EM vs hand-rolled loop, adjoint vs direct backprop vs FD."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.solvers import (
    sdeint_em, odeint_euler, sdeint_em_adjoint, odeint_euler_adjoint,
)
from diffpure_tpu.solvers.em import brownian_increment, sdeint_em_trajectory


class TestEulerMaruyama:
    def test_matches_hand_rolled_loop(self, key):
        """Fixed Brownian path: scan output == explicit python loop."""
        drift = lambda x, t: -0.5 * x
        diffusion = lambda t: jnp.full_like(t, 0.3)
        x0 = jnp.ones((2, 8))
        t0, t1, n = 0.0, 0.5, 20
        dt = (t1 - t0) / n
        out = sdeint_em(drift, diffusion, x0, t0, t1, n, key)

        x = np.asarray(x0)
        for i in range(n):
            dw = np.asarray(brownian_increment(key, jnp.asarray(i), x0.shape, dt))
            x = x + (-0.5 * x) * dt + 0.3 * dw
        np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-6)

    def test_deterministic_ou_statistics(self, key):
        """OU process dx = -x dt + sqrt(2) dW has stationary var 1."""
        drift = lambda x, t: -x
        diffusion = lambda t: jnp.full_like(t, np.sqrt(2.0))
        x0 = jnp.zeros((4096, 1))
        out = sdeint_em(drift, diffusion, x0, 0.0, 5.0, 500, key)
        assert abs(float(jnp.var(out)) - 1.0) < 0.1

    def test_zero_diffusion_equals_ode(self, key):
        drift = lambda x, t: -x
        zero = lambda t: jnp.zeros_like(t)
        x0 = jnp.ones((1, 4))
        sde_out = sdeint_em(drift, zero, x0, 0.0, 1.0, 100, key)
        ode_out = odeint_euler(drift, x0, 0.0, 1.0, 100)
        np.testing.assert_allclose(np.asarray(sde_out), np.asarray(ode_out),
                                   rtol=1e-6)

    def test_trajectory_endpoints(self, key):
        drift = lambda x, t: -x
        diffusion = lambda t: jnp.full_like(t, 0.1)
        x0 = jnp.ones((2, 4))
        traj = sdeint_em_trajectory(drift, diffusion, x0, 0.0, 1.0, 10, key)
        assert traj.shape == (11, 2, 4)
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0))
        end = sdeint_em(drift, diffusion, x0, 0.0, 1.0, 10, key)
        np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(end),
                                   rtol=1e-6)

    def test_grad_through_solver(self, key):
        """Exact linear SDE: d(sum x1)/dx0 = exp(-a T) per coordinate."""
        a = 0.7
        drift = lambda x, t: -a * x
        diffusion = lambda t: jnp.full_like(t, 0.2)

        def loss(x0):
            return jnp.sum(sdeint_em(drift, diffusion, x0, 0.0, 1.0, 400, key))

        g = jax.grad(loss)(jnp.ones((1, 4)))
        np.testing.assert_allclose(np.asarray(g), np.exp(-a), rtol=5e-3)


class TestOde:
    def test_exponential_decay(self):
        func = lambda x, t: -x
        out = odeint_euler(func, jnp.ones((1, 4)), 0.0, 1.0, 1000)
        np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=1e-3)

    def test_time_dependence(self):
        """dx/dt = t  =>  x(1) = x0 + 1/2."""
        func = lambda x, t: jnp.broadcast_to(t[:, None], x.shape)
        out = odeint_euler(func, jnp.zeros((1, 4)), 0.0, 1.0, 2000)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)


class TestAdjoint:
    def _param_drift(self, p, x, t):
        return -p["a"] * x + p["b"]

    def test_sde_adjoint_matches_direct(self, key):
        params = {"a": jnp.array(0.8), "b": jnp.array(0.1)}
        diffusion = lambda t: jnp.full_like(t, 0.15)
        x0 = jnp.ones((2, 4))
        t0, t1, n = 0.0, 0.5, 200

        def loss_adj(p, x):
            return jnp.sum(sdeint_em_adjoint(self._param_drift, diffusion,
                                             p, x, t0, t1, n, key))

        def loss_direct(p, x):
            return jnp.sum(sdeint_em(lambda xx, tt: self._param_drift(p, xx, tt),
                                     diffusion, x, t0, t1, n, key))

        ga_p, ga_x = jax.grad(loss_adj, argnums=(0, 1))(params, x0)
        gd_p, gd_x = jax.grad(loss_direct, argnums=(0, 1))(params, x0)
        np.testing.assert_allclose(np.asarray(ga_x), np.asarray(gd_x), rtol=2e-2)
        np.testing.assert_allclose(float(ga_p["a"]), float(gd_p["a"]), rtol=2e-2)
        np.testing.assert_allclose(float(ga_p["b"]), float(gd_p["b"]), rtol=2e-2)

    def test_sde_adjoint_vs_finite_differences(self, key):
        params = {"a": jnp.array(0.5), "b": jnp.array(0.0)}
        diffusion = lambda t: jnp.full_like(t, 0.1)
        x0 = jnp.full((1, 2), 1.5)

        def loss(p):
            return float(jnp.sum(sdeint_em_adjoint(
                self._param_drift, diffusion, p, x0, 0.0, 0.3, 100, key)))

        g = jax.grad(lambda p: jnp.sum(sdeint_em_adjoint(
            self._param_drift, diffusion, p, x0, 0.0, 0.3, 100, key)))(params)
        eps = 1e-3
        fd = (loss({"a": params["a"] + eps, "b": params["b"]})
              - loss({"a": params["a"] - eps, "b": params["b"]})) / (2 * eps)
        np.testing.assert_allclose(float(g["a"]), fd, rtol=5e-2, atol=1e-4)

    def test_ode_adjoint_matches_direct(self):
        params = {"a": jnp.array(1.2), "b": jnp.array(-0.3)}
        x0 = jnp.ones((2, 3))

        def loss_adj(p, x):
            return jnp.sum(odeint_euler_adjoint(self._param_drift, p, x,
                                                0.0, 1.0, 400))

        def loss_direct(p, x):
            return jnp.sum(odeint_euler(
                lambda xx, tt: self._param_drift(p, xx, tt), x, 0.0, 1.0, 400))

        ga_p, ga_x = jax.grad(loss_adj, argnums=(0, 1))(params, x0)
        gd_p, gd_x = jax.grad(loss_direct, argnums=(0, 1))(params, x0)
        np.testing.assert_allclose(np.asarray(ga_x), np.asarray(gd_x), rtol=1e-2)
        np.testing.assert_allclose(float(ga_p["a"]), float(gd_p["a"]), rtol=1e-2)

    def test_adjoint_forward_value_identical(self, key):
        """Adjoint and direct solvers share the exact forward trajectory."""
        params = {"a": jnp.array(0.8), "b": jnp.array(0.1)}
        diffusion = lambda t: jnp.full_like(t, 0.15)
        x0 = jnp.ones((2, 4))
        adj = sdeint_em_adjoint(self._param_drift, diffusion, params, x0,
                                0.0, 0.5, 50, key)
        direct = sdeint_em(lambda x, t: self._param_drift(params, x, t),
                           diffusion, x0, 0.0, 0.5, 50, key)
        np.testing.assert_allclose(np.asarray(adj), np.asarray(direct),
                                   rtol=1e-6)

    def test_adjoint_jittable(self, key):
        params = {"a": jnp.array(0.5), "b": jnp.array(0.0)}
        diffusion = lambda t: jnp.full_like(t, 0.1)

        @jax.jit
        def f(p, x):
            return jax.grad(lambda pp: jnp.sum(sdeint_em_adjoint(
                self._param_drift, diffusion, pp, x, 0.0, 0.2, 20, key)))(p)

        g = f(params, jnp.ones((1, 2)))
        assert np.isfinite(float(g["a"]))


class TestHeun:
    def test_second_order_convergence(self):
        """Heun error ~ O(dt^2): quartering steps should ~16x the error of
        exp decay; Euler only ~4x."""
        from diffpure_tpu.solvers.ode import odeint_heun
        func = lambda x, t: -x
        exact = np.exp(-1.0)

        def err(n):
            out = odeint_heun(func, jnp.ones((1, 1)), 0.0, 1.0, n)
            return abs(float(out[0, 0]) - exact)

        e10, e40 = err(10), err(40)
        assert e40 < e10 / 10  # clearly super-linear

    def test_purify_ode_heun(self, key=None):
        import jax
        from diffpure_tpu.purify import PurifyConfig, purify
        from tests.test_purify import unit_gaussian_score_model, PARAMS
        key = jax.random.PRNGKey(0)
        cfg = PurifyConfig(diffusion_type="ode", t=20, ode_method="heun")
        x = jax.random.normal(key, (2, 4, 4, 1))
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
