"""Purification-runner tests: shapes, determinism, gradients, statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.purify import PurifyConfig, purify
from diffpure_tpu.diffusion.sde import VPSDE


SHAPE = (4, 8, 8, 3)


def unit_gaussian_score_model(params, x, t):
    """Analytic epsilon model for x0 ~ N(0, I): marginal variance is 1 for
    all t under VP, so score(x,t) = -x and eps = std * x => score adapter
    -eps/std recovers -x exactly. `params['gain']` lets grad tests flow."""
    sde = VPSDE()
    t_cont = t / 999.0
    _, std = sde.marginal_prob(jnp.zeros_like(x), t_cont)
    return params["gain"] * std.reshape(-1, 1, 1, 1) * x


PARAMS = {"gain": jnp.array(1.0)}


class TestSDERunner:
    def test_shape_and_finite(self, key):
        cfg = PurifyConfig(diffusion_type="sde", t=20)
        x = jax.random.normal(key, SHAPE)
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic_given_key(self, key):
        cfg = PurifyConfig(t=20)
        x = jax.random.normal(key, SHAPE)
        k = jax.random.fold_in(key, 1)
        o1 = purify(unit_gaussian_score_model, PARAMS, x, k, cfg)
        o2 = purify(unit_gaussian_score_model, PARAMS, x, k, cfg)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        o3 = purify(unit_gaussian_score_model, PARAMS, x,
                    jax.random.fold_in(key, 2), cfg)
        assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def test_preserves_unit_gaussian(self, key):
        """With the exact score of N(0,I), purified samples stay ~N(0,I)."""
        cfg = PurifyConfig(t=100)
        x = jax.random.normal(key, (64, 4, 4, 1))
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        v = float(jnp.var(out))
        m = float(jnp.mean(out))
        assert abs(m) < 0.15 and abs(v - 1.0) < 0.3, (m, v)

    def test_grad_flows_checkpoint(self, key):
        cfg = PurifyConfig(t=10, grad_mode="checkpoint")
        x = jax.random.normal(key, SHAPE)

        def loss(xx):
            return jnp.sum(purify(unit_gaussian_score_model, PARAMS, xx,
                                  jax.random.fold_in(key, 1), cfg) ** 2)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_adjoint_close_to_checkpoint(self, key):
        x = jax.random.normal(key, (2, 4, 4, 1))
        k = jax.random.fold_in(key, 1)

        def loss(mode, xx):
            cfg = PurifyConfig(t=50, grad_mode=mode)
            return jnp.sum(purify(unit_gaussian_score_model, PARAMS, xx,
                                  k, cfg) ** 2)

        v_c = float(loss("checkpoint", x))
        v_a = float(loss("adjoint", x))
        np.testing.assert_allclose(v_a, v_c, rtol=1e-5)
        g_c = jax.grad(lambda xx: loss("checkpoint", xx))(x)
        g_a = jax.grad(lambda xx: loss("adjoint", xx))(x)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_c),
                                   rtol=0.1, atol=5e-3)

    def test_grad_none_stops(self, key):
        cfg = PurifyConfig(t=10, grad_mode="none")
        x = jax.random.normal(key, SHAPE)
        g = jax.grad(lambda xx: jnp.sum(purify(
            unit_gaussian_score_model, PARAMS, xx,
            jax.random.fold_in(key, 1), cfg) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_sample_step_concat(self, key):
        cfg = PurifyConfig(t=10, sample_step=2)
        x = jax.random.normal(key, SHAPE)
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == (2 * SHAPE[0],) + SHAPE[1:]

    def test_rand_t_traced(self, key):
        cfg = PurifyConfig(t=20, rand_t=True, t_delta=5)
        x = jax.random.normal(key, SHAPE)
        out = jax.jit(lambda xx, kk: purify(
            unit_gaussian_score_model, PARAMS, xx, kk, cfg))(
                x, jax.random.fold_in(key, 1))
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()

    def test_jit_compiles_once(self, key):
        cfg = PurifyConfig(t=10)
        calls = []

        def counting_model(params, x, t):
            calls.append(1)
            return unit_gaussian_score_model(params, x, t)

        f = jax.jit(lambda xx, kk: purify(counting_model, PARAMS, xx, kk, cfg))
        x = jax.random.normal(key, SHAPE)
        f(x, key)
        n_traces = len(calls)
        f(x + 1, jax.random.fold_in(key, 5))
        assert len(calls) == n_traces  # no retrace


class TestODERunner:
    def test_shape_and_deterministic_solver(self, key):
        cfg = PurifyConfig(diffusion_type="ode", t=20, step_size=1e-3)
        x = jax.random.normal(key, SHAPE)
        k = jax.random.fold_in(key, 1)
        o1 = purify(unit_gaussian_score_model, PARAMS, x, k, cfg)
        assert o1.shape == SHAPE
        # same key => same forward noise => identical (deterministic reverse)
        o2 = purify(unit_gaussian_score_model, PARAMS, x, k, cfg)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_grad_flows(self, key):
        cfg = PurifyConfig(diffusion_type="ode", t=10)
        x = jax.random.normal(key, SHAPE)
        g = jax.grad(lambda xx: jnp.sum(purify(
            unit_gaussian_score_model, PARAMS, xx,
            jax.random.fold_in(key, 1), cfg) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


class TestLDSDERunner:
    def test_stays_near_input(self, key):
        """LD dynamics are anchored to x_init by the (x-x_init)/sigma2 term."""
        cfg = PurifyConfig(diffusion_type="ldsde", t=100, sigma2=1e-3,
                           lambda_ld=1e-2, eta=5.0)
        x = jax.random.normal(key, SHAPE) * 0.5
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == SHAPE
        # anchoring keeps it within a moderate distance
        assert float(jnp.mean((out - x) ** 2)) < 1.0


class TestDiscreteRunners:
    def _eps_model_learned_sigma(self, params, x, t):
        eps = unit_gaussian_score_model(params, x, t / 1000.0 * 999.0)
        return jnp.concatenate([eps, jnp.zeros_like(x)], axis=-1)

    def test_guided_ddpm(self, key):
        cfg = PurifyConfig(diffusion_type="ddpm", t=20,
                           score_type="guided_diffusion", grad_mode="none")
        x = jax.random.normal(key, SHAPE) * 0.5
        out = purify(self._eps_model_learned_sigma, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out)).max() <= 3.0

    def test_celebahq_ddpm(self, key):
        cfg = PurifyConfig(diffusion_type="celebahq-ddpm", t=20,
                           grad_mode="none")

        def eps_model(params, x, t):
            return unit_gaussian_score_model(params, x, t)

        x = jax.random.normal(key, SHAPE) * 0.5
        out = purify(eps_model, PARAMS, x, jax.random.fold_in(key, 1), cfg)
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_type_raises(self, key):
        with pytest.raises(NotImplementedError):
            purify(unit_gaussian_score_model, PARAMS,
                   jnp.zeros(SHAPE), key, PurifyConfig(diffusion_type="nope"))


class TestDPMRunner:
    def test_preserves_unit_gaussian_few_steps(self, key):
        """DPM-Solver++(2M) with 10 evals matches the defense semantics."""
        cfg = PurifyConfig(diffusion_type="dpm", t=100, n_steps=10)
        x = jax.random.normal(key, (64, 4, 4, 1))
        out = purify(unit_gaussian_score_model, PARAMS, x,
                     jax.random.fold_in(key, 1), cfg)
        assert out.shape == x.shape
        m, v = float(jnp.mean(out)), float(jnp.var(out))
        assert abs(m) < 0.15 and abs(v - 1.0) < 0.35, (m, v)

    def test_matches_euler_ode_on_exact_score(self, key):
        """High-order solver at 10 steps ~ Euler ODE at 100 steps when the
        score is exact (same deterministic flow; same forward noise)."""
        x = jax.random.normal(key, (8, 4, 4, 1)) * 0.7
        k = jax.random.fold_in(key, 1)
        cfg_dpm = PurifyConfig(diffusion_type="dpm", t=100, n_steps=10)
        cfg_ode = PurifyConfig(diffusion_type="ode", t=100, step_size=1e-3)
        out_dpm = purify(unit_gaussian_score_model, PARAMS, x, k, cfg_dpm)
        out_ode = purify(unit_gaussian_score_model, PARAMS, x, k, cfg_ode)
        # same Brownian forward noise => comparable trajectories
        diff = float(jnp.sqrt(jnp.mean((out_dpm - out_ode) ** 2)))
        scale = float(jnp.sqrt(jnp.mean(out_ode ** 2)))
        assert diff < 0.15 * scale + 0.05, (diff, scale)

    def test_grad_flows(self, key):
        cfg = PurifyConfig(diffusion_type="dpm", t=50, n_steps=8)
        x = jax.random.normal(key, (2, 4, 4, 1))
        g = jax.grad(lambda xx: jnp.sum(purify(
            unit_gaussian_score_model, PARAMS, xx,
            jax.random.fold_in(key, 1), cfg) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_rand_t_dpm(self, key):
        cfg = PurifyConfig(diffusion_type="dpm", t=40, n_steps=8,
                           rand_t=True, t_delta=10)
        x = jax.random.normal(key, (2, 4, 4, 1))
        out = jax.jit(lambda xx, kk: purify(
            unit_gaussian_score_model, PARAMS, xx, kk, cfg))(
                x, jax.random.fold_in(key, 1))
        assert np.isfinite(np.asarray(out)).all()

    def test_guided_ddpm_respaced_ddim(self, key):
        """Respaced DDIM purification: t* in respaced indices, ddim updates
        (the ImageNet NFE-reduction path)."""
        from diffpure_tpu.purify.runners import (
            make_imagenet_diffusion, purify_guided_ddpm,
        )
        cfg = PurifyConfig(diffusion_type="ddpm", t=5,
                           score_type="guided_diffusion", grad_mode="none")
        diffusion = make_imagenet_diffusion("ddim25")
        assert diffusion.num_timesteps == 25
        x = jax.random.normal(key, SHAPE) * 0.5
        out = purify_guided_ddpm(
            TestDiscreteRunners()._eps_model_learned_sigma, PARAMS, x,
            jax.random.fold_in(key, 1), cfg, diffusion=diffusion,
            use_ddim=True)
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()
