"""Tests for continuous SDE closed forms against independent numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.diffusion import VPSDE, SubVPSDE, VESDE


class TestVPSDE:
    def test_beta_endpoints(self):
        sde = VPSDE(beta_min=0.1, beta_max=20.0)
        assert np.isclose(float(sde.beta(jnp.array(0.0))), 0.1)
        assert np.isclose(float(sde.beta(jnp.array(1.0))), 20.0)

    def test_marginal_prob_oracle(self):
        """mean coef = exp(-t^2/4 (b1-b0) - t/2 b0); std = sqrt(1-coef^2)."""
        sde = VPSDE(beta_min=0.1, beta_max=20.0)
        t = np.array([0.01, 0.1, 0.5, 0.9], dtype=np.float32)
        x = np.ones((4, 2, 2, 3), dtype=np.float32)
        mean, std = sde.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        lmc = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
        np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, 0], np.exp(lmc), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(std), np.sqrt(1 - np.exp(2 * lmc)),
                                   rtol=1e-3, atol=2e-5)

    def test_discrete_continuous_alphabar_agree(self):
        """Discrete cumprod alpha-bar ~ continuous closed form (ref diffpure_sde.py:70-77)."""
        sde = VPSDE(N=1000)
        dis = sde.alphas_cumprod
        for step in [10, 100, 500, 999]:
            t = (step + 1) / 1000.0
            cont = float(sde.alphas_cumprod_cont(jnp.array(t)))
            assert abs(dis[step] - cont) < 2e-2, (step, dis[step], cont)

    def test_variance_preservation(self, key):
        """Var[x_t] -> 1 for unit-variance data as t -> 1."""
        sde = VPSDE()
        x0 = jax.random.normal(key, (2048,))
        m, s = sde.marginal_coeffs(jnp.array(0.999))
        xt = m * x0 + s * jax.random.normal(jax.random.fold_in(key, 1), (2048,))
        assert abs(float(jnp.var(xt)) - 1.0) < 0.15

    def test_sde_drift_diffusion(self):
        sde = VPSDE()
        x = jnp.ones((2, 8))
        t = jnp.array([0.5, 0.5])
        drift, diffusion = sde.sde(x, t)
        beta = 0.1 + 0.5 * (20.0 - 0.1)
        np.testing.assert_allclose(np.asarray(drift), -0.5 * beta, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(diffusion), np.sqrt(beta), rtol=1e-5)

    def test_discretize_matches_ddpm(self):
        """VPSDE.discretize reproduces the DDPM update coefficients."""
        sde = VPSDE(N=1000)
        x = jnp.ones((1, 4))
        step = 100
        t = jnp.array([step / 999.0])
        f, G = sde.discretize(x, t)
        betas = sde.discrete_betas
        np.testing.assert_allclose(np.asarray(f)[0, 0],
                                   np.sqrt(1 - betas[step]) - 1, rtol=1e-4)
        np.testing.assert_allclose(float(G[0]), np.sqrt(betas[step]), rtol=1e-4)

    def test_prior_logp(self):
        sde = VPSDE()
        z = jnp.zeros((2, 4))
        logp = sde.prior_logp(z)
        np.testing.assert_allclose(np.asarray(logp),
                                   -4 / 2 * np.log(2 * np.pi), rtol=1e-4)


class TestSubVPSDE:
    def test_std_no_sqrt(self):
        """sub-VP std = 1 - exp(2 lmc), *not* its sqrt (ref sde_lib.py:196-200)."""
        sde = SubVPSDE()
        t = jnp.array([0.5])
        _, std = sde.marginal_prob(jnp.ones((1, 4)), t)
        lmc = -0.25 * 0.25 * (20.0 - 0.1) - 0.25 * 0.1
        np.testing.assert_allclose(float(std[0]), 1 - np.exp(2 * lmc), rtol=1e-5)

    def test_diffusion_discount(self):
        sde = SubVPSDE()
        t = jnp.array([0.5])
        _, diffusion = sde.sde(jnp.ones((1, 4)), t)
        beta = 0.1 + 0.5 * 19.9
        discount = 1 - np.exp(-2 * 0.1 * 0.5 - 19.9 * 0.25)
        np.testing.assert_allclose(float(diffusion[0]),
                                   np.sqrt(beta * discount), rtol=1e-5)


class TestVESDE:
    def test_sigma_geometric(self):
        sde = VESDE(sigma_min=0.01, sigma_max=50.0)
        assert np.isclose(float(sde.sigma(jnp.array(0.0))), 0.01)
        assert np.isclose(float(sde.sigma(jnp.array(1.0))), 50.0, rtol=1e-5)
        assert np.isclose(float(sde.sigma(jnp.array(0.5))),
                          np.sqrt(0.01 * 50.0), rtol=1e-5)

    def test_marginal_is_additive(self):
        sde = VESDE()
        x = jnp.full((2, 3), 7.0)
        mean, std = sde.marginal_prob(x, jnp.array([0.3, 0.3]))
        np.testing.assert_allclose(np.asarray(mean), 7.0)
        assert std.shape == (2,)


class TestReverse:
    def test_reverse_drift(self):
        """Reverse drift = f - g^2 score; prob-flow halves the correction."""
        sde = VPSDE()
        score = lambda x, t: -x  # score of N(0,1)
        x = jnp.ones((2, 4))
        t = jnp.array([0.5, 0.5])
        f_fwd, g = sde.sde(x, t)
        rev = sde.reverse(score)
        drift, diffusion = rev.sde(x, t)
        expected = np.asarray(f_fwd) - np.asarray(g)[:, None] ** 2 * np.asarray(score(x, t))
        np.testing.assert_allclose(np.asarray(drift), expected, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(diffusion), np.asarray(g), rtol=1e-5)

        pf = sde.reverse(score, probability_flow=True)
        drift_pf, diffusion_pf = pf.sde(x, t)
        expected_pf = np.asarray(f_fwd) - 0.5 * np.asarray(g)[:, None] ** 2 * np.asarray(score(x, t))
        np.testing.assert_allclose(np.asarray(drift_pf), expected_pf, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(diffusion_pf), 0.0)


def test_jittable():
    sde = VPSDE()

    @jax.jit
    def f(x, t):
        return sde.marginal_prob(x, t)

    mean, std = f(jnp.ones((2, 4)), jnp.array([0.1, 0.2]))
    assert mean.shape == (2, 4) and std.shape == (2,)
