"""Tests for discrete Gaussian diffusion + respacing against numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.diffusion import (
    GaussianDiffusion, ModelMeanType, ModelVarType, SpacedDiffusion,
    get_named_beta_schedule, space_timesteps,
)
from diffpure_tpu.diffusion.schedules import (
    linear_beta_schedule, scaled_linear_beta_schedule, cosine_beta_schedule,
)


def make_diffusion(n=100, **kw):
    betas = linear_beta_schedule(n, 1e-4, 2e-2)
    return GaussianDiffusion.from_betas(betas, **kw)


class TestSchedules:
    def test_scaled_linear_matches_guided_convention(self):
        betas = scaled_linear_beta_schedule(1000)
        assert np.isclose(betas[0], 1e-4) and np.isclose(betas[-1], 2e-2)
        betas500 = scaled_linear_beta_schedule(500)
        assert np.isclose(betas500[0], 2e-4) and np.isclose(betas500[-1], 4e-2)

    def test_cosine_valid(self):
        betas = cosine_beta_schedule(1000)
        assert (betas > 0).all() and (betas <= 0.999).all()

    def test_space_timesteps_ddim(self):
        steps = space_timesteps(1000, "ddim250")
        assert len(steps) == 250
        assert 0 in steps

    def test_space_timesteps_sections(self):
        steps = space_timesteps(100, "10")
        assert len(steps) == 10
        steps = space_timesteps(100, [25, 25])
        assert len(steps) == 50

    def test_space_timesteps_full(self):
        assert space_timesteps(100, "100") == set(range(100))


class TestForwardProcess:
    def test_q_sample_oracle(self, key):
        d = make_diffusion(100)
        x0 = jnp.ones((2, 4, 4, 3))
        t = jnp.array([10, 50])
        noise = jax.random.normal(key, x0.shape)
        xt = d.q_sample(key, x0, t, noise=noise)
        ac = d.alphas_cumprod
        expected = (np.sqrt(ac[np.array([10, 50])])[:, None, None, None] * np.asarray(x0)
                    + np.sqrt(1 - ac[np.array([10, 50])])[:, None, None, None]
                    * np.asarray(noise))
        np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5, atol=1e-6)

    def test_posterior_identities(self):
        """Posterior coefficients satisfy coef1*sqrt(abar_t/abar_prev) + coef2 == sqrt(alpha_t)... sanity via definition."""
        d = make_diffusion(50)
        betas = np.asarray(d.betas)
        ac, acp = d.alphas_cumprod, d.alphas_cumprod_prev
        c1 = betas * np.sqrt(acp) / (1 - ac)
        c2 = (1 - acp) * np.sqrt(1 - betas) / (1 - ac)
        np.testing.assert_allclose(d.posterior_mean_coef1, c1, rtol=1e-12)
        np.testing.assert_allclose(d.posterior_mean_coef2, c2, rtol=1e-12)
        # posterior of x0=xt=0 is 0
        m, v, lv = d.q_posterior_mean_variance(jnp.zeros((1, 2, 2, 1)),
                                               jnp.zeros((1, 2, 2, 1)),
                                               jnp.array([5]))
        np.testing.assert_allclose(np.asarray(m), 0.0)

    def test_eps_xstart_roundtrip(self, key):
        d = make_diffusion(100)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([30, 70])
        xt = d.q_sample(key, x0, t, noise=eps)
        x0_rec = d._predict_xstart_from_eps(xt, t, eps)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)
        eps_rec = d._predict_eps_from_xstart(xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                                   rtol=1e-3, atol=1e-4)


class TestPMeanVariance:
    def _zero_model(self, x, t):
        return jnp.zeros_like(x)

    def test_fixed_small(self):
        d = make_diffusion(100, model_mean_type=ModelMeanType.EPSILON,
                           model_var_type=ModelVarType.FIXED_SMALL)
        x = jnp.ones((1, 2, 2, 3)) * 0.5
        out = d.p_mean_variance(self._zero_model, x, jnp.array([10]))
        # eps=0 => pred_xstart = xt / sqrt(abar_t), clipped
        expected_x0 = np.clip(0.5 / np.sqrt(d.alphas_cumprod[10]), -1, 1)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]),
                                   expected_x0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["variance"]).ravel()[0],
                                   d.posterior_variance[10], rtol=1e-5)

    def test_learned_range_interpolation(self):
        d = make_diffusion(100, model_mean_type=ModelMeanType.EPSILON,
                           model_var_type=ModelVarType.LEARNED_RANGE)

        def model(x, t):
            # eps = 0, var logits v
            return jnp.concatenate([jnp.zeros_like(x),
                                    jnp.full_like(x, self_v)], axis=-1)

        x = jnp.ones((1, 2, 2, 3)) * 0.1
        t = jnp.array([20])
        for self_v, frac in [(1.0, 1.0), (-1.0, 0.0), (0.0, 0.5)]:
            out = d.p_mean_variance(model, x, t)
            min_log = d.posterior_log_variance_clipped[20]
            max_log = np.log(np.asarray(d.betas)[20])
            expected = frac * max_log + (1 - frac) * min_log
            np.testing.assert_allclose(np.asarray(out["log_variance"]).ravel()[0],
                                       expected, rtol=1e-5)

    def test_p_sample_t0_no_noise(self, key):
        d = make_diffusion(100)
        x = jnp.ones((2, 2, 2, 3)) * 0.3
        out = d.p_sample(key, self._zero_model, x, jnp.array([0, 0]))
        out2 = d.p_sample(jax.random.fold_in(key, 7), self._zero_model, x,
                          jnp.array([0, 0]))
        np.testing.assert_allclose(np.asarray(out["sample"]),
                                   np.asarray(out2["sample"]), atol=1e-6)


class TestDDIM:
    def test_ddim_deterministic(self, key):
        d = make_diffusion(100)
        model = lambda x, t: jnp.zeros_like(x)
        x = jnp.ones((1, 2, 2, 3)) * 0.4
        o1 = d.ddim_sample(key, model, x, jnp.array([50]), eta=0.0)
        o2 = d.ddim_sample(jax.random.fold_in(key, 3), model, x,
                           jnp.array([50]), eta=0.0)
        np.testing.assert_allclose(np.asarray(o1["sample"]),
                                   np.asarray(o2["sample"]), atol=1e-6)

    def test_ddim_roundtrip(self, key):
        """eta=0 encode then decode ~ identity for a linear model."""
        d = make_diffusion(100)
        model = lambda x, t: jnp.zeros_like(x)
        x = jnp.full((1, 2, 2, 3), 0.2)
        t = jnp.array([30])
        enc = d.ddim_reverse_sample(model, x, t, clip_denoised=False)["sample"]
        dec = d.ddim_sample(key, model, enc, t + 1, eta=0.0,
                            clip_denoised=False)["sample"]
        np.testing.assert_allclose(np.asarray(dec), np.asarray(x),
                                   rtol=1e-2, atol=1e-3)


class TestSpacedDiffusion:
    def test_respaced_alphabar_preserved(self):
        """Respaced cumprod at kept steps equals the original (ref respace.py:92-103)."""
        betas = get_named_beta_schedule("linear", 1000)
        use = sorted(space_timesteps(1000, "250"))
        sd = SpacedDiffusion.from_original(betas, use)
        assert sd.num_timesteps == 250
        orig_ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(sd.alphas_cumprod, orig_ac[np.array(use)],
                                   rtol=1e-10)

    def test_timestep_map(self):
        betas = get_named_beta_schedule("linear", 100)
        sd = SpacedDiffusion.from_original(betas, space_timesteps(100, "100"))
        assert list(sd.timestep_map) == list(range(100))

    def test_wrapped_model_remaps_t(self):
        betas = get_named_beta_schedule("linear", 100)
        sd = SpacedDiffusion.from_original(betas, space_timesteps(100, "10"))
        seen = {}

        def model(x, ts):
            seen["ts"] = ts
            return jnp.zeros_like(x)

        x = jnp.ones((1, 2, 2, 3))
        sd.p_mean_variance(model, x, jnp.array([3]))
        assert int(np.asarray(seen["ts"])[0]) == sd.timestep_map[3]

    def test_rescale_timesteps(self):
        betas = get_named_beta_schedule("linear", 100)
        sd = SpacedDiffusion.from_original(betas, space_timesteps(100, "10"),
                                           rescale_timesteps=True)
        seen = {}

        def model(x, ts):
            seen["ts"] = ts
            return jnp.zeros_like(x)

        sd.p_mean_variance(model, jnp.ones((1, 2, 2, 3)), jnp.array([3]))
        expected = sd.timestep_map[3] * (1000.0 / 100)
        np.testing.assert_allclose(np.asarray(seen["ts"])[0], expected)


class TestLoopAndLosses:
    def test_p_sample_loop_shapes(self, key):
        d = make_diffusion(10)
        model = lambda x, t: jnp.zeros_like(x)
        x = d.p_sample_loop(key, model, (2, 4, 4, 3))
        assert x.shape == (2, 4, 4, 3)
        x2 = d.p_sample_loop(key, model, (2, 4, 4, 3),
                             noise=jnp.ones((2, 4, 4, 3)), from_t=5)
        assert x2.shape == (2, 4, 4, 3)

    def test_training_losses_finite(self, key):
        d = make_diffusion(100, model_var_type=ModelVarType.LEARNED_RANGE)
        model = lambda x, t: jnp.concatenate([jnp.zeros_like(x),
                                              jnp.zeros_like(x)], axis=-1)
        x0 = jax.random.normal(key, (2, 4, 4, 3)) * 0.1
        terms = d.training_losses(key, model, x0, jnp.array([10, 50]))
        assert np.isfinite(np.asarray(terms["loss"])).all()
        assert terms["loss"].shape == (2,)


class TestClassifierGuidance:
    def test_condition_mean_shifts_toward_gradient(self, key):
        d = make_diffusion(100)
        model = lambda x, t: jnp.zeros_like(x)
        x = jnp.zeros((2, 2, 2, 3))
        t = jnp.array([50, 50])
        cond = lambda xx, tt: jnp.ones_like(xx)  # push up
        base = d.p_sample(key, model, x, t)["sample"]
        guided = d.p_sample(key, model, x, t, cond_fn=cond)["sample"]
        # same noise (same key) => difference is exactly variance * grad
        diff = np.asarray(guided - base)
        var = d.posterior_variance[50]
        np.testing.assert_allclose(diff, var, rtol=1e-4, atol=1e-6)

    def test_condition_score_ddim(self, key):
        d = make_diffusion(100)
        model = lambda x, t: jnp.zeros_like(x)
        x = jnp.full((1, 2, 2, 3), 0.1)
        t = jnp.array([50])
        cond = lambda xx, tt: jnp.ones_like(xx) * 0.1
        base = d.ddim_sample(key, model, x, t, eta=0.0)["sample"]
        guided = d.ddim_sample(key, model, x, t, cond_fn=cond,
                               eta=0.0)["sample"]
        assert not np.allclose(np.asarray(base), np.asarray(guided))
        assert np.isfinite(np.asarray(guided)).all()


class TestSRFactory:
    def test_sr_create_model_and_diffusion(self, key):
        from diffpure_tpu.models.factories import sr_create_model_and_diffusion
        model, diffusion = sr_create_model_and_diffusion(
            dict(large_size=64, small_size=16, num_channels=32,
                 num_res_blocks=1, attention_resolutions="16",
                 num_head_channels=16, learn_sigma=True,
                 diffusion_steps=100))
        x = jnp.zeros((1, 64, 64, 3))
        lr = jnp.zeros((1, 16, 16, 3))
        p = model.init(key, x, jnp.array([10]), low_res=lr)
        out = model.apply(p, x, jnp.array([10]), low_res=lr)
        assert out.shape == (1, 64, 64, 6)
        assert diffusion.num_timesteps == 100
