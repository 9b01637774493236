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


class TestGuidedScoreGradients:
    """White-box gradients through guided_diffusion-score purifiers.

    The reference's ImageNet AutoAttack protocol differentiates THROUGH the
    ADM purifier over the reverse VP-SDE (--diffusion_type sde with
    --score_type guided_diffusion: ref run_scripts/imagenet/
    run_in_rand_inf.sh:15-24, eval_sde_adv.py:103-110,
    runners/diffpure_sde.py:101-112) — so every guided-score runner variant
    needs a pinned VJP, not just the CIFAR score_sde pair. These pin the
    eps->score adapter gradient (the learn_sigma jnp.split channel-half)
    composed with each solver, at CPU sizes.
    """

    @staticmethod
    def _guided_eps(var_gain):
        """Smooth 6-channel guided-diffusion-style model: eps head depends
        on x, var head = var_gain * x^2 (must NOT leak into gradients)."""
        def model(params, x, steps):
            sf = steps.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1)) / 1000.0
            eps = params["gain"] * jnp.tanh(x) * (1.0 + 0.1 * sf)
            return jnp.concatenate([eps, var_gain * x * x], axis=-1)
        return model

    def _fd_check(self, loss, x, key, rtol=2e-2, eps_fd=3e-3):
        """Directional finite-difference vs backprop on a fixed direction."""
        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
        d = jax.random.normal(key, x.shape)
        d = d / jnp.sqrt(jnp.sum(d * d))
        fd = (loss(x + eps_fd * d) - loss(x - eps_fd * d)) / (2 * eps_fd)
        bp = jnp.sum(g * d)
        np.testing.assert_allclose(float(bp), float(fd),
                                   rtol=rtol, atol=5e-4)

    def test_var_half_gradient_is_discarded(self, key):
        """jnp.split channel-half semantics: the learned-variance half must
        contribute neither to the purified output nor to its gradient
        (ref diffpure_sde.py:101-112 splits dim=1 and keeps eps)."""
        cfg = PurifyConfig(diffusion_type="sde", t=5,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        x = jax.random.normal(key, SHAPE) * 0.5
        k = jax.random.fold_in(key, 1)

        outs, grads = [], []
        for vg in (0.0, 7.0):
            f = lambda xx: jnp.sum(purify(self._guided_eps(vg), PARAMS,  # noqa: E731,B023
                                          xx, k, cfg) ** 2)
            grads.append(np.asarray(jax.grad(f)(x)))
            outs.append(np.asarray(purify(self._guided_eps(vg), PARAMS,
                                          x, k, cfg)))
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(grads[0], grads[1])

    def test_guided_sde_grad_matches_fd(self, key):
        """Exact backprop through the guided-score reverse-SDE purifier
        (the ImageNet-256 white-box attack path) vs finite differences."""
        cfg = PurifyConfig(diffusion_type="sde", t=5,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        x = jax.random.normal(key, (2, 4, 4, 3)) * 0.5
        k = jax.random.fold_in(key, 1)
        w = jax.random.normal(jax.random.fold_in(key, 2), (2, 4, 4, 3))
        loss = lambda xx: jnp.sum(  # noqa: E731
            purify(self._guided_eps(3.0), PARAMS, xx, k, cfg) * w)
        self._fd_check(loss, x, jax.random.fold_in(key, 3))

    def test_guided_sde_grad_toy_adm(self, key):
        """jax.grad through purify(score_type='guided_diffusion') with a
        real (tiny) ADMUNet: pins the eps->score VJP composed with
        GroupNorm32/FiLM/attention blocks (the actual 552M graph shape)."""
        from diffpure_tpu.models.adm_unet import ADMUNet

        model = ADMUNet(image_size=8, in_channels=3, model_channels=32,
                        out_channels=6, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16,
                        resblock_updown=True, use_scale_shift_norm=True)
        key_p, key_x, key_r, key_d = (jax.random.fold_in(key, i)
                                      for i in range(4))
        params = model.init(key_p, jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32))
        cfg = PurifyConfig(diffusion_type="sde", t=3,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        x = jax.random.uniform(key_x, (2, 8, 8, 3)) * 2 - 1
        loss = lambda xx: jnp.sum(purify(  # noqa: E731
            lambda p, a, t: model.apply(p, a, t), params, xx, key_r,
            cfg) ** 2)
        self._fd_check(loss, x, key_d, rtol=5e-2)

    def test_guided_ddpm_ancestral_grad_matches_fd(self, key):
        """grad through the discrete guided loop (p_sample ancestral steps,
        LEARNED_RANGE variance, clip_denoised) under grad_mode='checkpoint'
        — the reference runs this no-grad/BPDA (diffpure_guided.py:42) but
        the runner keeps the scan differentiable when asked."""
        cfg = PurifyConfig(diffusion_type="ddpm", t=4,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        x = jax.random.normal(key, (2, 4, 4, 3)) * 0.3
        k = jax.random.fold_in(key, 1)
        loss = lambda xx: jnp.sum(  # noqa: E731
            purify(self._guided_eps(2.0), PARAMS, xx, k, cfg) ** 2)
        self._fd_check(loss, x, jax.random.fold_in(key, 2))

    def test_guided_ddim_respaced_grad_matches_fd(self, key):
        """grad through respaced DDIM purification (SpacedDiffusion +
        deterministic ddim_sample; ref respace.py:71-135) — every
        differentiable runner variant gets a grad test."""
        from diffpure_tpu.purify.runners import (
            make_imagenet_diffusion, purify_guided_ddpm,
        )
        cfg = PurifyConfig(diffusion_type="ddpm", t=4,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        diffusion = make_imagenet_diffusion("ddim25")
        x = jax.random.normal(key, (2, 4, 4, 3)) * 0.3
        k = jax.random.fold_in(key, 1)
        loss = lambda xx: jnp.sum(purify_guided_ddpm(  # noqa: E731
            self._guided_eps(2.0), PARAMS, xx, k, cfg,
            diffusion=diffusion, use_ddim=True) ** 2)
        self._fd_check(loss, x, jax.random.fold_in(key, 2))

    def test_guided_sde_sample_step2_grad(self, key):
        """sample_step>1 (iterated purification, ref --sample_step) stays
        differentiable end-to-end: gradient flows through BOTH iterations
        (the second iteration re-noises the first's output)."""
        cfg = PurifyConfig(diffusion_type="sde", t=4, sample_step=2,
                           score_type="guided_diffusion",
                           grad_mode="checkpoint")
        x = jax.random.normal(key, (2, 4, 4, 3)) * 0.5
        k = jax.random.fold_in(key, 1)
        loss = lambda xx: jnp.sum(  # noqa: E731
            purify(self._guided_eps(1.0), PARAMS, xx, k, cfg) ** 2)
        self._fd_check(loss, x, jax.random.fold_in(key, 2))
        # the second iteration's output must depend on x (not just noise)
        out = purify(self._guided_eps(1.0), PARAMS, x, k, cfg)
        assert out.shape[0] == 2 * x.shape[0]
        g2 = jax.grad(lambda xx: jnp.sum(purify(
            self._guided_eps(1.0), PARAMS, xx, k,
            cfg)[x.shape[0]:] ** 2))(x)
        assert float(jnp.abs(g2).max()) > 0


class TestDDIM50DepthClaim:
    def test_respaced_index8_is_abar_matched_to_t150(self):
        """Pin bench.py's ADM_DDIM_T = 8 (and GRADIENTS.md's ddim50 route):
        on the ddim50 respacing of the 1000-step linear schedule, respaced
        index 8 maps to original step 160 and its cumulative alpha-bar
        EQUALS the original schedule's at that step — the abar-matched
        depth closest to the reference's t* = 150
        (ref guided_diffusion/respace.py:71-135). A schedule/respacing
        regression would silently change the purification depth every
        benched ddim50 number relies on."""
        import numpy as np

        from diffpure_tpu.purify.runners import make_imagenet_diffusion

        d50 = make_imagenet_diffusion("ddim50")
        d1000 = make_imagenet_diffusion("1000")
        a50 = np.asarray(d50.alphas_cumprod)
        a1000 = np.asarray(d1000.alphas_cumprod)

        assert d50.timestep_map[8] == 160
        assert np.isclose(a50[8], a1000[160], rtol=0, atol=1e-12)
        # 160 is the closest original step to the respaced depth, and the
        # nearest-abar original index to a50[8] is 160 itself (not 150 —
        # the respacing can only land on multiples of 20)
        assert int(np.argmin(np.abs(a1000 - a50[8]))) == 160
        assert abs(160 - 150) <= 10  # within one respacing stride of t*
