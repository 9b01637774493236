"""PC sampler library, EMA, and training-loss tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.diffusion import VPSDE, VESDE
from diffpure_tpu.diffusion.sampling import (
    get_pc_sampler, get_ode_sampler, get_predictor, get_corrector,
)
from diffpure_tpu.models.ema import ExponentialMovingAverage
from diffpure_tpu.training import (
    get_optimizer, get_sde_loss_fn, get_smld_loss_fn, get_ddpm_loss_fn,
    get_step_fn,
)


def gaussian_score_fn(x, t):
    """Exact score of N(0, I) marginals under VP (unit-variance data)."""
    return -x


class TestPCSampler:
    def test_registries(self):
        for p in ["euler_maruyama", "reverse_diffusion", "ancestral_sampling",
                  "none"]:
            assert get_predictor(p) is not None
        for c in ["langevin", "ald", "none"]:
            assert get_corrector(c) is not None

    @pytest.mark.parametrize("predictor", ["euler_maruyama",
                                           "reverse_diffusion",
                                           "ancestral_sampling"])
    def test_vp_sampler_recovers_unit_gaussian(self, key, predictor):
        sde = VPSDE(N=100)
        sampler = get_pc_sampler(sde, (256, 4), predictor=predictor)
        x, nfe = sampler(key, gaussian_score_fn)
        assert x.shape == (256, 4)
        assert abs(float(jnp.mean(x))) < 0.2
        assert abs(float(jnp.var(x)) - 1.0) < 0.35

    def test_corrector_runs(self, key):
        sde = VPSDE(N=20)
        sampler = get_pc_sampler(sde, (8, 4), predictor="euler_maruyama",
                                 corrector="langevin", n_steps_each=2)
        x, nfe = sampler(key, gaussian_score_fn)
        assert np.isfinite(np.asarray(x)).all()
        assert nfe == 20 * 3

    def test_ode_sampler_deterministic(self, key):
        sde = VPSDE(N=50)
        sampler = get_ode_sampler(sde, (8, 4), n_steps=50)
        x1, _ = sampler(key, gaussian_score_fn)
        x2, _ = sampler(key, gaussian_score_fn)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_ve_ancestral(self, key):
        sde = VESDE(N=50)
        sampler = get_pc_sampler(sde, (16, 4),
                                 predictor="ancestral_sampling")

        def ve_score(x, t):
            _, std = sde.marginal_prob(x, t)
            var = 1.0 + std.reshape(-1, 1) ** 2
            return -x / var

        x, _ = sampler(key, ve_score)
        assert np.isfinite(np.asarray(x)).all()


class TestEMA:
    def test_update_moves_toward_params(self):
        params = {"w": jnp.zeros(3)}
        ema = ExponentialMovingAverage.create(params, decay=0.5,
                                              use_num_updates=False)
        new_params = {"w": jnp.ones(3)}
        ema = ema.update(new_params)
        np.testing.assert_allclose(np.asarray(ema.shadow_params["w"]), 0.5)
        ema = ema.update(new_params)
        np.testing.assert_allclose(np.asarray(ema.shadow_params["w"]), 0.75)

    def test_warmup_decay(self):
        params = {"w": jnp.zeros(1)}
        ema = ExponentialMovingAverage.create(params, decay=0.9999)
        ema = ema.update({"w": jnp.ones(1)})
        # first update: decay = min(0.9999, 2/11) => shadow ~ 1-2/11
        np.testing.assert_allclose(np.asarray(ema.shadow_params["w"]),
                                   1 - 2 / 11, rtol=1e-5)

    def test_store_restore_roundtrip(self):
        params = {"w": jnp.arange(3.0)}
        ema = ExponentialMovingAverage.create(params, decay=0.9)
        snap = ema.store(params)
        restored = ExponentialMovingAverage.restore(snap)
        np.testing.assert_allclose(np.asarray(restored["w"]),
                                   np.asarray(params["w"]))

    def test_jittable(self):
        params = {"w": jnp.zeros(3)}
        ema = ExponentialMovingAverage.create(params, decay=0.99)

        @jax.jit
        def f(ema, p):
            return ema.update(p)

        out = f(ema, {"w": jnp.ones(3)})
        assert np.isfinite(np.asarray(out.shadow_params["w"])).all()


class LinearScoreModel:
    """model(x, t) -> -x * scale: epsilon-style output for loss tests."""

    @staticmethod
    def apply(params, x, t):
        return params["scale"] * x


class TestTrainingLosses:
    def test_sde_loss_finite_and_differentiable(self, key):
        sde = VPSDE()
        loss_fn = get_sde_loss_fn(sde, train=True)
        params = {"scale": jnp.array(0.5)}
        batch = jax.random.normal(key, (8, 4, 4, 3))

        def wrapped(p):
            return loss_fn(key, lambda x, t: LinearScoreModel.apply(p, x, t),
                           batch)

        loss, g = jax.value_and_grad(wrapped)(params)
        assert np.isfinite(float(loss)) and np.isfinite(float(g["scale"]))

    def test_likelihood_weighting(self, key):
        sde = VPSDE()
        loss_fn = get_sde_loss_fn(sde, train=True, likelihood_weighting=True)
        batch = jax.random.normal(key, (4, 2, 2, 1))
        loss = loss_fn(key, lambda x, t: jnp.zeros_like(x), batch)
        assert np.isfinite(float(loss))

    def test_smld_ddpm_losses(self, key):
        batch = jax.random.normal(key, (4, 2, 2, 1))
        l1 = get_smld_loss_fn(VESDE(N=100), True)(
            key, lambda x, t: jnp.zeros_like(x), batch)
        l2 = get_ddpm_loss_fn(VPSDE(N=100), True)(
            key, lambda x, t: jnp.zeros_like(x), batch)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))

    def test_step_fn_trains(self, key):
        sde = VPSDE()
        opt = get_optimizer(lr=1e-2, warmup=0)
        step_fn = get_step_fn(sde, train=True, optimizer=opt)
        params = {"scale": jnp.array(5.0)}
        state = dict(params=params, opt_state=opt.init(params),
                     step=jnp.zeros((), jnp.int32),
                     ema=ExponentialMovingAverage.create(params, 0.9))
        batch = jax.random.normal(key, (16, 4, 4, 1))
        losses = []
        for i in range(5):
            state, loss = step_fn(jax.random.fold_in(key, i), state, batch,
                                  LinearScoreModel.apply)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state["step"]) == 5

    def test_eval_step(self, key):
        sde = VPSDE()
        step_fn = get_step_fn(sde, train=False)
        params = {"scale": jnp.array(1.0)}
        state = dict(params=params, opt_state=None, step=0, ema=None)
        _, loss = step_fn(key, state, jax.random.normal(key, (4, 2, 2, 1)),
                          LinearScoreModel.apply)
        assert np.isfinite(float(loss))
