"""The five purification runners behind one jittable purify() API.

TPU-native rebuild of runners/diffpure_{sde,ode,ldsde,guided,ddpm}.py:
each runner is a pure function (params, x, key) -> x_pure built from the
scan-based solvers; the whole purify+classify pipeline compiles to a single
XLA program. Images are NHWC in [-1, 1] (ref image_editing_sample contract).

Differentiability: grad_mode='checkpoint' backpropagates exactly through the
rematerialized scan; 'adjoint' uses the O(1)-memory custom-VJP adjoint
(replaces torchsde.sdeint_adjoint, ref diffpure_sde.py:236-238); 'none' stops
gradients (the BPDA purifiers run under no_grad in the reference,
ref diffpure_guided.py:42, diffpure_ddpm.py:103).

Step-count note: the reference relies on torchsde's default dt=1e-3, giving
t* Euler steps with a truncated final step over the span t*/1000 - 1e-5; we
use t* uniform steps of dt = span/t* (within 1% per-step, identical in
distribution). ODE matches --step_size the same way.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import record_nfe
import numpy as np

from diffpure_tpu.diffusion.discrete import GaussianDiffusion, ModelMeanType, \
    ModelVarType, SpacedDiffusion, _extract
from diffpure_tpu.diffusion.schedules import get_named_beta_schedule, \
    linear_beta_schedule
from diffpure_tpu.diffusion.score import eps_to_score_continuous_vp, get_score_fn
from diffpure_tpu.diffusion.sde import VPSDE, batch_mul
from diffpure_tpu.purify.config import PurifyConfig
from diffpure_tpu.solvers.adjoint import sdeint_em_adjoint, odeint_euler_adjoint
from diffpure_tpu.solvers.em import sdeint_em
from diffpure_tpu.solvers.ode import odeint_euler, odeint_heun

Array = jax.Array
# model_fn(params, x_img, t_cond) -> model output (eps [+ sigma] or score input)
ModelFn = Callable[[object, Array, Array], Array]


def _make_score_fn(model_fn: ModelFn, params, cfg: PurifyConfig):
    """Continuous-time score(x, t) from the epsilon model.

    Two adapter paths with *different* alpha-bars kept deliberately
    (ref diffpure_sde.py:101-120; SURVEY.md §7.1.3).
    """
    sde = VPSDE(beta_min=cfg.beta_min, beta_max=cfg.beta_max, N=cfg.N)
    if cfg.score_type == "guided_diffusion":
        def score_fn(x, t):
            disc_steps = (t * cfg.N).astype(jnp.int32)
            out = model_fn(params, x, disc_steps)
            if cfg.learn_sigma:
                out = jnp.split(out, 2, axis=-1)[0]
            return eps_to_score_continuous_vp(out, t, sde)
        return score_fn, sde
    if cfg.score_type == "score_sde":
        return get_score_fn(sde, lambda x, t: model_fn(params, x, t),
                            continuous=True), sde
    raise NotImplementedError(cfg.score_type)


def _forward_diffuse(x0: Array, key: Array, cfg: PurifyConfig,
                     total_noise_levels) -> Array:
    """One-shot forward diffusion to step t* using discrete alpha-bar
    (ref diffpure_sde.py:217-223). With fix_rand, one noise tile is shared
    across the batch (ref diffpure_ode.py:202-209)."""
    sde = VPSDE(beta_min=cfg.beta_min, beta_max=cfg.beta_max, N=cfg.N)
    a = jnp.asarray(sde.alphas_cumprod, dtype=jnp.float32)
    if cfg.fix_rand:
        e1 = jax.random.normal(key, (1,) + x0.shape[1:], x0.dtype)
        e = jnp.tile(e1, (x0.shape[0],) + (1,) * (x0.ndim - 1))
    else:
        e = jax.random.normal(key, x0.shape, x0.dtype)
    abar = a[total_noise_levels - 1]
    return x0 * jnp.sqrt(abar) + e * jnp.sqrt(1.0 - abar)


def _sample_t(key: Array, cfg: PurifyConfig):
    """Static t, or rand_t: t + U{-t_delta, t_delta} as a traced value
    (ref diffpure_sde.py:219-221, recast per SURVEY.md §7.4.5)."""
    if not cfg.rand_t:
        return cfg.t
    delta = jax.random.randint(key, (), -cfg.t_delta, cfg.t_delta)
    return cfg.t + delta


def purify_sde(model_fn: ModelFn, params, x: Array, key: Array,
               cfg: PurifyConfig) -> Array:
    """Reverse VP-SDE purification (the main method; ref diffpure_sde.py).

    Integrates the reverse SDE in flipped time t' = 1 - s from
    t0' = 1 - t*/1000 to t1' = 1 - 1e-5 with Euler-Maruyama:
      drift'(x, t') = -[f(x, s) - g(s)^2 score(x, s)],  diffusion' = g(s).
    """
    score_fn, sde = _make_score_fn(model_fn, params, cfg)

    def drift_flipped(p, xx, t_flip):
        s = 1.0 - t_flip
        f, g = sde.sde(xx, s)
        rev = f - batch_mul(g ** 2, score_fn(xx, s))
        return -rev

    def diffusion_flipped(t_flip):
        return jnp.sqrt(sde.beta(1.0 - t_flip))

    n_steps = cfg.solver_steps()
    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_t, k_noise, k_bm = (jax.random.fold_in(key, 3 * it + j)
                              for j in range(3))
        t_star = _sample_t(k_t, cfg)
        xt = _forward_diffuse(x0, k_noise, cfg, t_star)
        t0 = 1.0 - t_star / 1000.0
        t1 = 1.0 - cfg.epsilon_dt1

        if cfg.grad_mode == "adjoint":
            x_pure = sdeint_em_adjoint(drift_flipped, diffusion_flipped,
                                       params, xt, t0, t1, n_steps, k_bm)
        elif cfg.grad_mode == "reversible":
            # reversible Heun (arXiv:2105.13493): exact O(1)-memory
            # gradients via algebraic trajectory reversal; also 2nd-order
            # in the drift (Euler is 1st) — see solvers/reversible.py
            from diffpure_tpu.solvers.reversible import sdeint_reversible_heun
            x_pure = sdeint_reversible_heun(drift_flipped, diffusion_flipped,
                                            params, xt, t0, t1, n_steps,
                                            k_bm)
        else:
            x_pure = sdeint_em(
                lambda xx, tt: drift_flipped(params, xx, tt),
                diffusion_flipped, xt, t0, t1, n_steps, k_bm,
                remat=True)
            if cfg.grad_mode == "none":
                x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def purify_ode(model_fn: ModelFn, params, x: Array, key: Array,
               cfg: PurifyConfig) -> Array:
    """Probability-flow ODE purification (ref diffpure_ode.py).

    dx/dt = f(x,t) - 1/2 g(t)^2 score(x,t), integrated from t*/1000 down to
    1e-5 (time NOT flipped; ts is descending in the reference).
    """
    score_fn, sde = _make_score_fn(model_fn, params, cfg)

    def ode_fn(p, xx, t):
        f, g = sde.sde(xx, t)
        return f - 0.5 * batch_mul(g ** 2, score_fn(xx, t))

    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_t, k_noise = (jax.random.fold_in(key, 2 * it + j) for j in range(2))
        t_star = _sample_t(k_t, cfg)
        xt = _forward_diffuse(x0, k_noise, cfg, t_star)
        t0 = t_star / 1000.0
        t1 = cfg.epsilon_dt1
        n_steps = max(int(round(cfg.t / 1000.0 / cfg.step_size)), 1)

        if cfg.grad_mode == "adjoint":
            assert cfg.ode_method == "euler", "adjoint path is Euler-only"
            x_pure = odeint_euler_adjoint(ode_fn, params, xt, t0, t1, n_steps)
        elif cfg.grad_mode == "reversible":
            # reversible Heun with zero diffusion = reversible ODE Heun:
            # exact O(1)-memory gradients, 2nd-order (solvers/reversible.py)
            from diffpure_tpu.solvers.reversible import sdeint_reversible_heun
            x_pure = sdeint_reversible_heun(
                ode_fn, lambda tb: jnp.zeros_like(tb), params, xt, t0, t1,
                n_steps, jax.random.fold_in(key, 97))
        else:
            solver = odeint_heun if cfg.ode_method == "heun" else odeint_euler
            x_pure = solver(lambda xx, tt: ode_fn(params, xx, tt),
                            xt, t0, t1, n_steps, remat=True)
            if cfg.grad_mode == "none":
                x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def purify_ldsde(model_fn: ModelFn, params, x: Array, key: Array,
                 cfg: PurifyConfig) -> Array:
    """Langevin-dynamics SDE purification anchored to the input
    (ref diffpure_ldsde.py:50-130).

    drift = -1/2 lambda (-score(x, t=1e-2) + (x - x_init)/sigma2),
    diffusion = sqrt(lambda) * eta; no forward noising.
    """
    score_fn, sde = _make_score_fn(model_fn, params, cfg)
    x_init = x

    def drift(p, xx, t_unused):
        t = jnp.full((xx.shape[0],), cfg.ldsde_t, xx.dtype)
        s = score_fn(xx, t)
        return -0.5 * cfg.lambda_ld * (-s + (xx - x_init) / cfg.sigma2)

    def diffusion(t):
        return jnp.full_like(t, np.sqrt(cfg.lambda_ld) * cfg.eta)

    t0 = 1.0 - cfg.t / 1000.0
    t1 = 1.0 - cfg.epsilon_dt1
    n_steps = max(int(round((t1 - t0) / cfg.ldsde_dt)), 1)

    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_bm = jax.random.fold_in(key, it)
        if cfg.grad_mode == "adjoint":
            x_pure = sdeint_em_adjoint(drift, diffusion, params, x0,
                                       t0, t1, n_steps, k_bm)
        else:
            x_pure = sdeint_em(lambda xx, tt: drift(params, xx, tt),
                               diffusion, x0, t0, t1, n_steps, k_bm,
                               remat=True)
            if cfg.grad_mode == "none":
                x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def _make_eps_fn(model_fn: ModelFn, params, cfg: PurifyConfig):
    """Epsilon-prediction adapter (for the exponential-integrator solvers)."""
    if cfg.score_type == "guided_diffusion":
        def eps_fn(x, t):
            disc_steps = (t * cfg.N).astype(jnp.int32)
            out = model_fn(params, x, disc_steps)
            if cfg.learn_sigma:
                out = jnp.split(out, 2, axis=-1)[0]
            return out
        return eps_fn
    if cfg.score_type == "score_sde":
        def eps_fn(x, t):
            return model_fn(params, x, t * 999)
        return eps_fn
    raise NotImplementedError(cfg.score_type)


def purify_dpm(model_fn: ModelFn, params, x: Array, key: Array,
               cfg: PurifyConfig) -> Array:
    """Accelerated purification: forward-diffuse to t*, then DPM-Solver++(2M)
    down to ~0 in cfg.solver_steps() score evals (default t* — pass
    n_steps=10..20 for the accelerated setting). TPU-native extension beyond
    the reference's Euler-only solvers; same defense semantics, ~5-10x fewer
    NFE."""
    from diffpure_tpu.solvers.dpm import dpm_solver_pp_2m
    sde = VPSDE(beta_min=cfg.beta_min, beta_max=cfg.beta_max, N=cfg.N)
    eps_fn = _make_eps_fn(model_fn, params, cfg)

    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_t, k_noise = (jax.random.fold_in(key, 2 * it + j) for j in range(2))
        t_star = _sample_t(k_t, cfg)
        xt = _forward_diffuse(x0, k_noise, cfg, t_star)
        n_steps = cfg.solver_steps()
        # t_star may be traced under rand_t; the solver's linspace handles it
        x_pure = dpm_solver_pp_2m(eps_fn, xt, t_star / 1000.0,
                                  cfg.epsilon_dt1, n_steps, sde)
        if cfg.grad_mode == "none":
            x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def make_imagenet_diffusion(timestep_respacing: str = "1000",
                            rescale_timesteps: bool = True) -> SpacedDiffusion:
    """The guided-diffusion process used for ImageNet purification
    (ref configs/imagenet.yml + script_util.py:394-443)."""
    betas = get_named_beta_schedule("linear", 1000)
    return SpacedDiffusion.from_original(
        betas, timestep_respacing or "1000",
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE,
        rescale_timesteps=rescale_timesteps)


def purify_guided_ddpm(model_fn: ModelFn, params, x: Array, key: Array,
                       cfg: PurifyConfig,
                       diffusion: Optional[SpacedDiffusion] = None,
                       use_ddim: bool = False) -> Array:
    """Discrete guided-diffusion purification (ImageNet; ref diffpure_guided.py).

    Non-differentiable in the reference (no_grad -> BPDA); we honor
    grad_mode='none' by default here but keep the scan differentiable if
    grad_mode says otherwise.

    Respacing: pass a SpacedDiffusion with fewer steps (e.g. from
    make_imagenet_diffusion("ddim50")) and a cfg.t in *respaced* indices —
    the wrapped model remaps to original timesteps (ref respace.py:124-135).
    use_ddim runs the deterministic DDIM update instead of ancestral
    sampling (ref gaussian_diffusion.py:545-612) — the discrete-path NFE
    reduction analogous to DPM++ on the continuous path.
    """
    if diffusion is None:
        diffusion = make_imagenet_diffusion()
    wrapped = lambda xx, tt: model_fn(params, xx, tt)

    # forward-noise depth in the (possibly respaced) process: the alphabar
    # at respaced index t-1 equals the original alphabar at the mapped step.
    abar = jnp.asarray(diffusion.alphas_cumprod, jnp.float32)

    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_noise, k_loop = (jax.random.fold_in(key, 2 * it + j)
                           for j in range(2))
        e = jax.random.normal(k_noise, x0.shape, x0.dtype)
        a_t = abar[cfg.t - 1]
        xt = x0 * jnp.sqrt(a_t) + e * jnp.sqrt(1.0 - a_t)

        def step(carry, i):
            xc, k = carry
            k, sub = jax.random.split(k)
            t = jnp.full((x.shape[0],), cfg.t - 1 - i, dtype=jnp.int32)
            if use_ddim:
                out = diffusion.ddim_sample(sub, wrapped, xc, t,
                                            clip_denoised=True, eta=0.0)
            else:
                out = diffusion.p_sample(sub, wrapped, xc, t,
                                         clip_denoised=True)
            return (out["sample"], k), None

        record_nfe("guided_ddpm", int(cfg.t))
        (x_pure, _), _ = jax.lax.scan(
            jax.checkpoint(step), (xt, k_loop), jnp.arange(cfg.t))
        if cfg.grad_mode == "none":
            x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def purify_celebahq_ddpm(model_fn: ModelFn, params, x: Array, key: Array,
                         cfg: PurifyConfig,
                         beta_start: float = 1e-4,
                         beta_end: float = 2e-2) -> Array:
    """CelebA-HQ DDPM purification with the hand-rolled posterior step
    (ref diffpure_ddpm.py:37-54,99-142). Note: no x0-clipping, fixedsmall
    log-variance."""
    betas64 = linear_beta_schedule(cfg.N, beta_start, beta_end)
    alphas = 1.0 - betas64
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas64 * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    logvar = np.log(np.maximum(posterior_variance, 1e-20))
    weighted_score = betas64 / np.sqrt(1.0 - alphas_cumprod)
    recip_sqrt_alphas = 1.0 / np.sqrt(alphas)

    xs = []
    x0 = x
    for it in range(cfg.sample_step):
        k_noise, k_loop = (jax.random.fold_in(key, 2 * it + j)
                           for j in range(2))
        a = jnp.asarray(alphas_cumprod, jnp.float32)
        e = jax.random.normal(k_noise, x0.shape, x0.dtype)
        xt = x0 * jnp.sqrt(a[cfg.t - 1]) + e * jnp.sqrt(1.0 - a[cfg.t - 1])

        def step(carry, i):
            xc, k = carry
            k, sub = jax.random.split(k)
            t = jnp.full((x.shape[0],), cfg.t - 1 - i, dtype=jnp.int32)
            eps = model_fn(params, xc, t)
            mean = (_extract(recip_sqrt_alphas, t, xc.shape)
                    * (xc - _extract(weighted_score, t, xc.shape) * eps))
            lv = _extract(logvar, t, xc.shape)
            noise = jax.random.normal(sub, xc.shape, xc.dtype)
            mask = (t != 0).astype(xc.dtype).reshape(
                t.shape + (1,) * (xc.ndim - 1))
            sample = mean + mask * jnp.exp(0.5 * lv) * noise
            return (sample, k), None

        record_nfe("celebahq_ddpm", int(cfg.t))
        (x_pure, _), _ = jax.lax.scan(
            jax.checkpoint(step), (xt, k_loop), jnp.arange(cfg.t))
        if cfg.grad_mode == "none":
            x_pure = jax.lax.stop_gradient(x_pure)
        x0 = x_pure
        xs.append(x_pure)
    return jnp.concatenate(xs, axis=0)


def purify(model_fn: ModelFn, params, x: Array, key: Array,
           cfg: PurifyConfig, **kwargs) -> Array:
    """Runner dispatch (ref eval_sde_adv.py:44-55)."""
    if cfg.diffusion_type == "sde":
        return purify_sde(model_fn, params, x, key, cfg)
    if cfg.diffusion_type == "ode":
        return purify_ode(model_fn, params, x, key, cfg)
    if cfg.diffusion_type == "ldsde":
        return purify_ldsde(model_fn, params, x, key, cfg)
    if cfg.diffusion_type == "dpm":
        return purify_dpm(model_fn, params, x, key, cfg)
    if cfg.diffusion_type == "ddpm":
        return purify_guided_ddpm(model_fn, params, x, key, cfg, **kwargs)
    if cfg.diffusion_type == "celebahq-ddpm":
        return purify_celebahq_ddpm(model_fn, params, x, key, cfg, **kwargs)
    raise NotImplementedError(f"unknown diffusion type {cfg.diffusion_type}")
