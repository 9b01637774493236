"""Discrete-time Gaussian diffusion (DDPM) with respacing.

Functional JAX counterpart of the reference discrete diffusion math
(ref: guided_diffusion/gaussian_diffusion.py:126-916 and
guided_diffusion/respace.py:71-136). Schedule constants are precomputed in
float64 numpy at construction (ref gaussian_diffusion.py:140-177) and exposed
as float32 jnp constants inside traced functions.

Layout convention: images are NHWC (TPU-native); channel splits that the
reference does on dim=1 happen on the last axis here.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.diffusion.schedules import space_timesteps

Array = jax.Array


class ModelMeanType(enum.Enum):
    """What the model predicts (ref gaussian_diffusion.py:73-80)."""
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    """Output variance handling (ref gaussian_diffusion.py:83-95)."""
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


def _extract(arr: np.ndarray, t: Array, broadcast_shape) -> Array:
    """Gather schedule constants at timesteps t, broadcast to image rank.

    ref: gaussian_diffusion.py:903-916 (_extract_into_tensor).
    """
    vals = jnp.asarray(arr, dtype=jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (len(broadcast_shape) - vals.ndim))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (ref guided_diffusion/losses.py:23-49)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian on [-1,1] 8-bit images.

    ref: guided_diffusion/losses.py:52-85.
    """
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))
    return log_probs


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Discrete diffusion process over a fixed beta schedule.

    All derived schedule arrays are float64 numpy, computed once
    (ref gaussian_diffusion.py:140-177).
    """

    betas: Tuple[float, ...]  # tuple for hashability; use from_betas()
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL
    rescale_timesteps: bool = False
    original_num_steps: Optional[int] = None  # set by respacing

    @staticmethod
    def from_betas(betas: np.ndarray, **kwargs) -> "GaussianDiffusion":
        betas = np.asarray(betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        return GaussianDiffusion(betas=tuple(betas.tolist()), **kwargs)

    # ---- cached float64 schedule arrays -------------------------------------

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @property
    def _betas(self) -> np.ndarray:
        return np.asarray(self.betas, dtype=np.float64)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self._betas)

    @property
    def alphas_cumprod_prev(self) -> np.ndarray:
        return np.append(1.0, self.alphas_cumprod[:-1])

    @property
    def alphas_cumprod_next(self) -> np.ndarray:
        return np.append(self.alphas_cumprod[1:], 0.0)

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    @property
    def sqrt_recip_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod)

    @property
    def sqrt_recipm1_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod - 1.0)

    @property
    def posterior_variance(self) -> np.ndarray:
        return (self._betas * (1.0 - self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))

    @property
    def posterior_log_variance_clipped(self) -> np.ndarray:
        pv = self.posterior_variance
        return np.log(np.append(pv[1], pv[1:]))

    @property
    def posterior_mean_coef1(self) -> np.ndarray:
        return (self._betas * np.sqrt(self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))

    @property
    def posterior_mean_coef2(self) -> np.ndarray:
        return ((1.0 - self.alphas_cumprod_prev) * np.sqrt(1.0 - self._betas)
                / (1.0 - self.alphas_cumprod))

    # ---- forward process -----------------------------------------------------

    def q_mean_variance(self, x_start: Array, t: Array):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.shape)
        log_variance = _extract(np.log(1.0 - self.alphas_cumprod), t, x_start.shape)
        return mean, variance, log_variance

    def q_sample(self, key: Array, x_start: Array, t: Array,
                 noise: Optional[Array] = None) -> Array:
        """Diffuse x_start to step t (ref gaussian_diffusion.py:196-218)."""
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        return (_extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
                + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape)
                * noise)

    def q_posterior_mean_variance(self, x_start: Array, x_t: Array, t: Array):
        """q(x_{t-1} | x_t, x_0) (ref gaussian_diffusion.py:220-238)."""
        posterior_mean = (
            _extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + _extract(self.posterior_mean_coef2, t, x_t.shape) * x_t)
        posterior_variance = _extract(self.posterior_variance, t, x_t.shape)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped,
                                          t, x_t.shape)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ---- model wrappers -------------------------------------------------------

    def _scale_timesteps(self, t: Array) -> Array:
        """ref gaussian_diffusion.py:359-362."""
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (_extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        return (_extract(1.0 / self.posterior_mean_coef1, t, x_t.shape) * xprev
                - _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1,
                           t, x_t.shape) * x_t)

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return ((_extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                 - pred_xstart)
                / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape))

    def p_mean_variance(self, model_fn: Callable, x: Array, t: Array,
                        clip_denoised: bool = True,
                        denoised_fn: Optional[Callable] = None,
                        model_kwargs=None) -> dict:
        """p(x_{t-1} | x_t) parameters (ref gaussian_diffusion.py:240-350).

        model_fn(x, t_scaled, **kwargs) -> NHWC output; with LEARNED(_RANGE)
        variance the channel axis holds [model_mean, model_var].
        """
        if model_kwargs is None:
            model_kwargs = {}
        C = x.shape[-1]
        model_output = model_fn(x, self._scale_timesteps(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, x.shape)
                max_log = _extract(np.log(self._betas), t, x.shape)
                frac = (model_var_values + 1.0) / 2.0
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            if self.model_var_type == ModelVarType.FIXED_LARGE:
                var = np.append(self.posterior_variance[1], self._betas[1:])
                model_variance = _extract(var, t, x.shape)
                model_log_variance = _extract(np.log(var), t, x.shape)
            else:  # FIXED_SMALL
                model_variance = _extract(self.posterior_variance, t, x.shape)
                model_log_variance = _extract(self.posterior_log_variance_clipped,
                                              t, x.shape)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:  # EPSILON
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {"mean": model_mean, "variance": model_variance,
                "log_variance": model_log_variance, "pred_xstart": pred_xstart}

    # ---- classifier guidance (ref gaussian_diffusion.py:352-400) --------------

    def condition_mean(self, cond_fn: Callable, p_mean_var: dict, x: Array,
                       t: Array, model_kwargs=None) -> Array:
        """Shift the posterior mean by variance * grad log p(y|x)
        (ref gaussian_diffusion.py:352-377)."""
        gradient = cond_fn(x, self._scale_timesteps(t),
                           **(model_kwargs or {}))
        return (p_mean_var["mean"].astype(jnp.float32)
                + p_mean_var["variance"] * gradient.astype(jnp.float32))

    def condition_score(self, cond_fn: Callable, p_mean_var: dict, x: Array,
                        t: Array, model_kwargs=None) -> dict:
        """Song et al. score conditioning for DDIM
        (ref gaussian_diffusion.py:379-400)."""
        alpha_bar = _extract(self.alphas_cumprod, t, x.shape)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
            x, self._scale_timesteps(t), **(model_kwargs or {}))
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(
            out["pred_xstart"], x, t)
        return out

    # ---- samplers -------------------------------------------------------------

    def p_sample(self, key: Array, model_fn: Callable, x: Array, t: Array,
                 clip_denoised: bool = True, denoised_fn=None,
                 cond_fn=None, model_kwargs=None) -> dict:
        """One ancestral sampling step (ref gaussian_diffusion.py:403-447)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn,
                                   model_kwargs=model_kwargs)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(
            t.shape + (1,) * (x.ndim - t.ndim))
        mean = out["mean"]
        if cond_fn is not None:
            mean = self.condition_mean(cond_fn, out, x, t,
                                       model_kwargs=model_kwargs)
        sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(self, key: Array, model_fn: Callable, x: Array, t: Array,
                    clip_denoised: bool = True, denoised_fn=None,
                    cond_fn=None, model_kwargs=None, eta: float = 0.0) -> dict:
        """One DDIM step (ref gaussian_diffusion.py:545-612)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn,
                                   model_kwargs=model_kwargs)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t,
                                       model_kwargs=model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, x.shape)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, x.shape)
        sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                 * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
        noise = jax.random.normal(key, x.shape, x.dtype)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                     + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(
            t.shape + (1,) * (x.ndim - t.ndim))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model_fn: Callable, x: Array, t: Array,
                            clip_denoised: bool = True, model_kwargs=None,
                            eta: float = 0.0) -> dict:
        """Deterministic encode step (ref gaussian_diffusion.py:614-653)."""
        assert eta == 0.0, "reverse ODE only with eta=0"
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   model_kwargs=model_kwargs)
        eps = ((_extract(self.sqrt_recip_alphas_cumprod, t, x.shape) * x
                - out["pred_xstart"])
               / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.shape))
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, x.shape)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
                     + jnp.sqrt(1 - alpha_bar_next) * eps)
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(self, key: Array, model_fn: Callable, shape,
                      noise: Optional[Array] = None, clip_denoised: bool = True,
                      denoised_fn=None, model_kwargs=None,
                      from_t: Optional[int] = None) -> Array:
        """Full (or partial) reverse loop as a lax.scan.

        `from_t` starts the loop at step from_t-1 (used by purification,
        ref runners/diffpure_guided.py:68-75). The scan carries (x, key).
        """
        start = self.num_timesteps if from_t is None else from_t
        if noise is None:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape)
        x = noise

        def step(carry, i):
            x, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((shape[0],), start - 1 - i, dtype=jnp.int32)
            out = self.p_sample(sub, model_fn, x, t, clip_denoised=clip_denoised,
                                denoised_fn=denoised_fn, model_kwargs=model_kwargs)
            return (out["sample"], key), None

        (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(start))
        return x

    # ---- losses (training capability; ref gaussian_diffusion.py:717-901) ------

    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True,
                      model_kwargs=None):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised,
                                   model_kwargs=model_kwargs)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = kl.reshape(kl.shape[0], -1).mean(axis=-1) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = decoder_nll.reshape(decoder_nll.shape[0], -1).mean(axis=-1) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, key, model_fn, x_start, t, model_kwargs=None,
                        noise=None):
        """MSE (+ optional VLB) training loss (ref gaussian_diffusion.py:793-864)."""
        if model_kwargs is None:
            model_kwargs = {}
        if noise is None:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
        x_t = self.q_sample(key, x_start, t, noise=noise)
        terms = {}
        model_output = model_fn(x_t, self._scale_timesteps(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1)
            terms["vb"] = self._vb_terms_bpd(
                lambda *_a, **_k: frozen_out, x_start, x_t, t,
                clip_denoised=False)["output"]
            terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = {
            ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(
                x_start, x_t, t)[0],
            ModelMeanType.START_X: x_start,
            ModelMeanType.EPSILON: noise,
        }[self.model_mean_type]
        mse = ((target - model_output) ** 2)
        terms["mse"] = mse.reshape(mse.shape[0], -1).mean(axis=-1)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms


def _respaced_betas(betas: np.ndarray, use_timesteps: Sequence[int]):
    """New betas + timestep map for a respaced process (ref respace.py:71-105)."""
    alphas_cumprod = np.cumprod(1.0 - np.asarray(betas, dtype=np.float64))
    last_alpha_cumprod = 1.0
    new_betas, timestep_map = [], []
    for i, alpha_cumprod in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1.0 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    return np.array(new_betas), np.array(timestep_map, dtype=np.int64)


@dataclasses.dataclass(frozen=True)
class SpacedDiffusion(GaussianDiffusion):
    """Diffusion over a subset of the original timesteps (ref respace.py:71-136).

    Model calls remap respaced step indices to original step indices via
    `timestep_map`; with rescale_timesteps the original step count is used for
    the rescale (ref respace.py:124-135).
    """

    timestep_map: Tuple[int, ...] = ()

    @staticmethod
    def from_original(betas: np.ndarray, use_timesteps, **kwargs) -> "SpacedDiffusion":
        if isinstance(use_timesteps, str):
            use_timesteps = space_timesteps(len(betas), use_timesteps)
        new_betas, tmap = _respaced_betas(betas, set(use_timesteps))
        return SpacedDiffusion(
            betas=tuple(new_betas.tolist()),
            timestep_map=tuple(tmap.tolist()),
            original_num_steps=len(betas),
            **kwargs)

    def _wrap_model(self, model_fn: Callable) -> Callable:
        tmap = np.asarray(self.timestep_map, dtype=np.int32)
        original_n = self.original_num_steps

        def wrapped(x, ts, **kwargs):
            new_ts = jnp.asarray(tmap)[ts.astype(jnp.int32)]
            if self.rescale_timesteps:
                new_ts = new_ts.astype(jnp.float32) * (1000.0 / original_n)
            return model_fn(x, new_ts, **kwargs)

        return wrapped

    def p_mean_variance(self, model_fn, *args, **kwargs):
        return super().p_mean_variance(self._wrap_model(model_fn), *args, **kwargs)

    def training_losses(self, key, model_fn, *args, **kwargs):
        return super().training_losses(key, self._wrap_model(model_fn), *args, **kwargs)

    def _scale_timesteps(self, t):
        # Scaling is handled by the wrapped model (ref respace.py:119-121).
        return t
