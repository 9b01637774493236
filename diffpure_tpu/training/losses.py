"""Score-matching training losses and the train-step factory.

JAX/optax rebuild of the score_sde training surface
(ref: score_sde/losses.py:26-210): Adam factory (needed at runtime by the
reference to unpickle checkpoints, ref runners/diffpure_sde.py:178),
warmup+clip management, continuous SDE / SMLD / DDPM losses, and
get_step_fn producing a jittable (data-parallel-ready) train step.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from diffpure_tpu.diffusion.score import get_score_fn
from diffpure_tpu.diffusion.sde import SDE, VESDE, VPSDE, batch_mul

Array = jax.Array


def get_optimizer(lr: float = 2e-4, beta1: float = 0.9, eps: float = 1e-8,
                  weight_decay: float = 0.0,
                  warmup: int = 5000, grad_clip: float = 1.0
                  ) -> optax.GradientTransformation:
    """Adam with linear warmup + global-norm clipping.

    Folds the reference's separate optimizer + optimization_manager
    (ref losses.py:26-52) into one optax chain.
    """
    schedule = (optax.linear_schedule(0.0, lr, warmup) if warmup > 0 else lr)
    chain = []
    if grad_clip >= 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=beta1, eps=eps,
                                 weight_decay=weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=beta1, eps=eps))
    return optax.chain(*chain)


def optimization_manager(lr: float = 2e-4, warmup: int = 5000,
                         grad_clip: float = 1.0):
    """Standalone warmup/clip transform (ref losses.py:38-52) for callers
    composing their own optimizer."""
    chain = []
    if grad_clip >= 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if warmup > 0:
        chain.append(optax.scale_by_schedule(
            lambda step: jnp.minimum(step / warmup, 1.0)))
    return optax.chain(*chain)


def get_sde_loss_fn(sde: SDE, train: bool, reduce_mean: bool = True,
                    continuous: bool = True, likelihood_weighting: bool = False,
                    eps: float = 1e-5):
    """Continuous-time denoising score matching (ref losses.py:55-98)."""
    reduce_op = (jnp.mean if reduce_mean
                 else lambda x, axis: 0.5 * jnp.sum(x, axis))

    def loss_fn(key: Array, model_fn: Callable, batch: Array) -> Array:
        score_fn = get_score_fn(sde, model_fn, continuous=continuous)
        k_t, k_z = jax.random.split(key)
        t = jax.random.uniform(k_t, (batch.shape[0],),
                               minval=eps, maxval=sde.T)
        z = jax.random.normal(k_z, batch.shape, batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = mean + batch_mul(std, z)
        score = score_fn(perturbed, t)
        if not likelihood_weighting:
            losses = (batch_mul(std, score) + z) ** 2
            losses = reduce_op(losses.reshape(losses.shape[0], -1), -1)
        else:
            g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
            losses = (score + batch_mul(1.0 / std, z)) ** 2
            losses = reduce_op(losses.reshape(losses.shape[0], -1), -1) * g2
        return jnp.mean(losses)

    return loss_fn


def get_smld_loss_fn(vesde: VESDE, train: bool, reduce_mean: bool = False):
    """Legacy SMLD (NCSN) loss over discrete sigmas (ref losses.py:101-125)."""
    smld_sigma_array = jnp.asarray(vesde.discrete_sigmas[::-1].copy(),
                                   jnp.float32)
    reduce_op = (jnp.mean if reduce_mean
                 else lambda x, axis: 0.5 * jnp.sum(x, axis))

    def loss_fn(key: Array, model_fn: Callable, batch: Array) -> Array:
        k_l, k_z = jax.random.split(key)
        labels = jax.random.randint(k_l, (batch.shape[0],), 0, vesde.N)
        sigmas = smld_sigma_array[labels]
        noise = batch_mul(sigmas, jax.random.normal(k_z, batch.shape))
        perturbed = batch + noise
        score = model_fn(perturbed, labels)
        target = batch_mul(-1.0 / sigmas ** 2, noise)
        losses = (score - target) ** 2
        losses = reduce_op(losses.reshape(losses.shape[0], -1),
                           -1) * sigmas ** 2
        return jnp.mean(losses)

    return loss_fn


def get_ddpm_loss_fn(vpsde: VPSDE, train: bool, reduce_mean: bool = True):
    """Legacy discrete DDPM epsilon loss (ref losses.py:128-148)."""
    sqrt_a = jnp.asarray(jnp.sqrt(jnp.asarray(vpsde.alphas_cumprod)),
                         jnp.float32)
    sqrt_1ma = jnp.asarray(
        jnp.sqrt(1.0 - jnp.asarray(vpsde.alphas_cumprod)), jnp.float32)
    reduce_op = (jnp.mean if reduce_mean
                 else lambda x, axis: 0.5 * jnp.sum(x, axis))

    def loss_fn(key: Array, model_fn: Callable, batch: Array) -> Array:
        k_l, k_z = jax.random.split(key)
        labels = jax.random.randint(k_l, (batch.shape[0],), 0, vpsde.N)
        noise = jax.random.normal(k_z, batch.shape, batch.dtype)
        perturbed = (batch_mul(sqrt_a[labels], batch)
                     + batch_mul(sqrt_1ma[labels], noise))
        score = model_fn(perturbed, labels)
        losses = (score - noise) ** 2
        losses = reduce_op(losses.reshape(losses.shape[0], -1), -1)
        return jnp.mean(losses)

    return loss_fn


def get_step_fn(sde: SDE, train: bool, optimizer=None, reduce_mean=True,
                continuous=True, likelihood_weighting=False,
                data_axis: Optional[str] = None):
    """Jittable train/eval step (ref losses.py:151-210).

    state = dict(params, opt_state, ema, step). With `data_axis` set, the
    gradient is psum-averaged over that mesh axis inside shard_map/pjit.
    """
    if continuous:
        loss_fn = get_sde_loss_fn(sde, train, reduce_mean, continuous,
                                  likelihood_weighting)
    elif isinstance(sde, VESDE):
        loss_fn = get_smld_loss_fn(sde, train, reduce_mean)
    elif isinstance(sde, VPSDE):
        loss_fn = get_ddpm_loss_fn(sde, train, reduce_mean)
    else:
        raise ValueError("discrete training only for VE/VP SDEs")

    def step_fn(key, state, batch, apply_fn):
        if not train:
            model_fn = lambda x, t: apply_fn(state["params"], x, t)
            return state, loss_fn(key, model_fn, batch)

        def wrapped_loss(params):
            return loss_fn(key, lambda x, t: apply_fn(params, x, t), batch)

        loss, grads = jax.value_and_grad(wrapped_loss)(state["params"])
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = dict(state, params=params, opt_state=opt_state,
                         step=state["step"] + 1)
        if state.get("ema") is not None:
            new_state["ema"] = state["ema"].update(params)
        return new_state, loss

    return step_fn
