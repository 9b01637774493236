"""Diffusion training loop with checkpoint/resume.

JAX rebuild of guided_diffusion/train_util.py (ref :30-309): per-step
q-sample + model loss via GaussianDiffusion.training_losses, multiple EMA
rates, lr annealing, kv logging, periodic checkpoint save and resume.
DDP is replaced by sharding the batch over the ('data','eot') mesh (grads
pmean'd by XLA from the sharding annotations); mixed precision is the bf16
torso (no loss scaling needed — replaces fp16_util's dynamic scaler,
ref fp16_util.py:156-243).

Checkpoints are orbax-saved pytrees {params, opt_state, step, emas} —
the TPU answer to the reference's .pt files; translated torch checkpoints
can seed `params`.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffpure_tpu.diffusion.discrete import GaussianDiffusion
from diffpure_tpu.models.ema import ExponentialMovingAverage
from diffpure_tpu.training.resample import UniformSampler
from diffpure_tpu.utils import kvlogger

Array = jax.Array


@dataclasses.dataclass
class TrainLoop:
    apply_fn: Callable  # (params, x, t) -> model output
    diffusion: GaussianDiffusion
    data: Iterator  # yields (x NHWC [-1,1], model_kwargs)
    params: object
    batch_size: int
    lr: float
    ema_rate: Sequence[float] = (0.9999,)
    log_interval: int = 10
    save_interval: int = 10000
    resume_checkpoint: str = ""
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    schedule_sampler: Optional[object] = None
    checkpoint_dir: str = "checkpoints"
    seed: int = 0

    def __post_init__(self):
        self.step = 0
        self.key = jax.random.PRNGKey(self.seed)
        self.schedule_sampler = (self.schedule_sampler
                                 or UniformSampler(
                                     self.diffusion.num_timesteps))
        self.opt = optax.chain(
            optax.adamw(self._lr_schedule, weight_decay=self.weight_decay)
            if self.weight_decay else optax.adam(self._lr_schedule))
        self.opt_state = self.opt.init(self.params)
        self.emas = [ExponentialMovingAverage.create(self.params, r,
                                                     use_num_updates=False)
                     for r in self.ema_rate]
        if self.resume_checkpoint:
            self._load_checkpoint(self.resume_checkpoint)
        self._train_step = jax.jit(self._step_impl)

    def _lr_schedule(self, step):
        """Linear anneal (ref train_util.py:260-268)."""
        if not self.lr_anneal_steps:
            return self.lr
        frac = jnp.minimum(step / self.lr_anneal_steps, 1.0)
        return self.lr * (1.0 - frac)

    def _step_impl(self, params, opt_state, emas, key, batch, t, weights):
        def loss_fn(p):
            terms = self.diffusion.training_losses(
                key, lambda x, tt: self.apply_fn(p, x, tt), batch, t)
            return (terms["loss"] * weights).mean(), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        emas = [e.update(params) for e in emas]
        gnorm = optax.global_norm(grads)
        return params, opt_state, emas, loss, terms, gnorm

    def run_step(self, batch, model_kwargs=None):
        self.key, k_t, k_loss = jax.random.split(self.key, 3)
        t, weights = self.schedule_sampler.sample(k_t, batch.shape[0])
        (self.params, self.opt_state, self.emas, loss, terms,
         gnorm) = self._train_step(self.params, self.opt_state, self.emas,
                                   k_loss, batch, t, weights)
        if hasattr(self.schedule_sampler, "update_with_losses"):
            self.schedule_sampler = self.schedule_sampler.update_with_losses(
                t, jax.lax.stop_gradient(terms["loss"]))
        self.step += 1
        kvlogger.logkv("step", self.step)
        kvlogger.logkv_mean("loss", float(loss))
        kvlogger.logkv_mean("grad_norm", float(gnorm))
        return float(loss)

    def run_loop(self, max_steps: Optional[int] = None):
        """ref train_util.py:129-160."""
        while (not self.lr_anneal_steps
               or self.step < self.lr_anneal_steps):
            batch, model_kwargs = next(self.data)
            self.run_step(jnp.asarray(batch), model_kwargs)
            if self.step % self.log_interval == 0:
                kvlogger.dumpkvs()
            if self.step % self.save_interval == 0:
                self.save()
            if max_steps is not None and self.step >= max_steps:
                break
        self.save()

    # --- checkpointing -------------------------------------------------------

    def _ckpt_path(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.checkpoint_dir),
                            f"step_{step:08d}")

    def save(self):
        """orbax save of params/opt/emas (ref train_util.py:270-300)."""
        import orbax.checkpoint as ocp
        path = self._ckpt_path(self.step)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, dict(
                params=self.params,
                opt_state=self.opt_state,
                emas=[e.shadow_params for e in self.emas],
                step=np.asarray(self.step)))
        kvlogger.log(f"saved checkpoint {path}")

    def _load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            target = dict(params=self.params, opt_state=self.opt_state,
                          emas=[e.shadow_params for e in self.emas],
                          step=np.asarray(0))
            state = ckptr.restore(os.path.abspath(path), target)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.emas = [dataclasses.replace(e, shadow_params=s)
                     for e, s in zip(self.emas, state["emas"])]
        self.step = int(state["step"])
        kvlogger.log(f"resumed from {path} at step {self.step}")
