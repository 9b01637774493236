"""Timestep samplers for diffusion training.

JAX rebuild of guided_diffusion/resample.py (ref :1-162): uniform sampling
and importance sampling by the loss second moment. The importance sampler
keeps a per-timestep history ring buffer as a pytree state (functional
update instead of the reference's in-place numpy mutation).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """ref resample.py:12-24."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


@dataclasses.dataclass(frozen=True)
class UniformSampler:
    """ref resample.py:63-72."""
    num_timesteps: int

    def sample(self, key: Array, batch_size: int) -> Tuple[Array, Array]:
        t = jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,))
        return t, weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossSecondMomentResampler:
    """Importance sampling ~ sqrt(E[loss^2]) with uniform mixing
    (ref resample.py:110-162)."""
    loss_history: Array  # (T, history)
    loss_counts: Array  # (T,)
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    history_per_term: int = dataclasses.field(default=10,
                                              metadata=dict(static=True))
    uniform_prob: float = dataclasses.field(default=1e-3,
                                            metadata=dict(static=True))

    @staticmethod
    def create(num_timesteps: int, history_per_term: int = 10,
               uniform_prob: float = 1e-3) -> "LossSecondMomentResampler":
        return LossSecondMomentResampler(
            loss_history=jnp.zeros((num_timesteps, history_per_term)),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
            num_timesteps=num_timesteps,
            history_per_term=history_per_term,
            uniform_prob=uniform_prob)

    def _warmed_up(self) -> Array:
        return jnp.all(self.loss_counts == self.history_per_term)

    def weights(self) -> Array:
        """ref resample.py:135-142."""
        uniform = jnp.ones((self.num_timesteps,)) / self.num_timesteps
        w = jnp.sqrt(jnp.mean(self.loss_history ** 2, axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return jnp.where(self._warmed_up(), w, uniform)

    def sample(self, key: Array, batch_size: int) -> Tuple[Array, Array]:
        """ref resample.py:42-60: t ~ p, weights = 1/(T p(t))."""
        p = self.weights()
        t = jax.random.choice(key, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update_with_losses(self, ts: Array, losses: Array
                           ) -> "LossSecondMomentResampler":
        """Functional ring-buffer update (ref resample.py:144-155)."""
        hist = self.loss_history
        counts = self.loss_counts

        def upd(carry, tl):
            hist, counts = carry
            t, loss = tl
            c = counts[t]
            full = c == self.history_per_term
            # shift-left when full, else append at position c
            row = hist[t]
            shifted = jnp.roll(row, -1).at[-1].set(loss)
            appended = row.at[jnp.minimum(c, self.history_per_term - 1)].set(
                loss)
            hist = hist.at[t].set(jnp.where(full, shifted, appended))
            counts = counts.at[t].set(jnp.where(full, c, c + 1))
            return (hist, counts), None

        (hist, counts), _ = jax.lax.scan(upd, (hist, counts), (ts, losses))
        return dataclasses.replace(self, loss_history=hist,
                                   loss_counts=counts)
