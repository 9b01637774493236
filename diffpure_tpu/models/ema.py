"""Exponential moving average of parameter pytrees.

JAX rebuild of the reference EMA (ref: score_sde/models/ema.py:18-105):
update / copy_to / store / restore plus a state-dict-style (decay,
num_updates, shadow) container — needed both for checkpoint loading (the
score_sde ckpt stores an EMA object, ref runners/diffpure_sde.py:179-182)
and for training.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ExponentialMovingAverage:
    shadow_params: Any
    decay: float = dataclasses.field(metadata=dict(static=True))
    num_updates: Optional[jax.Array] = None

    @staticmethod
    def create(params, decay: float = 0.9999, use_num_updates: bool = True
               ) -> "ExponentialMovingAverage":
        assert 0.0 <= decay <= 1.0
        return ExponentialMovingAverage(
            shadow_params=jax.tree_util.tree_map(jnp.asarray, params),
            decay=decay,
            num_updates=jnp.zeros((), jnp.int32) if use_num_updates else None)

    def update(self, params) -> "ExponentialMovingAverage":
        """shadow <- shadow - (1-decay)*(shadow - params)
        with the (1+n)/(10+n) warmup (ref ema.py:35-48)."""
        decay = self.decay
        num_updates = self.num_updates
        if num_updates is not None:
            num_updates = num_updates + 1
            decay = jnp.minimum(decay,
                                (1.0 + num_updates) / (10.0 + num_updates))
        one_minus = 1.0 - decay
        shadow = jax.tree_util.tree_map(
            lambda s, p: s - one_minus * (s - p), self.shadow_params, params)
        return dataclasses.replace(self, shadow_params=shadow,
                                   num_updates=num_updates)

    def copy_to(self):
        """Return the EMA parameters (ref ema.py:50-58)."""
        return self.shadow_params

    def store(self, params):
        """Return a snapshot to restore later (ref ema.py:60-68)."""
        return jax.tree_util.tree_map(jnp.asarray, params)

    @staticmethod
    def restore(snapshot):
        """ref ema.py:70-80 — trivially the stored pytree."""
        return snapshot

    def state_dict(self):
        return dict(decay=self.decay, num_updates=self.num_updates,
                    shadow_params=self.shadow_params)

    @staticmethod
    def from_state_dict(state) -> "ExponentialMovingAverage":
        return ExponentialMovingAverage(
            shadow_params=state["shadow_params"], decay=state["decay"],
            num_updates=state.get("num_updates"))
