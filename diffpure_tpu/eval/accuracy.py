"""Batched accuracy (ref utils.py:131-140)."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_accuracy(model_fn: Callable, x: Array, y: Array, key: Array,
                 bs: int = 64) -> float:
    """Fraction correctly classified, evaluated in minibatches."""
    n_batches = int(np.ceil(x.shape[0] / bs))
    acc = 0.0
    for i in range(n_batches):
        xb = x[i * bs:(i + 1) * bs]
        yb = y[i * bs:(i + 1) * bs]
        logits = model_fn(xb, jax.random.fold_in(key, i))
        acc += float(jnp.sum(jnp.argmax(logits, -1) == yb))
    return acc / x.shape[0]
