"""Small CNN classifier for the in-env defense-validation experiment.

A deliberately *standard* (non-robust) convnet: clean training with
cross-entropy, no augmentation, no adversarial training — the same class of
classifier the reference defends (ref utils.py:143-253 wraps off-the-shelf
classifiers; the point of DiffPure is that the purifier in front of a
standard classifier recovers robustness, ref eval_sde_adv.py:34-93).

Input contract matches the repo's classifier surface: x01 NHWC in [0, 1].
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class SmallCNN(nn.Module):
    """conv-conv-pool x2 -> dense head."""

    n_classes: int = 4
    width: int = 32

    @nn.compact
    def __call__(self, x01: Array) -> Array:
        x = (x01 - 0.5) * 2.0
        w = self.width
        x = nn.Conv(w, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(w, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(2 * w, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(2 * w, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(4 * w)(x)
        x = nn.relu(x)
        return nn.Dense(self.n_classes)(x)


class SmallMLP(nn.Module):
    """Flattened-input MLP classifier.

    Compiles in seconds on CPU (no convolutions), which makes it the
    classifier for the fast in-suite defense regression test; MLPs are
    also the canonically fragile standard-trained model."""

    n_classes: int = 4
    width: int = 128

    @nn.compact
    def __call__(self, x01: Array) -> Array:
        x = ((x01 - 0.5) * 2.0).reshape(x01.shape[0], -1)
        x = nn.relu(nn.Dense(self.width)(x))
        x = nn.relu(nn.Dense(self.width // 2)(x))
        return nn.Dense(self.n_classes)(x)


def train_classifier(key: Array, sample_fn, *, n_classes: int = 4,
                     width: int = 32, steps: int = 1000,
                     batch_size: int = 128, lr: float = 1e-3,
                     scan_chunk: int = 100, n_train: int = 0,
                     arch: str = "cnn"):
    """Train a SmallCNN; returns (model, params, final_loss).

    sample_fn(key, n) -> (x in [-1,1] NHWC, y int32).  With n_train > 0 a
    FIXED training set of that size is drawn once and minibatches sample
    from it — the finite-data regime in which a standard-trained classifier
    becomes adversarially fragile (decision boundary interpolates the
    training points); n_train == 0 streams fresh data every step.

    Training is chunked into lax.scan blocks of `scan_chunk` steps so the
    whole loop is a handful of XLA dispatches (one host fetch per chunk —
    see the remote-backend sync cost, docs/PERF.md).
    """
    import optax

    x0, _ = sample_fn(key, 2)
    model = (SmallMLP(n_classes=n_classes, width=max(width, 64))
             if arch == "mlp" else
             SmallCNN(n_classes=n_classes, width=width))
    params = model.init(key, (x0 + 1.0) * 0.5)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    if n_train > 0:
        xtr, ytr = sample_fn(jax.random.fold_in(key, 999_983), n_train)

    def one_step(carry, i):
        params, opt_state = carry
        if n_train > 0:
            idx = jax.random.randint(jax.random.fold_in(key, i),
                                     (batch_size,), 0, n_train)
            x, y = xtr[idx], ytr[idx]
        else:
            x, y = sample_fn(jax.random.fold_in(key, i), batch_size)

        def loss_fn(p):
            logits = model.apply(p, (x + 1.0) * 0.5)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def chunk(carry, start):
        return jax.lax.scan(one_step, carry,
                            start + jnp.arange(scan_chunk))

    carry = (params, opt_state)
    loss = None
    for c in range(max(steps // scan_chunk, 1)):
        carry, losses = chunk(carry, jnp.asarray(c * scan_chunk))
        loss = float(losses[-1])
    return model, carry[0], loss
