"""Procedurally generated image distribution for in-env defense validation.

The zero-egress environment cannot download CIFAR-10 or any pretrained
checkpoint, so end-to-end validation that *purification defends* (the
property measured by ref eval_sde_adv.py:211-243) is done on a procedural
class-conditional image distribution that is (a) learnable by a small score
model, (b) classifiable to ~100% clean accuracy, and (c) adversarially
fragile for a standard-trained CNN.

Distribution ("oriented gratings"): class c in {0..n_classes-1} fixes a
grating orientation theta_c = c * pi / n_classes; nuisance parameters are
the phase, a smooth per-channel amplitude, a small DC color shift, and i.i.d.
pixel noise (manifold thickness).  The class-relevant structure is
low-frequency, so it survives forward diffusion to t* (the same property
real image classes have, which is what makes DiffPure work,
ref runners/diffpure_sde.py:222-223).

Everything is pure JAX and jit-friendly: `sample_batch(key, n)` is the whole
dataset (infinite, i.i.d.), so train/test splits are just different keys.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    """Static description of the grating distribution."""

    size: int = 16
    n_classes: int = 4
    channels: int = 3
    freq: float = 2.0          # cycles per image side
    amp_range: Tuple[float, float] = (0.55, 0.95)
    dc_range: float = 0.1      # per-channel DC shift in [-dc, dc]
    noise_std: float = 0.04    # i.i.d. pixel noise (manifold thickness)

    def orientation(self, y: Array) -> Array:
        return y.astype(jnp.float32) * (jnp.pi / self.n_classes)


def sample_batch(key: Array, n: int,
                 spec: SyntheticSpec = SyntheticSpec()) -> Tuple[Array, Array]:
    """Draw n labelled images.  Returns (x NHWC in [-1, 1], y int32)."""
    k_y, k_phase, k_amp, k_dc, k_noise = jax.random.split(key, 5)
    S, C = spec.size, spec.channels

    y = jax.random.randint(k_y, (n,), 0, spec.n_classes)
    theta = spec.orientation(y)                                   # (n,)
    phase = jax.random.uniform(k_phase, (n,), maxval=2 * jnp.pi)  # (n,)
    amp = jax.random.uniform(k_amp, (n, 1, 1, C),
                             minval=spec.amp_range[0],
                             maxval=spec.amp_range[1])
    dc = jax.random.uniform(k_dc, (n, 1, 1, C),
                            minval=-spec.dc_range, maxval=spec.dc_range)

    # unit-spaced pixel grid, centered
    coord = jnp.arange(S, dtype=jnp.float32) - (S - 1) / 2.0
    ii, jj = jnp.meshgrid(coord, coord, indexing="ij")            # (S, S)
    # projection onto the grating direction, per example
    proj = (jnp.cos(theta)[:, None, None] * ii[None]
            + jnp.sin(theta)[:, None, None] * jj[None])           # (n, S, S)
    wave = jnp.sin(2 * jnp.pi * spec.freq / S * proj
                   + phase[:, None, None])                        # (n, S, S)

    x = amp * wave[..., None] + dc
    x = x + spec.noise_std * jax.random.normal(k_noise, x.shape)
    return jnp.clip(x, -1.0, 1.0).astype(jnp.float32), y.astype(jnp.int32)


def class_means(spec: SyntheticSpec, amp: float = 0.3,
                phase: float = 0.7) -> Array:
    """One fixed grating per class (no nuisances): the means of the
    Gaussian-mixture variant below.  (n_classes, S, S, C)."""
    S, C = spec.size, spec.channels
    y = jnp.arange(spec.n_classes)
    theta = spec.orientation(y)
    coord = jnp.arange(S, dtype=jnp.float32) - (S - 1) / 2.0
    ii, jj = jnp.meshgrid(coord, coord, indexing="ij")
    proj = (jnp.cos(theta)[:, None, None] * ii[None]
            + jnp.sin(theta)[:, None, None] * jj[None])
    wave = jnp.sin(2 * jnp.pi * spec.freq / S * proj + phase)
    return jnp.tile((amp * wave)[..., None], (1, 1, 1, C))


def sample_gmm_batch(key: Array, n: int, spec: SyntheticSpec,
                     amp: float = 0.3, noise_std: float = 0.08):
    """Gaussian-mixture variant: x | y ~ N(mean_y, noise_std^2 I).

    Its VP-SDE score is CLOSED FORM (gmm_vp_eps_model) — the apparatus for
    fast full-protocol defense tests without training a score network."""
    k_y, k_n = jax.random.split(key)
    y = jax.random.randint(k_y, (n,), 0, spec.n_classes)
    mu = class_means(spec, amp)[y]
    x = mu + noise_std * jax.random.normal(k_n, mu.shape)
    return jnp.clip(x, -1.0, 1.0).astype(jnp.float32), y.astype(jnp.int32)


def gmm_vp_eps_model(spec: SyntheticSpec, amp: float = 0.3,
                     noise_std: float = 0.08, beta_min: float = 0.1,
                     beta_max: float = 20.0):
    """Exact epsilon-model of the GMM under the VP-SDE, in the score_sde
    calling convention (continuous labels t*999, eps = -score * std;
    diffusion/score.get_score_fn inverts this).

    Under VP diffusion, x_t | y ~ N(a(t) mu_y, v(t) I) with
    a(t) = exp(-1/4 t^2 (bmax-bmin) - 1/2 t bmin) and
    v(t) = a^2 sigma0^2 + (1 - a^2); the mixture score is the
    responsibility-weighted Gaussian score.  model_fn(params, x, t_cond);
    params unused (pass None or an empty tuple).
    """
    means = class_means(spec, amp)                  # (K, S, S, C)
    mu_flat = means.reshape(means.shape[0], -1)     # (K, D)

    def model_fn(params, x, t_cond):
        t = t_cond.astype(jnp.float32) / 999.0
        log_a = (-0.25 * t ** 2 * (beta_max - beta_min)
                 - 0.5 * t * beta_min)
        a = jnp.exp(log_a)[:, None]                 # (B, 1)
        v = (a ** 2) * noise_std ** 2 + (1.0 - a ** 2)
        B = x.shape[0]
        xf = x.reshape(B, -1)                       # (B, D)
        diff = xf[:, None, :] - a[:, None] * mu_flat[None]   # (B, K, D)
        logits = -0.5 * jnp.sum(diff ** 2, axis=-1) / v      # (B, K)
        resp = jax.nn.softmax(logits, axis=-1)
        score = -(xf - a * (resp @ mu_flat)) / v             # (B, D)
        std = jnp.sqrt(jnp.maximum(1.0 - a ** 2, 1e-12))
        eps = -score * std                          # score_sde convention
        return eps.reshape(x.shape).astype(x.dtype)

    return model_fn


def dataset_iterator(key: Array, batch_size: int,
                     spec: SyntheticSpec = SyntheticSpec()):
    """Infinite (x, model_kwargs) iterator in the TrainLoop data contract."""
    i = 0
    while True:
        x, _ = sample_batch(jax.random.fold_in(key, i), batch_size, spec)
        yield x, {}
        i += 1
