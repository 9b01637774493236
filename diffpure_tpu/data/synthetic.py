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


def dataset_iterator(key: Array, batch_size: int,
                     spec: SyntheticSpec = SyntheticSpec()):
    """Infinite (x, model_kwargs) iterator in the TrainLoop data contract."""
    i = 0
    while True:
        x, _ = sample_batch(jax.random.fold_in(key, i), batch_size, spec)
        yield x, {}
        i += 1
