"""Defended model: purify + classify as one differentiable function.

TPU rebuild of SDE_Adv_Model (ref eval_sde_adv.py:34-93) and the 3-mode
variant (ref eval_sde_adv_bpda.py:53-118). The whole pipeline — [0,1] ->
[-1,1], (ImageNet: 224->256 resize), forward-diffuse, reverse integrate,
[-1,1] -> [0,1], classifier — jits into one XLA program; attacks
differentiate through it per the PurifyConfig.grad_mode.

Stochasticity: the defense is randomized by design; every call takes an
explicit PRNG key (the JAX analog of the fresh randn per forward,
ref diffpure_sde.py:217). A counter + wall-clock NFE tracker mirrors the
reference's every-5th-call print (ref eval_sde_adv.py:57-91) via host
callback outside jit.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from diffpure_tpu.purify import PurifyConfig, purify

Array = jax.Array


def _callbacks_ok() -> bool:
    from diffpure_tpu.utils.profiling import host_callbacks_supported
    return host_callbacks_supported()


@dataclasses.dataclass
class DefendedModel:
    """purify+classify with [0,1] NHWC input contract."""

    score_model_fn: Callable  # (params, x_img, t) -> model output
    score_params: object
    classifier_fn: Callable  # (params, x01) -> logits
    classifier_params: object
    purify_cfg: PurifyConfig
    resize_to: Optional[int] = None  # ImageNet: classifier res 224, purify 256
    log_every: int = 5
    tag: str = "defended"
    debug_dir: Optional[str] = None  # dump PNGs for first batches

    def __post_init__(self):
        self._counter = 0
        self._dump_count = 0
        self._t0 = None

    # --- modes (ref eval_sde_adv_bpda.py:108-118) --------------------------

    def purify(self, x01: Array, key: Array) -> Array:
        """[0,1] -> purified [0,1]."""
        x = x01
        if self.resize_to is not None and x.shape[1] != self.resize_to:
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, self.resize_to, self.resize_to, C),
                                 "bilinear")
        x = (x - 0.5) * 2.0  # [0,1] -> [-1,1] (ref eval_sde_adv.py:78)
        x_pure = purify(self.score_model_fn, self.score_params, x, key,
                        self.purify_cfg)
        if self.debug_dir is not None and _callbacks_ok():
            # runtime-gated host callback: fires on actual executions (also
            # inside jitted attack loops), dumps only the first 2 on host.
            # Only a small slice crosses to the host — the callback itself
            # cannot be disabled after the dump limit without a recompile,
            # so bound the recurring device->host transfer instead.
            jax.debug.callback(self._host_dump, x[:8], x_pure[:8])
        return (x_pure + 1.0) * 0.5

    def classify(self, x01: Array) -> Array:
        return self.classifier_fn(self.classifier_params, x01)

    def __call__(self, x01: Array, key: Array) -> Array:
        """purify_and_classify — the attack surface."""
        if self.log_every and _callbacks_ok():
            # host callback, not a Python counter: a Python-side tick would
            # freeze at trace time inside compiled attack scans — this one
            # fires once per runtime execution (ref eval_sde_adv.py:57-91).
            # Skipped on backends that reject host callbacks (profiling.
            # host_callbacks_supported) — instrumentation must never break
            # an eval.
            shape = tuple(x01.shape)
            jax.debug.callback(lambda: self._host_tick(shape))
        return self.classify(self.purify(x01, key))

    def _host_tick(self, shape):
        if self._t0 is None:
            self._t0 = time.time()
        self._counter += 1
        if self._counter % self.log_every == 0:
            dt = time.time() - self._t0
            print(f"[{self.tag}] diffusion calls: {self._counter}, "
                  f"shape {shape}, {dt:.1f}s elapsed")

    def _host_dump(self, x, x_pure):
        if self._dump_count >= 2:  # ref dumps bs_id < 2 (diffpure_sde.py:210)
            return
        from diffpure_tpu.utils.images import dump_purification_debug
        dump_purification_debug(self.debug_dir, self._dump_count, self.tag,
                                x_input=x, x_purified=x_pure)
        self._dump_count += 1

    def reset_counter(self):
        self._counter = 0
        self._dump_count = 0
        self._t0 = None


@dataclasses.dataclass
class UndefendedModel:
    """Classifier-only 3-mode wrapper: purify == identity.

    The BPDA driver's undefended baseline (ResNet_Adv_Model,
    ref eval_sde_adv_bpda.py:31-50).
    """

    classifier_fn: Callable
    classifier_params: object

    def purify(self, x01: Array, key: Array) -> Array:
        return x01

    def classify(self, x01: Array) -> Array:
        return self.classifier_fn(self.classifier_params, x01)

    def __call__(self, x01: Array, key: Array) -> Array:
        return self.classify(x01)
