"""BPDA+EOT attack: PGD where the purifier's backward pass is the identity.

Faithful rebuild of the reference driver (ref bpda_eot/bpda_eot_attack.py):
  - defended model split into purify / classify stages (the 3-mode forward,
    ref eval_sde_adv_bpda.py:108-118);
  - gradient: EOT over eot_attack_reps purifier samples, CE loss w.r.t. the
    *purified* images (BPDA: purifier jacobian == identity,
    ref bpda_eot_attack.py:98-110);
  - defense decision: mean softmax over eot_defense_reps purifier samples
    (ref :41-53);
  - per-example re-verification with the full defense reps whenever an
    example flips (ref :112-117) — here run on the full batch at flip
    events (masked equivalent of the reference's data-dependent subset;
    same decisions, TPU-friendly shapes);
  - l_inf / l_2 PGD update (ref :86-96).

Returns the per-step defended matrix like the reference `attack_all`
(ref :169-185).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
# purify_fn(x01, key) -> purified01 ; classify_fn(x01) -> logits
PurifyFn = Callable[[Array, Array], Array]
ClassifyFn = Callable[[Array], Array]


@dataclasses.dataclass(frozen=True)
class BPDAEOTConfig:
    adv_eps: float = 8 / 255
    adv_eta: float = 2 / 255
    adv_steps: int = 50
    eot_defense_reps: int = 150
    eot_attack_reps: int = 15
    attack_norm: str = "l_inf"  # 'l_inf' | 'l_2'
    defense_batch: int = 30  # defense reps evaluated in chunks of this size
    # attack-EOT reps per device dispatch. 0 = all reps in one dispatch
    # (the default; one jitted program per PGD step). Remote-execution
    # backends kill multi-minute single dispatches (execution watchdog,
    # docs/STATUS.md) — at CelebA-HQ t*=500 budgets one monolithic PGD
    # step is 15 reps x 500-step purify = minutes of device time, so set
    # this to bound each dispatch (like defense_batch, the chunks draw
    # per-chunk folded keys: a statistically equivalent EOT estimate, not
    # a bit-identical stream).
    attack_batch: int = 0


def _rep_predict(purify_fn: PurifyFn, classify_fn: ClassifyFn, x: Array,
                 key: Array, reps: int, chunk: int) -> Array:
    """Mean softmax over `reps` purifier samples (ref :41-53)."""
    from diffpure_tpu.utils.profiling import absorb_nfe, nfe_tally

    B = x.shape[0]
    acc = None
    done = 0
    r = 0
    while done < reps:
        n = min(chunk, reps - done)
        x_rep = jnp.tile(x, (n, 1, 1, 1))
        k = jax.random.fold_in(key, r)
        # NFE accounting assumes purify_fn is UNJITTED (DefendedModel.purify
        # retraces per host call, so the trace-time tally sees every
        # execution). A jit-cached purify_fn would record nothing on cache
        # hits and silently undercount defense-prediction NFE — thread the
        # count as a program output (as _attack_grad does) before caching.
        with nfe_tally() as tly:
            purified = purify_fn(x_rep, k)
        absorb_nfe(tly.phases, tly.total)  # host-level call: 1 execution
        logits = classify_fn(purified)
        p = jax.nn.softmax(logits, axis=-1).reshape(n, B, -1).sum(axis=0)
        acc = p if acc is None else acc + p
        done += n
        r += 1
    return acc / reps


def defense_predict(purify_fn, classify_fn, x, key, cfg: BPDAEOTConfig):
    probs = _rep_predict(purify_fn, classify_fn, x, key,
                         cfg.eot_defense_reps, cfg.defense_batch)
    return jnp.argmax(probs, axis=-1)


def _attack_grad_core(purify_fn, classify_fn, x, y, key, n: int,
                      cfg: BPDAEOTConfig, nfe_phases: dict = None):
    """(softmax-prob SUM, BPDA-gradient SUM, nfe) over `n` purifier
    samples (ref :98-110). Sums (not means) so chunked dispatches can be
    accumulated across chunks and normalized once.

    nfe is the purifier's function-evaluation count as a program output
    (runtime NFE accounting on callback-less backends)."""
    from diffpure_tpu.utils.profiling import nfe_tally

    x_rep = jnp.tile(x, (n, 1, 1, 1))
    with nfe_tally() as tly:
        purified = purify_fn(x_rep, key)
    if nfe_phases is not None:
        for k_, v in tly.phases.items():
            nfe_phases[k_] = nfe_phases.get(k_, 0) + v
    purified = jax.lax.stop_gradient(purified)  # BPDA cut (ref :100)

    def loss(p):
        logits = classify_fn(p)
        y_rep = jnp.tile(y, (n,))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y_rep[:, None], -1).sum(), logits

    (_, logits), g = jax.value_and_grad(loss, has_aux=True)(purified)
    B = x.shape[0]
    if purified.shape[1:3] != x_rep.shape[1:3]:
        # the purifier runs at a different resolution (ImageNet: classifier
        # 224, diffusion 256 — DefendedModel.purify's bilinear upsize).
        # BPDA treats the purifier as identity but the resize is a known
        # linear map, so pull the gradient back through its exact adjoint.
        _, resize_vjp = jax.vjp(
            lambda xx: jax.image.resize(xx, purified.shape, "bilinear"),
            x_rep)
        g = resize_vjp(g)[0]
    grad_sum = g.reshape((n, B) + x.shape[1:]).sum(axis=0)  # identity-jac
    probs_sum = jax.nn.softmax(logits, -1).reshape(n, B, -1).sum(axis=0)
    return probs_sum, grad_sum, tly.total


def _attack_grad(purify_fn, classify_fn, x, y, key, cfg: BPDAEOTConfig,
                 nfe_phases: dict = None):
    """(correct_mask, BPDA gradient, nfe) via eot_attack_reps — the
    single-dispatch path (all reps tiled into one program)."""
    n = cfg.eot_attack_reps
    probs_sum, grad_sum, nfe = _attack_grad_core(
        purify_fn, classify_fn, x, y, key, n, cfg, nfe_phases)
    probs = probs_sum / n
    correct = jnp.argmax(probs, -1) == y
    return correct, grad_sum / n, nfe


def _pgd_update(x_adv, grad, x0, cfg: BPDAEOTConfig):
    """ref bpda_eot_attack.py:86-96."""
    B = x_adv.shape[0]
    if cfg.attack_norm == "l_inf":
        x_adv = x_adv + cfg.adv_eta * jnp.sign(grad)
        x_adv = jnp.clip(x_adv, x0 - cfg.adv_eps, x0 + cfg.adv_eps)
    else:
        gn = jnp.sqrt(jnp.sum(grad.reshape(B, -1) ** 2,
                              axis=-1)).reshape(-1, 1, 1, 1)
        x_adv = x_adv + cfg.adv_eta * grad / jnp.maximum(gn, 1e-12)
        d = x_adv - x0
        dn = jnp.sqrt(jnp.sum(d.reshape(B, -1) ** 2,
                              axis=-1)).reshape(-1, 1, 1, 1)
        x_adv = x0 + d * jnp.minimum(1.0, cfg.adv_eps / jnp.maximum(dn, 1e-12))
    return jnp.clip(x_adv, 0.0, 1.0)


def bpda_eot_attack(purify_fn: PurifyFn, classify_fn: ClassifyFn,
                    x: Array, y: Array, key: Array,
                    cfg: BPDAEOTConfig,
                    log=None) -> Tuple[Array, np.ndarray]:
    """Returns (x_adv, class_batch) where class_batch is the
    (adv_steps+2, B) per-step defended matrix (ref :127-167).

    `log` (optional) gets one line per PGD step — at CelebA-HQ t*=500
    budgets a step costs minutes and the whole attack runs hours, so the
    per-step defended count is the progress/partial-evidence record."""
    import time as _time
    _t0 = _time.time()
    B = x.shape[0]
    class_batch = np.zeros((cfg.adv_steps + 2, B), dtype=bool)

    # step 0: defense decision on clean inputs
    pred0 = defense_predict(purify_fn, classify_fn, x,
                            jax.random.fold_in(key, 10_000), cfg)
    defended = np.asarray(pred0 == y)
    class_batch[0] = defended

    # jit_lifted: purify_fn/classify_fn close over model params — a plain
    # jit would bake them into the module as dense constants (HTTP 413 on
    # tunneled remote-compile backends); lifting makes them call arguments.
    from diffpure_tpu.utils.jitlift import jit_lifted
    from diffpure_tpu.utils.profiling import absorb_nfe
    nfe_phases: dict = {}
    reps = cfg.eot_attack_reps
    chunk = cfg.attack_batch if 0 < cfg.attack_batch < reps else reps
    if chunk == reps:
        attack_step = jit_lifted(lambda xa, k: _attack_grad(
            purify_fn, classify_fn, xa, y, k, cfg, nfe_phases), x, key)
    else:
        # bounded dispatches: each chunk of attack reps is its own device
        # execution (watchdog-safe); sums accumulate on device, normalized
        # once per PGD step. Chunk programs cached by rep count (the tail
        # may be shorter).
        chunk_fns = {}

        def _chunk_fn(n):
            if n not in chunk_fns:
                chunk_fns[n] = jit_lifted(
                    lambda xa, k: _attack_grad_core(
                        purify_fn, classify_fn, xa, y, k, n, cfg,
                        nfe_phases), x, key)
            return chunk_fns[n]

        def attack_step(xa, k):
            probs_sum = grad_sum = None
            nfe = 0
            done = 0
            r = 0
            while done < reps:
                n = min(chunk, reps - done)
                ps, gs, nf = _chunk_fn(n)(xa, jax.random.fold_in(k, 7000 + r))
                probs_sum = ps if probs_sum is None else probs_sum + ps
                grad_sum = gs if grad_sum is None else grad_sum + gs
                nfe = nfe + nf
                done += n
                r += 1
            probs = probs_sum / reps
            correct = jnp.argmax(probs, -1) == y
            return correct, grad_sum / reps, nfe

    x_adv = x
    for step in range(cfg.adv_steps + 1):
        k_step = jax.random.fold_in(key, step)
        correct, grad, nfe = attack_step(x_adv, k_step)
        absorb_nfe(nfe_phases, nfe)
        correct = np.asarray(correct)

        if step == 0:
            class_batch[1] = defended
        else:
            # flip candidates: currently defended but attack-reps say wrong
            flipped = defended & ~correct
            if flipped.any():
                # verify with full defense reps (ref :112-117); masked
                # full-batch equivalent of the reference's subset call
                pred = defense_predict(purify_fn, classify_fn, x_adv,
                                       jax.random.fold_in(k_step, 555), cfg)
                verified_wrong = np.asarray(pred != y)
                defended = defended & ~(flipped & verified_wrong)
            class_batch[step + 1] = defended

        if log is not None:
            log(f"[bpda] step {step}/{cfg.adv_steps}: defended "
                f"{int(defended.sum())}/{B} ({_time.time() - _t0:.0f}s)")

        if step < cfg.adv_steps:
            x_adv = _pgd_update(x_adv, grad, x, cfg)

    return x_adv, class_batch
