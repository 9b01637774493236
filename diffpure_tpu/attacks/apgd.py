"""Auto-PGD (APGD) with momentum, adaptive step halving, and EOT.

Faithful JAX reimplementation of AutoAttack's APGD (the torch-only upstream
dependency; SURVEY.md §2.7/§7.4.3): Linf/L2 steps, alpha=0.75 momentum,
checkpoint schedule p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06) starting
(0, 0.22) with checkpoints fired where upstream fires them (after the
k-th iteration since the last check), oscillation halving with upstream's
exact `t <= k*0.75` boundary and zero-initialized loss history, and the
CE / DLR / targeted-DLR losses. Trajectory equality with a hand-coded
upstream-faithful loop is asserted in tests/test_apgd_parity.py.

EOT (the Rand protocol, eot_iter=20, ref eval_sde_adv.py:103-110):
gradients are always EOT-averaged. `eot_loss` selects the loss/logits
bookkeeping: "last" (default) is upstream-exact — the last EOT sample's
loss drives best-point/halving decisions; "mean" uses the EOT-mean loss,
a lower-variance estimator of the same quantity (documented extension).

The whole attack is one lax.scan -> a single XLA program per restart; the
per-example dynamic state (step size, improvement counters, best points) is
carried vectorized.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.attacks.losses import ce_loss, dlr_loss, dlr_loss_targeted

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]  # (x01, key) -> logits


@dataclasses.dataclass(frozen=True)
class APGDConfig:
    norm: str = "Linf"  # 'Linf' | 'L2'
    eps: float = 8 / 255
    n_iter: int = 100
    n_restarts: int = 1
    eot_iter: int = 1
    rho: float = 0.75
    eot_parallel: bool = False  # vmap EOT reps (shard over an 'eot' mesh axis)
    loss: str = "ce"  # 'ce' | 'dlr' | 'dlr-targeted'
    eot_loss: str = "last"  # 'last' (upstream-exact) | 'mean' (extension)
    n_target_classes: int = 9  # for apgd-t
    seed: int = 0
    # 0 = the whole run is one XLA program (fastest on dedicated TPU VMs).
    # >0 = scan at most this many iterations per device dispatch: bounds
    # single-execution time (remote backends kill multi-minute programs),
    # and gives host-side progress between chunks. Same math either way —
    # the carry round-trips on device, only dispatch overhead (~ms) is added.
    iters_per_dispatch: int = 0


def _checkpoints(n_iter: int):
    """AutoAttack's decreasing checkpoint schedule.

    Upstream increments its counter *before* the check, so the first
    checkpoint fires after iteration n_iter_2 - 1 (0-based), the next
    after the following interval, etc. — is_ckpt marks those positions;
    window carries the just-elapsed interval k for the oscillation count.
    """
    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)
    ckpts = [n_iter_2]
    interval = n_iter_2
    while ckpts[-1] < n_iter:
        interval = max(interval - size_decr, n_iter_min)
        ckpts.append(ckpts[-1] + interval)
    is_ckpt = np.zeros(n_iter, dtype=bool)
    window = np.zeros(n_iter, dtype=np.int32)
    prev = 0
    for c in ckpts:
        if c - 1 < n_iter:
            is_ckpt[c - 1] = True
            window[c - 1] = c - prev
            prev = c
    return is_ckpt, window


def _project(x0: Array, z: Array, eps: float, norm: str) -> Array:
    """Project z onto the eps-ball around x0 intersected with [0,1]."""
    if norm == "Linf":
        z = jnp.clip(z, x0 - eps, x0 + eps)
    else:  # L2
        d = z - x0
        nrm = jnp.sqrt(jnp.sum(d.reshape(d.shape[0], -1) ** 2,
                               axis=-1)).reshape(-1, 1, 1, 1)
        factor = jnp.minimum(1.0, eps / jnp.maximum(nrm, 1e-12))
        z = x0 + d * factor
    return jnp.clip(z, 0.0, 1.0)


def _loss_and_grad(model_fn: ModelFn, loss_fn, x: Array, key: Array,
                   eot_iter: int, eot_parallel: bool = False,
                   eot_loss: str = "last"):
    """(losses, grad, logits) with the gradient EOT-averaged over fresh keys
    (one traced copy of the defended forward regardless of eot_iter).

    eot_loss='last': losses/logits from the final EOT sample (upstream
    autoattack's bookkeeping — its EOT loop overwrites loss_indiv/logits
    each rep and only accumulates grad). 'mean': EOT-mean losses/logits.
    """
    from diffpure_tpu.attacks.eot import eot_average, eot_keys

    def single(k):
        def f(xx):
            logits = model_fn(xx, k)
            losses = loss_fn(logits)
            return losses.sum(), (losses, logits)
        (_, (losses, logits)), g = jax.value_and_grad(f, has_aux=True)(x)
        return losses, g, logits

    if eot_iter == 1 or eot_loss == "mean":
        return eot_average(single, key, eot_iter, parallel=eot_parallel)
    if eot_loss != "last":
        raise ValueError(eot_loss)

    keys = eot_keys(key, eot_iter)
    if eot_parallel:
        losses, grads, logits = jax.vmap(single)(keys)
        grad = jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), grads)
        return losses[-1], grad, logits[-1]

    from diffpure_tpu.utils.profiling import nfe_mute
    with nfe_mute():  # shape-only trace must not feed the NFE tally
        shapes = jax.eval_shape(single, keys[0])
    init = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  shapes)

    def body(carry, k):
        losses, g, logits = single(k)
        g_acc = jax.tree_util.tree_map(jnp.add, carry[1], g)
        return (losses, g_acc, logits), None

    (losses, g_acc, logits), _ = jax.lax.scan(body, init, keys)
    grad = jax.tree_util.tree_map(lambda v: v / eot_iter, g_acc)
    return losses, grad, logits


def _init_perturbation(key: Array, x: Array, cfg: APGDConfig) -> Array:
    if cfg.norm == "Linf":
        t = 2 * jax.random.uniform(key, x.shape) - 1
        tmax = jnp.max(jnp.abs(t.reshape(t.shape[0], -1)),
                       axis=-1).reshape(-1, 1, 1, 1)
        x_adv = x + cfg.eps * t / jnp.maximum(tmax, 1e-12)
    else:
        t = jax.random.normal(key, x.shape)
        tn = jnp.sqrt(jnp.sum(t.reshape(t.shape[0], -1) ** 2,
                              axis=-1)).reshape(-1, 1, 1, 1)
        x_adv = x + cfg.eps * t / jnp.maximum(tn, 1e-12)
    return jnp.clip(x_adv, 0.0, 1.0)


def _apgd_init(model_fn: ModelFn, loss_fn, x: Array, y: Array,
               key: Array, cfg: APGDConfig,
               nfe_phases: Optional[dict] = None):
    """Initial perturbation + first gradient -> the scan carry."""
    from diffpure_tpu.utils.profiling import nfe_tally

    B = x.shape[0]
    k_init, k_loop = jax.random.split(key)
    x_adv = _init_perturbation(k_init, x, cfg)
    with nfe_tally() as tly:
        losses, grad, logits = _loss_and_grad(
            model_fn, loss_fn, x_adv, jax.random.fold_in(k_loop, 2**31 - 1),
            cfg.eot_iter, cfg.eot_parallel, cfg.eot_loss)
    # the EOT scan/vmap traces the model once but executes it eot_iter
    # times — the tally (filled once per trace) is scaled accordingly
    nfe = tly.total * cfg.eot_iter
    if nfe_phases is not None:
        for k, v in tly.phases.items():
            nfe_phases[k] = nfe_phases.get(k, 0) + v
    pred_ok = jnp.argmax(logits, -1) == y

    # AA uses 2*eps initial step for both norms (L2 grad is normalized).
    step_size = jnp.full((B, 1, 1, 1), 2.0 * cfg.eps)

    carry = dict(
        x_adv=x_adv, x_adv_old=x_adv, grad=grad,
        x_best=x_adv, loss_best=losses, grad_best=grad,
        x_best_adv=jnp.where(pred_ok[:, None, None, None], x_adv, x_adv),
        found=~pred_ok,
        step_size=step_size,
        n_improve=jnp.zeros((B,), jnp.int32),
        # upstream's loss_steps buffer starts zeroed, so the first window's
        # oldest comparison is (loss[0] > 0), not (loss[0] > init_loss) —
        # replicated for bit-exact checkpoint decisions.
        loss_prev=jnp.zeros_like(losses),
        loss_best_last_check=losses,
        reduced_last_check=jnp.ones((B,), bool),
        key=k_loop,
        # runtime NFE counter as a program output (works on callback-less
        # backends; the reference's counter buffer, ref eval_sde_adv.py:57-91)
        nfe=jnp.asarray(nfe, jnp.int32),
    )
    return carry


def _apgd_make_body(model_fn: ModelFn, loss_fn, x: Array, y: Array,
                    cfg: APGDConfig, collect_trajectory: bool = False):
    """The per-iteration scan body (closes over the clean center x)."""
    from diffpure_tpu.utils.profiling import nfe_tally

    B = x.shape[0]

    def body(carry, it):
        i, ck, win = it
        a = jnp.where(i > 0, 0.75, 1.0)
        x_adv, x_adv_old = carry["x_adv"], carry["x_adv_old"]
        grad, step = carry["grad"], carry["step_size"]

        if cfg.norm == "Linf":
            z = x_adv + step * jnp.sign(grad)
            x1 = _project(x, z, cfg.eps, cfg.norm)
            z2 = x_adv + (x1 - x_adv) * a + (x_adv - x_adv_old) * (1 - a)
            x1 = _project(x, z2, cfg.eps, cfg.norm)
        else:
            gn = jnp.sqrt(jnp.sum(grad.reshape(B, -1) ** 2,
                                  axis=-1)).reshape(-1, 1, 1, 1)
            z = x_adv + step * grad / jnp.maximum(gn, 1e-12)
            x1 = _project(x, z, cfg.eps, cfg.norm)
            z2 = x_adv + (x1 - x_adv) * a + (x_adv - x_adv_old) * (1 - a)
            x1 = _project(x, z2, cfg.eps, cfg.norm)

        key = jax.random.fold_in(carry["key"], i)
        with nfe_tally() as tly:
            losses, new_grad, logits = _loss_and_grad(model_fn, loss_fn, x1,
                                                      key, cfg.eot_iter,
                                                      cfg.eot_parallel,
                                                      cfg.eot_loss)
        nfe = carry["nfe"] + tly.total * cfg.eot_iter
        pred_wrong = jnp.argmax(logits, -1) != y
        found = carry["found"] | pred_wrong
        x_best_adv = jnp.where(pred_wrong[:, None, None, None], x1,
                               carry["x_best_adv"])

        improved = losses > carry["loss_best"]
        x_best = jnp.where(improved[:, None, None, None], x1, carry["x_best"])
        grad_best = jax.tree_util.tree_map(
            lambda n, o: jnp.where(improved[:, None, None, None], n, o),
            new_grad, carry["grad_best"])
        loss_best = jnp.maximum(losses, carry["loss_best"])

        n_improve = carry["n_improve"] + (losses > carry["loss_prev"])

        # --- checkpoint: step halving -------------------------------------
        def at_checkpoint(c):
            # upstream check_oscillation: halve when t <= k * rho (inclusive)
            osc = c["n_improve"].astype(jnp.float32) <= cfg.rho * win
            no_impr = (~c["reduced_last_check"]) & (
                c["loss_best_last_check"] >= loss_best)
            halve = osc | no_impr
            h4 = halve[:, None, None, None]
            return dict(c, step_size=jnp.where(h4, c["step_size"] / 2.0,
                                               c["step_size"]),
                        x_adv=jnp.where(h4, x_best, c["x_adv"]),
                        grad=jax.tree_util.tree_map(
                            lambda g, gb: jnp.where(h4, gb, g),
                            c["grad"], grad_best),
                        n_improve=jnp.zeros_like(c["n_improve"]),
                        loss_best_last_check=loss_best,
                        reduced_last_check=halve)

        new_carry = dict(carry, x_adv=x1, x_adv_old=x_adv, grad=new_grad,
                         x_best=x_best, loss_best=loss_best,
                         grad_best=grad_best, x_best_adv=x_best_adv,
                         found=found, n_improve=n_improve, loss_prev=losses,
                         nfe=nfe)
        new_carry = jax.lax.cond(ck, at_checkpoint, lambda c: c, new_carry)
        ys = (dict(losses=losses, loss_best=loss_best,
                   step_size=new_carry["step_size"][:, 0, 0, 0])
              if collect_trajectory else None)
        return new_carry, ys

    return body


def _apgd_iters(cfg: APGDConfig):
    is_ckpt_np, window_np = _checkpoints(cfg.n_iter)
    return (jnp.arange(cfg.n_iter), jnp.asarray(is_ckpt_np),
            jnp.asarray(window_np))


def _apgd_finalize(carry):
    # flipped examples return their adversarial point; the rest return the
    # best-loss point (AA keeps both; run_standard_evaluation only consumes
    # the flipped ones, but callers probing loss progress need x_best).
    found = carry["found"]
    x_out = jnp.where(found[:, None, None, None], carry["x_best_adv"],
                      carry["x_best"])
    return x_out, found, carry["loss_best"]


def _apgd_single_run(model_fn: ModelFn, loss_fn, x: Array, y: Array,
                     key: Array, cfg: APGDConfig,
                     collect_trajectory: bool = False,
                     return_nfe: bool = False,
                     nfe_phases: Optional[dict] = None):
    carry = _apgd_init(model_fn, loss_fn, x, y, key, cfg,
                       nfe_phases=nfe_phases)
    body = _apgd_make_body(model_fn, loss_fn, x, y, cfg, collect_trajectory)
    carry, traj = jax.lax.scan(body, carry, _apgd_iters(cfg))
    out = _apgd_finalize(carry)
    if collect_trajectory:
        out = out + (traj,)
    if return_nfe:
        out = out + (carry["nfe"],)
    return out


def apgd_attack(model_fn: ModelFn, x: Array, y: Array, key: Array,
                cfg: APGDConfig) -> Tuple[Array, Array]:
    """Run APGD; returns (x_adv, found_mask).

    For loss='dlr-targeted' the top-n_target_classes are attacked in turn
    (APGD-T semantics). Restarts keep the first successful example.
    """
    B = x.shape[0]
    x_adv_final = x
    found_final = jnp.zeros((B,), bool)

    if cfg.loss == "dlr-targeted":
        logits_clean = model_fn(x, jax.random.fold_in(key, 991))
        order = jnp.argsort(logits_clean, axis=-1)  # ascending

    runs = (cfg.n_target_classes if cfg.loss == "dlr-targeted"
            else cfg.n_restarts)
    if cfg.loss not in ("ce", "dlr", "dlr-targeted"):
        raise ValueError(cfg.loss)

    # One jitted program serves every restart/target: the target class and
    # labels are arguments, and jit_lifted hoists the model params captured
    # by model_fn to arguments too (a closure-jit would inline them as
    # module constants — oversized uploads on remote-compile backends).
    from diffpure_tpu.utils.jitlift import jit_lifted

    def make_loss(yy, yt):
        if cfg.loss == "ce":
            return lambda logits: ce_loss(logits, yy)
        if cfg.loss == "dlr":
            return lambda logits: dlr_loss(logits, yy)
        return lambda logits: dlr_loss_targeted(logits, yy, yt)

    from diffpure_tpu.utils.profiling import absorb_nfe

    nfe_phases: dict = {}

    if cfg.iters_per_dispatch <= 0:
        def raw_run(xx, yy, yt, kk):
            return _apgd_single_run(model_fn, make_loss(yy, yt), xx, yy, kk,
                                    cfg, return_nfe=True,
                                    nfe_phases=nfe_phases)
        run_jit = jit_lifted(raw_run, x, y, y, key)

        def run_fn(xx, yy, yt, kk):
            x_out, found, loss_best, nfe = run_jit(xx, yy, yt, kk)
            absorb_nfe(nfe_phases, nfe)
            return x_out, found, loss_best
    else:
        # chunked dispatch: the scan runs iters_per_dispatch iterations per
        # device execution; the carry stays on device between dispatches.
        def raw_init(xx, yy, yt, kk):
            return _apgd_init(model_fn, make_loss(yy, yt), xx, yy, kk, cfg,
                              nfe_phases=nfe_phases)

        def raw_chunk(carry, its, xx, yy, yt):
            body = _apgd_make_body(model_fn, make_loss(yy, yt), xx, yy, cfg)
            carry, _ = jax.lax.scan(body, carry, its)
            return carry

        init_fn = jit_lifted(raw_init, x, y, y, key)
        iters_all = _apgd_iters(cfg)
        chunk_fns = {}  # by chunk length (the tail chunk may be shorter)

        def run_fn(xx, yy, yt, kk):
            carry = init_fn(xx, yy, yt, kk)
            step = cfg.iters_per_dispatch
            for s in range(0, cfg.n_iter, step):
                its = tuple(a[s:s + step] for a in iters_all)
                n = int(its[0].shape[0])
                if n not in chunk_fns:
                    chunk_fns[n] = jit_lifted(raw_chunk, carry, its,
                                              xx, yy, yt)
                carry = chunk_fns[n](carry, its, xx, yy, yt)
            # the carry's nfe element is the runtime count for the whole run
            # (program-output counting — works on callback-less backends)
            absorb_nfe(nfe_phases, carry["nfe"])
            return _apgd_finalize(carry)

    for run in range(runs):
        # target = (run+2)-th most probable class (skip the top class)
        y_t = (order[:, -(run + 2)] if cfg.loss == "dlr-targeted" else y)
        k_run = jax.random.fold_in(key, run)
        x_adv, found, _ = run_fn(x, y, y_t, k_run)
        if run == 0:
            # unfound slots carry the best-loss point of the first run
            x_adv_final = x_adv
            found_final = found
        else:
            take = found & ~found_final
            x_adv_final = jnp.where(take[:, None, None, None], x_adv,
                                    x_adv_final)
            found_final = found_final | found

    return x_adv_final, found_final
