"""APGD upstream-parity: trajectory equality vs a hand-coded reference loop.

The oracle below is a line-by-line reimplementation of AutoAttack's
`APGDAttack.attack_single_run` control flow (arXiv:2003.01690; the torch-only
`autoattack` package pinned by the reference at eval_sde_adv.py:103-110) in
plain numpy: zeroed loss_steps history, counter3/k checkpoint cadence,
check_oscillation's inclusive `t <= k*0.75` boundary, condition-2
(reduced_last_check / loss_best_last_check), best-point restart on halving,
momentum a=0.75 after the first step, and EOT with grad-mean /
last-sample-loss bookkeeping.

Both sides call the same jitted model so logits/grads agree bitwise; the
discrete decision sequence (step-size halvings — one per checkpoint branch)
must match exactly, and the loss trajectories to float tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpure_tpu.attacks.apgd import (
    APGDConfig, _apgd_single_run, _checkpoints,
)
from diffpure_tpu.attacks.losses import ce_loss, dlr_loss


def make_model(noise_scale=0.0, n_classes=5, d=48, seed=0):
    """Tiny deterministic MLP (+ optional key-dependent logit noise for EOT
    tests); returns model_fn(x, key)->logits plus a loss/grad helper."""
    rng = np.random.RandomState(seed)
    W1 = jnp.asarray(rng.randn(d, 32).astype(np.float32) * 0.5)
    W2 = jnp.asarray(rng.randn(32, n_classes).astype(np.float32) * 0.5)

    def model_fn(x, key):
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ W1)
        logits = h @ W2
        if noise_scale > 0:
            logits = logits + noise_scale * jax.random.normal(
                key, logits.shape)
        return logits

    return model_fn


def upstream_apgd_reference(model_fn, loss_name, x0, y, key, *, eps, n_iter,
                            norm="Linf", eot_iter=1, rho=0.75):
    """Upstream AutoAttack APGD, numpy control flow; returns trajectories.

    Consumes the exact PRNG stream of attacks/apgd.py (init split, per-iter
    fold_ins) so both sides see identical random draws.
    """
    B = x0.shape[0]
    y_j = jnp.asarray(y)

    def loss_of(logits):
        if loss_name == "ce":
            return ce_loss(logits, y_j)
        return dlr_loss(logits, y_j)

    def loss_grad(x_np, k):
        """Same jitted computation the attack uses: per-EOT loss+grad."""
        def f(xx):
            logits = model_fn(xx, k)
            losses = loss_of(logits)
            return losses.sum(), (losses, logits)
        (_, (losses, logits)), g = jax.value_and_grad(
            f, has_aux=True)(jnp.asarray(x_np))
        return (np.array(losses), np.array(g), np.array(logits))

    def eot_loss_grad(x_np, k):
        """grad = EOT mean; losses/logits = last sample (upstream)."""
        from diffpure_tpu.attacks.eot import eot_keys
        if eot_iter == 1:
            return loss_grad(x_np, jax.random.fold_in(k, 0))
        keys = eot_keys(k, eot_iter)
        g_acc = 0.0
        for i in range(eot_iter):
            losses, g, logits = loss_grad(x_np, keys[i])
            g_acc = g_acc + g
        return losses, (g_acc / eot_iter).astype(np.float32), logits

    # --- init: same PRNG stream as _apgd_init --------------------------------
    k_init, k_loop = jax.random.split(key)
    if norm == "Linf":
        t = np.asarray(2 * jax.random.uniform(k_init, x0.shape) - 1)
        tmax = np.abs(t.reshape(B, -1)).max(-1).reshape(-1, 1, 1, 1)
        x_adv = x0 + eps * t / np.maximum(tmax, 1e-12)
    else:
        t = np.asarray(jax.random.normal(k_init, x0.shape))
        tn = np.sqrt((t.reshape(B, -1) ** 2).sum(-1)).reshape(-1, 1, 1, 1)
        x_adv = x0 + eps * t / np.maximum(tn, 1e-12)
    x_adv = np.clip(x_adv, 0.0, 1.0).astype(np.float32)

    losses, grad, logits = eot_loss_grad(
        x_adv, jax.random.fold_in(k_loop, 2 ** 31 - 1))
    acc = logits.argmax(-1) == y  # still-correct mask
    loss_best = losses.copy()
    grad_best = grad.copy()
    x_best = x_adv.copy()
    x_best_adv = x_adv.copy()
    step_size = np.full((B, 1, 1, 1), 2.0 * eps, np.float32)

    # upstream buffers
    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)
    loss_steps = np.zeros((n_iter, B), np.float32)
    counter3 = 0
    k_interval = n_iter_2
    loss_best_last_check = loss_best.copy()
    reduced_last_check = np.ones(B, bool)
    x_adv_old = x_adv.copy()

    def project(z):
        if norm == "Linf":
            z = np.minimum(np.maximum(z, x0 - eps), x0 + eps)
        else:
            d = z - x0
            nrm = np.sqrt((d.reshape(B, -1) ** 2).sum(-1)).reshape(
                -1, 1, 1, 1)
            z = x0 + d * np.minimum(1.0, eps / np.maximum(nrm, 1e-12))
        return np.clip(z, 0.0, 1.0)

    traj = dict(loss_best=[], step_size=[], losses=[])
    for i in range(n_iter):
        a = 0.75 if i > 0 else 1.0
        if norm == "Linf":
            z = x_adv + step_size * np.sign(grad)
        else:
            gn = np.sqrt((grad.reshape(B, -1) ** 2).sum(-1)).reshape(
                -1, 1, 1, 1)
            z = x_adv + step_size * grad / np.maximum(gn, 1e-12)
        x1 = project(z)
        x1 = project(x_adv + (x1 - x_adv) * a + (x_adv - x_adv_old) * (1 - a))
        x_adv_old = x_adv.copy()
        x_adv = x1.astype(np.float32)

        losses, grad, logits = eot_loss_grad(
            x_adv, jax.random.fold_in(k_loop, i))
        pred_wrong = logits.argmax(-1) != y
        acc = acc & ~pred_wrong
        x_best_adv[pred_wrong] = x_adv[pred_wrong]

        loss_steps[i] = losses
        improved = losses > loss_best
        x_best[improved] = x_adv[improved]
        grad_best[improved] = grad[improved]
        loss_best[improved] = losses[improved]

        counter3 += 1
        if counter3 == k_interval:
            # check_oscillation over the last k_interval comparisons
            t_cnt = np.zeros(B)
            for c in range(k_interval):
                prev = loss_steps[i - c - 1] if i - c - 1 >= 0 else \
                    loss_steps[i - c - 1]  # numpy wraps to zeros row
                t_cnt += (loss_steps[i - c] > prev)
            fl_osc = t_cnt <= k_interval * rho
            fl_no_impr = (~reduced_last_check) & (
                loss_best_last_check >= loss_best)
            halve = fl_osc | fl_no_impr
            reduced_last_check = halve.copy()
            loss_best_last_check = loss_best.copy()
            step_size[halve] /= 2.0
            x_adv[halve] = x_best[halve]
            grad[halve] = grad_best[halve]
            counter3 = 0
            k_interval = max(k_interval - size_decr, n_iter_min)

        traj["losses"].append(losses.copy())
        traj["loss_best"].append(loss_best.copy())
        traj["step_size"].append(step_size[:, 0, 0, 0].copy())

    found = ~acc
    x_out = np.where(found[:, None, None, None], x_best_adv, x_best)
    return x_out, found, {k: np.stack(v) for k, v in traj.items()}


def run_attack_with_traj(model_fn, loss_name, x, y, key, cfg):
    def loss_fn(logits):
        if loss_name == "ce":
            return ce_loss(logits, jnp.asarray(y))
        return dlr_loss(logits, jnp.asarray(y))
    out = _apgd_single_run(model_fn, loss_fn, jnp.asarray(x), jnp.asarray(y),
                           key, cfg, collect_trajectory=True)
    x_adv, found, loss_best, traj = out
    return (np.asarray(x_adv), np.asarray(found),
            {k: np.asarray(v) for k, v in traj.items()})


def run_attack_eager(model_fn, loss_name, x, y, key, cfg):
    """Execute the production body iteration-by-iteration in eager mode.

    Eager elementwise jax ops are IEEE-exact and unfused, so this side can
    match the numpy reference bitwise; the jitted scan is compared to it
    separately (fusion/FMA contraction perturbs values by ulps, which
    chaotic losses amplify — decisions must still agree).
    """
    from diffpure_tpu.attacks.apgd import (_apgd_init, _apgd_make_body,
                                           _apgd_iters, _apgd_finalize)

    def loss_fn(logits):
        if loss_name == "ce":
            return ce_loss(logits, jnp.asarray(y))
        return dlr_loss(logits, jnp.asarray(y))

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    carry = _apgd_init(model_fn, loss_fn, xj, yj, key, cfg)
    body = _apgd_make_body(model_fn, loss_fn, xj, yj, cfg,
                           collect_trajectory=True)
    iters = _apgd_iters(cfg)
    traj = {"losses": [], "loss_best": [], "step_size": []}
    for i in range(cfg.n_iter):
        carry, ys = body(carry, tuple(a[i] for a in iters))
        for k in traj:
            traj[k].append(np.asarray(ys[k]))
    x_adv, found, loss_best = _apgd_finalize(carry)
    return (np.asarray(x_adv), np.asarray(found),
            {k: np.stack(v) for k, v in traj.items()})


@pytest.fixture
def data():
    rng = np.random.RandomState(3)
    x = rng.rand(6, 4, 4, 3).astype(np.float32)
    y = rng.randint(0, 5, 6)
    return x, y


class TestAPGDTrajectoryParity:
    def _check(self, noise, loss_name, norm, eot_iter, data, n_iter=100,
               n_classes=5, loss_prefix=None):
        """Decisions (halvings, found) must match exactly over the full run;
        loss values to float tolerance. For chaotic losses (DLR's rational
        form amplifies 1-ulp FMA-contraction differences between numpy and
        fused XLA across iterations), the value comparison is restricted to
        a prefix — the decision trajectory still covers all checkpoints.
        """
        x, y = data
        model_fn = make_model(noise_scale=noise, n_classes=n_classes)
        key = jax.random.PRNGKey(42)
        cfg = APGDConfig(norm=norm, eps=0.1, n_iter=n_iter,
                         eot_iter=eot_iter, loss=loss_name, eot_loss="last")
        want_x, want_found, want = upstream_apgd_reference(
            model_fn, loss_name, x, y, key, eps=0.1, n_iter=n_iter,
            norm=norm, eot_iter=eot_iter)

        # (1) semantics: eager body execution vs the upstream numpy loop —
        # full-trajectory equality at float32 exactness scale. Linf position
        # arithmetic is purely elementwise (bitwise across numpy/jax); the
        # L2 branch reduces (norms), whose summation order differs -> ulps.
        tol = 1e-6 if norm == "Linf" else 1e-4
        eag_x, eag_found, eag = run_attack_eager(
            model_fn, loss_name, x, y, key, cfg)
        np.testing.assert_array_equal(eag["step_size"], want["step_size"])
        np.testing.assert_allclose(eag["losses"], want["losses"],
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(eag["loss_best"], want["loss_best"],
                                   rtol=tol, atol=tol)
        np.testing.assert_array_equal(eag_found, want_found)
        np.testing.assert_allclose(eag_x, want_x, rtol=tol, atol=tol)

        # (2) plumbing: the jitted scan must reproduce every discrete
        # decision; values to tolerance over a prefix (XLA fusion perturbs
        # by ulps, which chaotic losses amplify downstream).
        got_x, got_found, got = run_attack_with_traj(
            model_fn, loss_name, x, y, key, cfg)
        np.testing.assert_array_equal(got["step_size"], want["step_size"])
        np.testing.assert_array_equal(got_found, want_found)
        p = loss_prefix or n_iter
        np.testing.assert_allclose(got["losses"][:p], want["losses"][:p],
                                   rtol=2e-5, atol=2e-5)

    def test_ce_linf_deterministic(self, data):
        self._check(0.0, "ce", "Linf", 1, data)

    def test_dlr_linf_deterministic(self, data):
        self._check(0.0, "dlr", "Linf", 1, data, n_classes=10,
                    loss_prefix=1)

    def test_ce_l2_deterministic(self, data):
        self._check(0.0, "ce", "L2", 1, data)

    def test_ce_linf_eot_last(self, data):
        """Stochastic model: grad-mean + last-sample-loss bookkeeping."""
        self._check(0.3, "ce", "Linf", 3, data)

    def test_halving_branches_exercised(self, data):
        """The parity run must actually cover the halving machinery."""
        x, y = data
        model_fn = make_model()
        cfg = APGDConfig(norm="Linf", eps=0.1, n_iter=100, eot_iter=1,
                         loss="ce", eot_loss="last")
        _, _, got = run_attack_with_traj(model_fn, "ce", x, y,
                                         jax.random.PRNGKey(42), cfg)
        # at least one example halved its step at least twice
        assert (got["step_size"][-1] <= 0.05 + 1e-8).any()

    def test_checkpoint_positions_match_upstream_counter(self):
        """is_ckpt marks i where upstream's counter3 == k fires."""
        is_ckpt, window = _checkpoints(100)
        # upstream: k=22 -> i=21; 19 -> 40; 16 -> 56; 13 -> 69; 10 -> 79;
        # 7 -> 86; 6 -> 92; 6 -> 98
        want = [21, 40, 56, 69, 79, 86, 92, 98]
        assert list(np.nonzero(is_ckpt)[0]) == want
        assert [int(window[i]) for i in want] == [22, 19, 16, 13, 10, 7, 6, 6]
