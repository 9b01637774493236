"""Attack-level tests: known-optimum linear models, oracles, flag protocol."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.attacks import (
    apgd_attack, APGDConfig, square_attack, SquareConfig,
    fab_attack, FABConfig, pgd_attack, PGDConfig,
    bpda_eot_attack, BPDAEOTConfig, stadv_attack, StAdvConfig,
    AutoAttack, AutoAttackConfig,
    ce_loss, dlr_loss, dlr_loss_targeted, margin_loss,
)
from diffpure_tpu.ops.grid_sample import grid_sample, identity_grid


def make_linear_model(W, b=None):
    """model_fn(x01, key) -> x @ W + b (deterministic; ignores key)."""
    W = jnp.asarray(W)
    b = jnp.zeros(W.shape[1]) if b is None else jnp.asarray(b)

    def model_fn(x, key):
        return x.reshape(x.shape[0], -1) @ W + b

    return model_fn


@pytest.fixture
def linear_setup(rng):
    """A 2-class linear model on 4x4x1 images with moderate margins."""
    d = 16
    w = rng.randn(d).astype(np.float32)
    W = np.stack([w, -w], axis=1) * 0.5
    x = jnp.asarray(rng.rand(6, 4, 4, 1).astype(np.float32) * 0.5 + 0.25)
    model_fn = make_linear_model(W)
    logits = model_fn(x, None)
    y = jnp.argmax(logits, -1)
    return model_fn, x, y, W


class TestLosses:
    def test_dlr_oracle(self, rng):
        logits = jnp.asarray(rng.randn(5, 10).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, 5))
        got = np.asarray(dlr_loss(logits, y))
        lg = np.asarray(logits)
        for i in range(5):
            srt = np.sort(lg[i])
            zy = lg[i, int(y[i])]
            other = srt[-2] if srt[-1] == zy else srt[-1]
            want = -(zy - other) / (srt[-1] - srt[-3] + 1e-12)
            np.testing.assert_allclose(got[i], want, rtol=1e-5)

    def test_dlr_targeted_oracle(self, rng):
        logits = jnp.asarray(rng.randn(5, 10).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, 5))
        yt = jnp.asarray((np.asarray(y) + 1) % 10)
        got = np.asarray(dlr_loss_targeted(logits, y, yt))
        lg = np.asarray(logits)
        for i in range(5):
            srt = np.sort(lg[i])
            want = -(lg[i, int(y[i])] - lg[i, int(yt[i])]) / (
                srt[-1] - 0.5 * (srt[-3] + srt[-4]) + 1e-12)
            np.testing.assert_allclose(got[i], want, rtol=1e-5)

    def test_margin_sign(self):
        logits = jnp.array([[2.0, 1.0], [1.0, 3.0]])
        y = jnp.array([0, 0])
        m = np.asarray(margin_loss(logits, y))
        assert m[0] > 0 and m[1] < 0  # second is misclassified


class TestAPGD:
    def test_linf_reaches_linear_optimum(self, linear_setup, key):
        """On a linear model the optimal Linf attack is the sign corner;
        APGD must get within a few % of that CE loss."""
        model_fn, x, y, W = linear_setup
        eps = 0.1
        cfg = APGDConfig(norm="Linf", eps=eps, n_iter=50, loss="ce")
        x_adv, found = apgd_attack(model_fn, x, y, key, cfg)

        # optimal corner
        Wd = np.asarray(W)
        wdiff = (Wd[:, 1] - Wd[:, 0])  # increase for y=0... handle per-ex
        x_np = np.asarray(x).reshape(6, -1)
        y_np = np.asarray(y)
        opt_losses = []
        for i in range(6):
            direction = Wd[:, 1 - y_np[i]] - Wd[:, y_np[i]]
            x_opt = np.clip(x_np[i] + eps * np.sign(direction), 0, 1)
            z = x_opt @ Wd
            opt_losses.append(-np.log(np.exp(z[y_np[i]]) / np.exp(z).sum()))
        got_losses = np.asarray(ce_loss(model_fn(x_adv, None), y))
        assert (got_losses >= 0.93 * np.asarray(opt_losses) - 1e-3).all(), (
            got_losses, opt_losses)

    def test_ball_constraint_respected(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        eps = 0.05
        for norm in ["Linf", "L2"]:
            cfg = APGDConfig(norm=norm, eps=eps, n_iter=20, loss="ce")
            x_adv, _ = apgd_attack(model_fn, x, y, key, cfg)
            d = np.asarray(x_adv - x).reshape(6, -1)
            if norm == "Linf":
                assert np.abs(d).max() <= eps + 1e-5
            else:
                assert (np.linalg.norm(d, axis=-1) <= eps + 1e-4).all()
            assert np.asarray(x_adv).min() >= 0 and np.asarray(x_adv).max() <= 1

    def test_found_flag_consistent(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = APGDConfig(norm="Linf", eps=0.5, n_iter=30, loss="ce")
        x_adv, found = apgd_attack(model_fn, x, y, key, cfg)
        pred = jnp.argmax(model_fn(x_adv, None), -1)
        wrong = np.asarray(pred != y)
        # every 'found' example must indeed be misclassified at x_adv
        assert (wrong[np.asarray(found)]).all()

    def test_dlr_and_targeted_run(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        for loss in ["dlr", "dlr-targeted"]:
            # 2-class DLR needs >=4 classes; extend W
            rng2 = np.random.RandomState(3)
            W4 = jnp.asarray(rng2.randn(16, 4).astype(np.float32))
            mf = make_linear_model(W4)
            y4 = jnp.argmax(mf(x, None), -1)
            cfg = APGDConfig(norm="Linf", eps=0.2, n_iter=20, loss=loss,
                             n_target_classes=3)
            x_adv, found = apgd_attack(mf, x, y4, key, cfg)
            assert x_adv.shape == x.shape

    def test_eot_with_stochastic_model(self, linear_setup, key):
        model_fn0, x, y, W = linear_setup
        # weaken margins so the eps-ball can cross the boundary
        model_fn = make_linear_model(np.asarray(W) * 0.15)
        y = jnp.argmax(model_fn(x, None), -1)

        def noisy_model(xx, k):
            noise = jax.random.normal(k, (xx.shape[0], 2)) * 0.05
            return model_fn(xx, None) + noise

        cfg = APGDConfig(norm="Linf", eps=0.5, n_iter=30, eot_iter=4,
                         loss="ce")
        x_adv, found = apgd_attack(noisy_model, x, y, key, cfg)
        assert np.asarray(found).any()
        # EOT-mean logits: margins must drop toward the feasibility limit
        m0 = np.asarray(margin_loss(model_fn(x, None), y))
        m1 = np.asarray(margin_loss(model_fn(x_adv, None), y))
        assert m1.mean() < 0.4 * m0.mean()


class TestSquare:
    def test_linf_breaks_weak_margin(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = SquareConfig(norm="Linf", eps=0.5, n_queries=300)
        x_adv, found = square_attack(model_fn, x, y, key, cfg)
        assert np.asarray(found).any()
        d = np.abs(np.asarray(x_adv - x))
        assert d.max() <= 0.5 + 1e-5

    def test_margin_never_increases(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = SquareConfig(norm="Linf", eps=0.1, n_queries=100)
        x_adv, _ = square_attack(model_fn, x, y, key, cfg)
        m0 = np.asarray(margin_loss(model_fn(x, None), y))
        m1 = np.asarray(margin_loss(model_fn(x_adv, None), y))
        assert (m1 <= m0 + 1e-5).all()

    def test_l2_runs_and_respects_ball(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = SquareConfig(norm="L2", eps=0.5, n_queries=100)
        x_adv, _ = square_attack(model_fn, x, y, key, cfg)
        d = np.asarray(x_adv - x).reshape(6, -1)
        assert (np.linalg.norm(d, axis=-1) <= 0.5 + 1e-4).all()


class TestFAB:
    def test_finds_near_minimal_linf_distance(self, key, rng):
        """Linear model: minimal Linf distance to the boundary is
        |margin| / ||w_diff||_1."""
        d = 16
        w = rng.randn(d).astype(np.float32)
        W = np.stack([w, -w], axis=1)
        model_fn = make_linear_model(W)
        x = jnp.asarray(rng.rand(4, 4, 4, 1).astype(np.float32) * 0.4 + 0.3)
        y = jnp.argmax(model_fn(x, None), -1)

        margins = np.asarray(margin_loss(model_fn(x, None), y))
        wdiff_l1 = np.abs(W[:, 0] - W[:, 1]).sum()
        d_min = margins / wdiff_l1

        cfg = FABConfig(norm="Linf", eps=float(d_min.max() * 3 + 0.05),
                        n_iter=30, n_target_classes=1)
        x_adv, found = fab_attack(model_fn, x, y, key, cfg)
        assert np.asarray(found).all()
        dist = np.abs(np.asarray(x_adv - x)).reshape(4, -1).max(-1)
        assert (dist <= 2.0 * d_min + 0.02).all(), (dist, d_min)

    def test_projection_linf_exact(self, rng):
        from diffpure_tpu.attacks.fab import _proj_hyperplane_box_linf
        x = jnp.asarray(rng.rand(3, 2, 2, 1).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 2, 2, 1).astype(np.float32))
        # target plane through a nearby feasible point
        z_target = jnp.clip(x + 0.1 * jnp.sign(w), 0, 1)
        b = jnp.sum(w.reshape(3, -1) * z_target.reshape(3, -1), -1)
        z = _proj_hyperplane_box_linf(x, w, b)
        # constraint satisfied
        got_b = np.sum(np.asarray(w).reshape(3, -1)
                       * np.asarray(z).reshape(3, -1), -1)
        np.testing.assert_allclose(got_b, np.asarray(b), rtol=1e-3, atol=1e-3)
        # within box
        assert np.asarray(z).min() >= -1e-6 and np.asarray(z).max() <= 1 + 1e-6
        # norm <= the known feasible 0.1 (+tolerance)
        dist = np.abs(np.asarray(z - x)).reshape(3, -1).max(-1)
        assert (dist <= 0.1 + 1e-3).all()

    def test_projection_l2_exact(self, rng):
        from diffpure_tpu.attacks.fab import _proj_hyperplane_box_l2
        x = jnp.asarray(rng.rand(3, 2, 2, 1).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 2, 2, 1).astype(np.float32))
        z_target = jnp.clip(x + 0.1 * w / jnp.max(jnp.abs(w)), 0, 1)
        b = jnp.sum(w.reshape(3, -1) * z_target.reshape(3, -1), -1)
        z = _proj_hyperplane_box_l2(x, w, b)
        got_b = np.sum(np.asarray(w).reshape(3, -1)
                       * np.asarray(z).reshape(3, -1), -1)
        np.testing.assert_allclose(got_b, np.asarray(b), rtol=1e-3, atol=1e-3)


class TestPGD:
    def test_increases_loss(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = PGDConfig(eps=0.1, step_size=0.02, n_iter=20)
        x_adv, _ = pgd_attack(model_fn, x, y, key, cfg)
        l0 = np.asarray(ce_loss(model_fn(x, None), y)).mean()
        l1 = np.asarray(ce_loss(model_fn(x_adv, None), y)).mean()
        assert l1 > l0


class TestGridSample:
    def test_identity(self, rng):
        x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
        g = identity_grid(2, 8, 8)
        out = grid_sample(x, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        x = rng.rand(2, 3, 8, 8).astype(np.float32)
        g = (rng.rand(2, 8, 8, 2).astype(np.float32) - 0.5) * 2.2  # incl. OOB
        got = np.asarray(grid_sample(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(g)))
        want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(g),
                             mode="bilinear", padding_mode="zeros",
                             align_corners=False).numpy()
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)

    def test_identity_grid_matches_torch_affine_grid(self):
        import torch
        import torch.nn.functional as F
        theta = torch.zeros(2, 2, 3)
        theta[:, 0, 0] = 1
        theta[:, 1, 1] = 1
        want = F.affine_grid(theta, (2, 3, 8, 8), align_corners=False).numpy()
        got = np.asarray(identity_grid(2, 8, 8))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestStAdv:
    def test_tv_norm_matches_reference(self, rng):
        """Oracle: the reference's permutation-matrix stAdv norm."""
        import torch
        import sys
        import reference_oracle as ro
        ro.add_reference_path()
        ro._patch_cpp_extension()
        from stadv_eot.recoloradv.mister_ed import spatial_transformers as st

        B, H, W = 2, 6, 6
        xform = st.FullSpatial(shape=torch.Size([B, 3, H, W]),
                               manual_gpu=False)
        delta = rng.randn(B, H, W, 2).astype(np.float32) * 0.1
        with torch.no_grad():
            xform.xform_params.add_(torch.from_numpy(delta))
        want = xform.stAdv_norm().detach().numpy()

        from diffpure_tpu.attacks.stadv import stadv_tv_norm
        got = np.asarray(stadv_tv_norm(jnp.asarray(delta)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_reduces_margin_on_linear_model(self, linear_setup, key):
        model_fn0, x, y, W = linear_setup
        model_fn = make_linear_model(np.asarray(W) * 0.15)
        y = jnp.argmax(model_fn(x, None), -1)
        cfg = StAdvConfig(bound=0.5, n_iter=60, lr=0.05)
        x_adv, found = stadv_attack(model_fn, x, y, key, cfg)
        assert x_adv.shape == x.shape
        m0 = np.asarray(margin_loss(model_fn(x, None), y))
        m1 = np.asarray(margin_loss(model_fn(x_adv, None), y))
        assert m1.mean() < 0.6 * m0.mean()

    def test_flips_spatially_structured_model(self, rng, key):
        """A left-vs-right intensity classifier is trivially broken by a
        flow that shifts content — the threat model StAdv targets."""
        H = W_ = 8
        w_img = np.zeros((H, W_, 1), np.float32)
        w_img[:, :4] = 1.0
        w_img[:, 4:] = -1.0
        W2 = np.stack([w_img.ravel(), -w_img.ravel()], 1)
        model_fn = make_linear_model(W2)
        # images: bright stripe near the center-left
        x = np.zeros((4, H, W_, 1), np.float32) + 0.1
        x[:, :, 3] = 0.9
        x = jnp.asarray(x)
        y = jnp.argmax(model_fn(x, None), -1)
        cfg = StAdvConfig(bound=0.6, n_iter=80, lr=0.05)
        x_adv, found = stadv_attack(model_fn, x, y, key, cfg)
        assert np.asarray(found).all()

    def test_bound_respected(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = StAdvConfig(bound=0.03, n_iter=10, lr=0.05)
        x_adv, _ = stadv_attack(model_fn, x, y, key, cfg)
        # transformed image stays in [0,1] (sampled from [0,1] pixels)
        assert np.asarray(x_adv).min() >= -1e-5
        assert np.asarray(x_adv).max() <= 1 + 1e-5


class TestBPDAEOT:
    def test_end_to_end_with_noisy_purifier(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup

        def purify_fn(xx, k):
            return jnp.clip(xx + 0.01 * jax.random.normal(k, xx.shape), 0, 1)

        def classify_fn(p):
            return model_fn(p, None)

        cfg = BPDAEOTConfig(adv_eps=0.3, adv_eta=0.05, adv_steps=5,
                            eot_defense_reps=8, eot_attack_reps=4,
                            defense_batch=8)
        x_adv, class_batch = bpda_eot_attack(purify_fn, classify_fn, x, y,
                                             key, cfg)
        assert class_batch.shape == (7, 6)
        # defended count must be non-increasing over steps
        counts = class_batch.sum(axis=1)
        assert (np.diff(counts[1:]) <= 0).all()
        # with a large ball, some example should fall
        assert counts[-1] <= counts[1]

    def test_attack_batch_chunked_matches_monolithic(self, linear_setup,
                                                     key):
        """attack_batch bounds the per-dispatch rep count (execution
        watchdog, CelebA t*=500 budgets). With a key-independent purifier
        the chunked estimator is exactly the monolithic one — same
        adversarial example, same defended matrix."""
        model_fn, x, y, _ = linear_setup

        def purify_fn(xx, k):  # deterministic: chunk keys must not matter
            return jnp.clip(xx * 0.9 + 0.05, 0, 1)

        def classify_fn(p):
            return model_fn(p, None)

        base = dict(adv_eps=0.3, adv_eta=0.05, adv_steps=4,
                    eot_defense_reps=4, eot_attack_reps=5, defense_batch=2)
        cfg_mono = BPDAEOTConfig(**base)
        cfg_chunk = BPDAEOTConfig(**base, attack_batch=2)  # chunks 2+2+1
        xa_m, cb_m = bpda_eot_attack(purify_fn, classify_fn, x, y, key,
                                     cfg_mono)
        xa_c, cb_c = bpda_eot_attack(purify_fn, classify_fn, x, y, key,
                                     cfg_chunk)
        np.testing.assert_allclose(np.asarray(xa_c), np.asarray(xa_m),
                                   atol=1e-6)
        np.testing.assert_array_equal(cb_c, cb_m)

    def test_attack_batch_chunked_nfe_and_stochastic(self, linear_setup,
                                                     key):
        """Chunked dispatches must account the same total NFE as the
        monolithic program, and the stochastic protocol invariants hold."""
        from diffpure_tpu.utils.profiling import count_nfe, record_nfe

        model_fn, x, y, _ = linear_setup

        def purify_fn(xx, k):
            record_nfe("toy", 3)  # 3 score evals per purify call
            return jnp.clip(xx + 0.01 * jax.random.normal(k, xx.shape), 0, 1)

        def classify_fn(p):
            return model_fn(p, None)

        base = dict(adv_eps=0.3, adv_eta=0.05, adv_steps=3,
                    eot_defense_reps=4, eot_attack_reps=4, defense_batch=4)
        with count_nfe() as c_m:
            _, cb_m = bpda_eot_attack(purify_fn, classify_fn, x, y, key,
                                      BPDAEOTConfig(**base))
        with count_nfe() as c_c:
            _, cb_c = bpda_eot_attack(
                purify_fn, classify_fn, x, y, key,
                BPDAEOTConfig(**base, attack_batch=3))  # chunks 3+1
        counts = cb_c.sum(axis=1)
        assert (np.diff(counts[1:]) <= 0).all()
        # same purify-call structure => same NFE total, unless a defended
        # flip triggered a data-dependent re-verification in exactly one
        # of the two runs (different EOT sample streams); allow only that
        # delta: one defense_predict = eot_defense_reps purify calls.
        per_verify = 3 * base["eot_defense_reps"]
        assert abs(c_c.total() - c_m.total()) % per_verify == 0


class TestAutoAttackSuite:
    def test_rand_version(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = AutoAttackConfig(version="rand", eps=0.3, n_iter=10, eot_iter=2)
        aa = AutoAttack(model_fn, cfg, log_fn=lambda *a: None)
        x_adv, robust = aa.run_standard_evaluation(x, y, key)
        assert x_adv.shape == x.shape
        # verify the flags: every non-robust example misclassified
        pred = np.asarray(jnp.argmax(model_fn(x_adv, None), -1))
        broken = ~np.asarray(robust)
        assert (pred[broken] != np.asarray(y)[broken]).all()

    def test_custom_version(self, linear_setup, key):
        model_fn, x, y, _ = linear_setup
        cfg = AutoAttackConfig(version="custom", attacks_to_run=("apgd-ce",),
                               eps=0.2, n_iter=10)
        aa = AutoAttack(model_fn, cfg, log_fn=lambda *a: None)
        x_adv, robust = aa.run_standard_evaluation(x, y, key)
        assert x_adv.shape == x.shape

    def test_standard_version_runs(self, linear_setup, key):
        _, x, _, _ = linear_setup
        rng2 = np.random.RandomState(5)
        model_fn = make_linear_model(
            jnp.asarray(rng2.randn(16, 4).astype(np.float32)))
        y = jnp.argmax(model_fn(x, None), -1)
        cfg = AutoAttackConfig(version="standard", eps=0.3, n_iter=5,
                               square_n_queries=30, fab_n_target_classes=1,
                               apgd_t_n_target_classes=1)
        aa = AutoAttack(model_fn, cfg, log_fn=lambda *a: None)
        x_adv, robust = aa.run_standard_evaluation(x, y, key)
        assert x_adv.shape == x.shape

    def test_later_phases_attack_only_robust_subset(self, key):
        """Upstream robust_flags protocol: once phase 1 breaks examples,
        phase 2 must gather + attack only the survivors (padded to a
        static power-of-two bucket)."""
        # decision depends on pixel (0,0,0): margin 0.05 for the first
        # three (breakable at eps=0.12), 0.5 for the rest (unbreakable)
        x = np.full((6, 2, 2, 3), 0.5, np.float32)
        x[:3, 0, 0, 0] = 0.30
        x[3:, 0, 0, 0] = 0.75
        y = jnp.zeros((6,), jnp.int32)
        seen_batches = []

        def spy_model(xx, k):
            seen_batches.append(int(xx.shape[0]))
            t = xx.reshape(xx.shape[0], -1)[:, 0]
            return jnp.stack([t - 0.25, 0.25 - t], axis=-1) * 20.0

        cfg = AutoAttackConfig(version="custom",
                               attacks_to_run=("apgd-ce", "apgd-dlr"),
                               eps=0.12, n_iter=8)
        aa = AutoAttack(spy_model, cfg, log_fn=lambda *a: None)
        _, robust = aa.run_standard_evaluation(jnp.asarray(x), y, key)
        n_attacked = aa.phase_batch_sizes
        # phase 1 attacked all 6, broke the 3 breakable ones; phase 2
        # attacked only the 3 survivors padded to a 4-bucket
        assert n_attacked == [6, 3]
        assert np.asarray(robust).sum() == 3
        assert 4 in seen_batches  # padded subset batch reached the model
        from diffpure_tpu.attacks.autoattack import _next_pow2
        assert _next_pow2(3) == 4 and _next_pow2(4) == 4


class TestAPGDSchedule:
    def test_checkpoint_positions_match_autoattack(self):
        """n_iter=100 checkpoint *values* 22, 41, 57, 70, 80, 87, 93, 99
        (the p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06) schedule);
        upstream's counter fires after the k-th iteration, i.e. at 0-based
        iteration value-1 (see test_apgd_parity.py for the trajectory
        proof)."""
        from diffpure_tpu.attacks.apgd import _checkpoints
        is_ckpt, window = _checkpoints(100)
        positions = list(np.where(is_ckpt)[0])
        assert positions == [21, 40, 56, 69, 79, 86, 92, 98], positions
        # windows are the gaps between consecutive checkpoint values
        assert window[21] == 22 and window[40] == 19 and window[98] == 6


class TestBrownianReplay:
    def test_increments_reconstructible(self, key):
        """The adjoint's noise replay: dW_i from (key, i) alone."""
        from diffpure_tpu.solvers.em import brownian_increment
        import jax
        a = brownian_increment(key, jnp.asarray(5), (2, 3), 0.01)
        b = brownian_increment(key, jnp.asarray(5), (2, 3), 0.01)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = brownian_increment(key, jnp.asarray(6), (2, 3), 0.01)
        assert not np.allclose(np.asarray(a), np.asarray(c))
        # variance ~ dt
        big = brownian_increment(key, jnp.asarray(0), (20000,), 0.01)
        assert abs(float(jnp.var(big)) - 0.01) < 0.002


class TestAPGDChunkedDispatch:
    def test_chunked_equals_one_program(self, linear_setup, key):
        """iters_per_dispatch must not change the math: same keys, same
        trajectory, bit-equal outputs vs the single-program run (including
        a tail chunk: 50 iters in chunks of 7)."""
        model_fn, x, y, W = linear_setup
        base = dict(norm="Linf", eps=0.1, n_iter=50, loss="ce")
        x1, f1 = apgd_attack(model_fn, x, y, key, APGDConfig(**base))
        x2, f2 = apgd_attack(model_fn, x, y, key,
                             APGDConfig(**base, iters_per_dispatch=7))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)

    def test_chunked_targeted(self, linear_setup, key):
        model_fn, x, y, W = linear_setup
        base = dict(norm="L2", eps=0.5, n_iter=20, loss="dlr-targeted",
                    n_target_classes=2)
        x1, f1 = apgd_attack(model_fn, x, y, key, APGDConfig(**base))
        x2, f2 = apgd_attack(model_fn, x, y, key,
                             APGDConfig(**base, iters_per_dispatch=8))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


class TestStAdvChunkedDispatch:
    def test_chunked_equals_one_program(self, linear_setup, key):
        model_fn0, x, y, W = linear_setup
        model_fn = make_linear_model(np.asarray(W) * 0.15)
        y = jnp.argmax(model_fn(x, None), -1)
        base = dict(bound=0.5, n_iter=25, lr=0.05)
        x1, f1 = stadv_attack(model_fn, x, y, key, StAdvConfig(**base))
        x2, f2 = stadv_attack(model_fn, x, y, key,
                              StAdvConfig(**base, iters_per_dispatch=7))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


class TestFABSquareChunkedDispatch:
    """Round 4: FAB-T and Square gained scan_chunked dispatch bounding so
    the full AA-standard suite can run through minutes-per-call defended
    forwards on the execution-watchdog backend (flagship protocol runs).
    Chunking must not change the math: bit-equal vs the one-program scan,
    including a tail chunk."""

    def test_fab_chunked_equals_one_program(self, linear_setup, key):
        from diffpure_tpu.attacks.fab import FABConfig, fab_attack
        model_fn, x, y, W = linear_setup
        base = dict(norm="Linf", eps=0.3, n_iter=20, n_target_classes=2)
        x1, f1 = fab_attack(model_fn, x, y, key, FABConfig(**base))
        x2, f2 = fab_attack(model_fn, x, y, key,
                            FABConfig(**base, iters_per_dispatch=7))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-6)

    def test_square_chunked_equals_one_program(self, linear_setup, key):
        from diffpure_tpu.attacks.square import SquareConfig, square_attack
        model_fn, x, y, W = linear_setup
        for norm, eps in (("Linf", 0.15), ("L2", 0.8)):
            base = dict(norm=norm, eps=eps, n_queries=30)
            x1, f1 = square_attack(model_fn, x, y, key,
                                   SquareConfig(**base))
            x2, f2 = square_attack(model_fn, x, y, key,
                                   SquareConfig(**base,
                                                iters_per_dispatch=9))
            np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
            np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                       atol=1e-6)
