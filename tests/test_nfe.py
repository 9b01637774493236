"""NFE counting in the integrator layer (SURVEY.md §5.1, VERDICT weak #8).

Counters must reflect real runtime executions — including solver calls that
happen inside jitted attack scans, where a Python-side counter would freeze
at trace time.
"""
import numpy as np
import jax
import jax.numpy as jnp

from diffpure_tpu.utils.profiling import count_nfe
from diffpure_tpu.purify import PurifyConfig, purify
from diffpure_tpu.eval.defended import DefendedModel


def tiny_score_fn():
    W = jnp.asarray(np.random.RandomState(0).randn(48, 48).astype(
        np.float32) * 0.01)

    def score_fn(params, x, t):
        return (x.reshape(x.shape[0], -1) @ params).reshape(x.shape)

    return score_fn, W


class TestSolverNFE:
    def test_sde_euler_counts_per_execution(self, key):
        score_fn, W = tiny_score_fn()
        cfg = PurifyConfig(diffusion_type="sde", t=4,
                           score_type="score_sde", grad_mode="none")
        x = jnp.zeros((2, 4, 4, 3))

        with count_nfe() as c:
            fn = jax.jit(lambda p, xx, k: purify(score_fn, p, xx, k, cfg))
            fn(W, x, key).block_until_ready()
            assert c.counts["sde_euler"] == 4  # t*=4 Euler steps

            # 3 more executions of the same compiled program
            for i in range(3):
                fn(W, x, jax.random.fold_in(key, i)).block_until_ready()
            assert c.counts["sde_euler"] == 16

    def test_counts_inside_jitted_eot_scan(self, key):
        """The case the reference's Python counter gets wrong: the purifier
        runs eot times inside ONE compiled program."""
        score_fn, W = tiny_score_fn()
        cfg = PurifyConfig(diffusion_type="sde", t=3,
                           score_type="score_sde", grad_mode="none")
        x = jnp.zeros((2, 4, 4, 3))
        EOT = 5

        with count_nfe() as c:
            @jax.jit
            def attack_step(p, xx, k):
                def body(acc, i):
                    out = purify(score_fn, p, xx, jax.random.fold_in(k, i),
                                 cfg)
                    return acc + out.sum(), None
                acc, _ = jax.lax.scan(body, 0.0, jnp.arange(EOT))
                return acc

            attack_step(W, x, key).block_until_ready()
            assert c.counts["sde_euler"] == EOT * 3

    def test_dpm_and_ode_phases(self, key):
        score_fn, W = tiny_score_fn()
        x = jnp.zeros((2, 4, 4, 3))
        with count_nfe() as c:
            cfg = PurifyConfig(diffusion_type="ode", t=4,
                               score_type="score_sde", grad_mode="none")
            jax.jit(lambda: purify(score_fn, W, x, key, cfg))()[0].block_until_ready()
            assert c.counts.get("ode_euler", 0) > 0

    def test_no_counter_no_callback(self, key):
        """Without an installed counter the solvers bake in no callback."""
        score_fn, W = tiny_score_fn()
        cfg = PurifyConfig(diffusion_type="sde", t=2,
                           score_type="score_sde", grad_mode="none")
        x = jnp.zeros((1, 4, 4, 3))
        jaxpr = jax.make_jaxpr(
            lambda: purify(score_fn, W, x, key, cfg))()
        assert "debug_callback" not in str(jaxpr)


class TestDefendedTick:
    def test_tick_counts_runtime_calls_under_jit(self, key):
        score_fn, W = tiny_score_fn()
        printed = []
        model = DefendedModel(
            score_model_fn=score_fn, score_params=W,
            classifier_fn=lambda p, x01: x01.reshape(x01.shape[0], -1)[:, :3],
            classifier_params=None,
            purify_cfg=PurifyConfig(diffusion_type="sde", t=2,
                                    score_type="score_sde",
                                    grad_mode="none"),
            log_every=1)
        x = jnp.full((2, 4, 4, 3), 0.5)

        @jax.jit
        def loop(k):
            def body(acc, i):
                logits = model(x, jax.random.fold_in(k, i))
                return acc + logits.sum(), None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
            return acc

        loop(key).block_until_ready()
        # 4 scan iterations -> 4 runtime ticks, not 1 trace-time tick
        assert model._counter == 4


class TestProgramOutputNFE:
    """NFE as a program output (nfe_tally): runtime counting must work on
    backends that reject host callbacks (VERDICT r2 weak #4/#8)."""

    def test_tally_accumulates_through_scan(self, key):
        from diffpure_tpu.utils.profiling import nfe_tally
        score_fn, W = tiny_score_fn()
        cfg = PurifyConfig(diffusion_type="sde", t=3,
                           score_type="score_sde", grad_mode="none")
        x = jnp.zeros((2, 4, 4, 3))
        EOT = 5

        @jax.jit
        def attack_step(p, xx, k):
            def body(nfe, i):
                with nfe_tally() as t:
                    out = purify(score_fn, p, xx, jax.random.fold_in(k, i),
                                 cfg)
                return nfe + t.total, out.sum()
            nfe, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(EOT))
            return nfe

        assert int(attack_step(W, x, key)) == EOT * 3

    def test_apgd_counts_without_callbacks(self, key, monkeypatch):
        """count_nfe() works through apgd_attack even when the backend
        refuses host callbacks (the axon case)."""
        import diffpure_tpu.utils.profiling as prof
        from diffpure_tpu.attacks.apgd import APGDConfig, apgd_attack

        monkeypatch.setattr(prof, "_HOST_CALLBACKS_OK", False)
        score_fn, W = tiny_score_fn()
        pcfg = PurifyConfig(diffusion_type="sde", t=3,
                            score_type="score_sde", grad_mode="checkpoint")
        x01 = jnp.full((2, 4, 4, 3), 0.5)
        y = jnp.array([0, 1], jnp.int32)

        def model_fn(xx, k):
            xpure = purify(score_fn, W, (xx - 0.5) * 2, k, pcfg)
            return xpure.reshape(xx.shape[0], -1)[:, :3]

        cfg = APGDConfig(n_iter=4, eot_iter=2, eps=0.03)
        with count_nfe() as c:
            apgd_attack(model_fn, x01, y, key, cfg)
        # (init + 4 iterations) x 2 EOT x 3 solver steps
        assert c.counts["sde_euler"] == 5 * 2 * 3

    def test_apgd_chunked_dispatch_counts(self, key, monkeypatch):
        import diffpure_tpu.utils.profiling as prof
        from diffpure_tpu.attacks.apgd import APGDConfig, apgd_attack

        monkeypatch.setattr(prof, "_HOST_CALLBACKS_OK", False)
        score_fn, W = tiny_score_fn()
        pcfg = PurifyConfig(diffusion_type="sde", t=2,
                            score_type="score_sde", grad_mode="checkpoint")
        x01 = jnp.full((2, 4, 4, 3), 0.5)
        y = jnp.array([0, 1], jnp.int32)

        def model_fn(xx, k):
            xpure = purify(score_fn, W, (xx - 0.5) * 2, k, pcfg)
            return xpure.reshape(xx.shape[0], -1)[:, :3]

        cfg = APGDConfig(n_iter=5, eot_iter=1, eps=0.03,
                         iters_per_dispatch=2)
        with count_nfe() as c:
            apgd_attack(model_fn, x01, y, key, cfg)
        assert c.counts["sde_euler"] == 6 * 2  # (init + 5 iters) x 2 steps

    def test_bpda_counts_without_callbacks(self, key, monkeypatch):
        import diffpure_tpu.utils.profiling as prof
        from diffpure_tpu.attacks.bpda_eot import BPDAEOTConfig, \
            bpda_eot_attack

        monkeypatch.setattr(prof, "_HOST_CALLBACKS_OK", False)
        score_fn, W = tiny_score_fn()
        pcfg = PurifyConfig(diffusion_type="sde", t=2,
                            score_type="score_sde", grad_mode="none")

        def purify_fn(x01, k):
            return (purify(score_fn, W, (x01 - 0.5) * 2, k, pcfg) + 1) * 0.5

        def classify_fn(x01):
            return x01.reshape(x01.shape[0], -1)[:, :3]

        x01 = jnp.full((2, 4, 4, 3), 0.5)
        y = jnp.array([0, 1], jnp.int32)
        cfg = BPDAEOTConfig(adv_steps=2, eot_defense_reps=2,
                            eot_attack_reps=2, defense_batch=2)
        with count_nfe() as c:
            bpda_eot_attack(purify_fn, classify_fn, x01, y, key, cfg)
        # every purify execution contributes 2 solver steps; exact layout:
        # 1 defense_predict (1 chunk) + (adv_steps+1) attack_step calls
        # + any flip re-verifications -- count must be a positive multiple
        # of 2 and at least (1 + 3) * 2
        assert c.counts["sde_euler"] >= 8
        assert c.counts["sde_euler"] % 2 == 0
