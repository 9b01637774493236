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
