"""Profiling, debug guards, ckpt cache, undefended model."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.utils.profiling import NFECounter, PhaseTimer
from diffpure_tpu.utils.debug import nan_guard, checkified, assert_finite
from diffpure_tpu.eval.defended import UndefendedModel


class TestProfiling:
    def test_nfe_counter(self):
        c = NFECounter()
        c.add("purify", 100)
        c.add("purify", 100)
        c.add("attack_grad", 50)
        assert c.total() == 250
        assert "purify=200" in c.report()

    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()


class TestDebug:
    def test_checkify_catches_nan(self):
        def f(x):
            return assert_finite(jnp.log(x), "logx")

        checked = checkified(f)
        err, out = checked(jnp.array([1.0, 2.0]))
        err.throw()  # no error
        err, out = checked(jnp.array([-1.0]))
        with pytest.raises(Exception):
            err.throw()

    def test_nan_guard_context(self):
        with nan_guard(True):
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans


class TestCkptCache:
    def test_cached_translate_roundtrip(self, tmp_path, monkeypatch):
        from diffpure_tpu.models.convert import cached_translate
        src = tmp_path / "weights.bin"
        src.write_bytes(b"fake")
        calls = []

        def translate_fn(path):
            calls.append(path)
            return {"params": {"w": np.ones((2, 2), np.float32)}}

        monkeypatch.chdir(tmp_path)
        p1 = cached_translate(str(src), translate_fn)
        p2 = cached_translate(str(src), translate_fn)
        assert len(calls) == 1  # second load hit the cache
        np.testing.assert_allclose(np.asarray(p2["params"]["w"]), 1.0)


class TestUndefendedModel:
    def test_purify_is_identity(self, key):
        m = UndefendedModel(
            classifier_fn=lambda p, x: x.reshape(x.shape[0], -1) @ p,
            classifier_params=jnp.ones((12, 2)))
        x = jax.random.uniform(key, (2, 2, 2, 3))
        np.testing.assert_allclose(np.asarray(m.purify(x, key)),
                                   np.asarray(x))
        assert m(x, key).shape == (2, 2)


class TestFlopsEstimate:
    def test_matmul_flops(self):
        from diffpure_tpu.utils.profiling import flops_estimate
        import jax.numpy as jnp
        a = jnp.ones((64, 128))
        b = jnp.ones((128, 256))
        f = flops_estimate(lambda x, y: x @ y, a, b)
        if f is not None:  # backend-dependent
            assert abs(f - 2 * 64 * 128 * 256) / (2 * 64 * 128 * 256) < 0.5

    def test_attention_flops_formula(self):
        from diffpure_tpu.utils.profiling import attention_flops
        assert attention_flops(2, 4096, 512) == 2 * 2 * 4096 ** 2 * 512
