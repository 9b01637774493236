"""Eval resume and precision-policy tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpure_tpu.eval.resume import EvalCheckpoint, resumable_autoattack
from diffpure_tpu.training.precision import (
    Policy, bf16_policy, DynamicLossScaler, grads_finite,
)
from diffpure_tpu.attacks import AutoAttack, AutoAttackConfig
from tests.test_attacks import make_linear_model


class TestEvalResume:
    def test_checkpoint_roundtrip(self, tmp_path):
        ckpt = EvalCheckpoint(str(tmp_path))
        assert not ckpt.has_phase("apgd-ce")
        x = np.random.rand(4, 2, 2, 3).astype(np.float32)
        r = np.array([True, False, True, True])
        ckpt.save_phase("apgd-ce", x, r)
        ckpt2 = EvalCheckpoint(str(tmp_path))
        assert ckpt2.has_phase("apgd-ce")
        x2, r2 = ckpt2.load_phase("apgd-ce")
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(r2, r)

    def test_resumable_autoattack_skips_completed(self, tmp_path, rng, key):
        W = np.stack([rng.randn(16), -rng.randn(16)], 1).astype(np.float32)
        model_fn = make_linear_model(W * 0.1)
        x = jnp.asarray(rng.rand(4, 4, 4, 1).astype(np.float32))
        y = jnp.argmax(model_fn(x, None), -1)
        cfg = AutoAttackConfig(version="custom", attacks_to_run=("apgd-ce",),
                               eps=0.3, n_iter=5)
        calls = []
        aa = AutoAttack(model_fn, cfg, log_fn=calls.append)
        x1, r1 = resumable_autoattack(aa, x, y, key, str(tmp_path))
        # second run resumes, does not re-attack
        aa2 = AutoAttack(model_fn, cfg, log_fn=calls.append)
        x2, r2 = resumable_autoattack(aa2, x, y, key, str(tmp_path))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        assert any("resumed" in c for c in calls)


class TestPrecision:
    def test_policy_casts(self):
        p = bf16_policy()
        tree = {"w": jnp.ones((2, 2), jnp.float32)}
        c = p.cast_to_compute(tree)
        assert c["w"].dtype == jnp.bfloat16
        back = p.cast_to_param(c)
        assert back["w"].dtype == jnp.float32

    def test_loss_scaler(self):
        s = DynamicLossScaler.create(initial_log_scale=10.0)
        loss = jnp.array(2.0)
        scaled = s.scale_loss(loss)
        np.testing.assert_allclose(float(scaled), 2.0 * 2 ** 10)
        grads = {"w": jnp.ones(3) * 2 ** 10}
        un = s.unscale_grads(grads)
        np.testing.assert_allclose(np.asarray(un["w"]), 1.0)
        s2 = s.update(jnp.array(False))
        assert float(s2.log_scale) < float(s.log_scale)
        s3 = s.update(jnp.array(True))
        assert float(s3.log_scale) > float(s.log_scale)

    def test_grads_finite(self):
        assert bool(grads_finite({"a": jnp.ones(3)}))
        assert not bool(grads_finite({"a": jnp.array([1.0, jnp.nan])}))
