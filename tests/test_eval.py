"""End-to-end defended-model tests on small models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.eval import DefendedModel, get_accuracy, robustness_eval
from diffpure_tpu.purify import PurifyConfig
from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.classifiers.wideresnet import WideResNet


@pytest.fixture(scope="module")
def small_defended():
    model = NCSNpp(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(8,), num_scales=1000)
    x0 = jnp.zeros((1, 16, 16, 3))
    score_params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))

    clf = WideResNet(depth=10, widen_factor=1, normalize_input=False)
    clf_params = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

    defended = DefendedModel(
        score_model_fn=lambda p, x, t: model.apply(p, x, t),
        score_params=score_params,
        classifier_fn=lambda p, x01: clf.apply(p, x01),
        classifier_params=clf_params,
        purify_cfg=PurifyConfig(diffusion_type="sde", t=5,
                                score_type="score_sde"),
        log_every=10 ** 9,
    )
    return defended


class TestDefendedModel:
    def test_forward_shapes(self, small_defended, key):
        x01 = jax.random.uniform(key, (2, 16, 16, 3))
        logits = small_defended(x01, jax.random.fold_in(key, 1))
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_purify_range(self, small_defended, key):
        x01 = jax.random.uniform(key, (2, 16, 16, 3))
        p = small_defended.purify(x01, jax.random.fold_in(key, 1))
        assert p.shape == x01.shape
        # output should be roughly in image range (stochastic, not clipped)
        assert np.abs(np.asarray(p)).max() < 5.0

    def test_gradients_through_pipeline(self, small_defended, key):
        x01 = jax.random.uniform(key, (1, 16, 16, 3))

        def loss(x):
            return jnp.sum(small_defended(x, jax.random.fold_in(key, 1)) ** 2)

        g = jax.grad(loss)(x01)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_stochastic_across_keys(self, small_defended, key):
        x01 = jax.random.uniform(key, (1, 16, 16, 3))
        p1 = small_defended.purify(x01, jax.random.fold_in(key, 1))
        p2 = small_defended.purify(x01, jax.random.fold_in(key, 2))
        assert not np.allclose(np.asarray(p1), np.asarray(p2))

    def test_get_accuracy(self, small_defended, key):
        x01 = jax.random.uniform(key, (6, 16, 16, 3))
        y = jnp.zeros((6,), jnp.int32)
        acc = get_accuracy(small_defended, x01, y, key, bs=3)
        assert 0.0 <= acc <= 1.0


class TestDrivers:
    def test_robustness_eval_custom_apgd(self, small_defended, key, tmp_path):
        x01 = jax.random.uniform(key, (2, 16, 16, 3))
        logits = small_defended.classify(x01)
        y = jnp.argmax(logits, -1)
        logs = []
        res = robustness_eval(
            small_defended, x01, y, key, "custom",
            log_dir=str(tmp_path), log=logs.append,
            attacks_to_run=("apgd-ce",), eps=0.03, n_iter=3)
        assert "classifier_robust_acc" in res
        assert "defended_robust_acc" in res
        assert (tmp_path / "x_adv_defended_custom.npy").exists()

    def test_robustness_eval_bpda(self, small_defended, key, tmp_path):
        x01 = jax.random.uniform(key, (2, 16, 16, 3))
        y = jnp.zeros((2,), jnp.int32)
        res = robustness_eval(
            small_defended, x01, y, key, "bpda",
            log_dir=str(tmp_path), log=lambda *a: None,
            adv_steps=2, eot_defense_reps=4, eot_attack_reps=2,
            defense_batch=4)
        assert res["class_batch"].shape == (4, 2)
