"""Cross-subsystem integration tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.diffusion import VPSDE
from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.models.ddpm_unet import DDPMUNet
from diffpure_tpu.classifiers.attribute import AttributeD, attribute_logits
from diffpure_tpu.eval import DefendedModel, robustness_eval
from diffpure_tpu.purify import PurifyConfig
from diffpure_tpu.training import get_optimizer, get_step_fn
from diffpure_tpu.models.ema import ExponentialMovingAverage


class TestScoreModelTraining:
    def test_ncsnpp_trains_end_to_end(self, key):
        """Few steps of continuous score matching on a small NCSN++:
        loss must descend (the score_sde training capability)."""
        model = NCSNpp(image_size=8, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(4,), num_scales=100)
        params = model.init(key, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)))
        sde = VPSDE()
        opt = get_optimizer(lr=2e-3, warmup=0)
        step_fn = get_step_fn(sde, train=True, optimizer=opt)
        state = dict(params=params, opt_state=opt.init(params),
                     step=jnp.zeros((), jnp.int32),
                     ema=ExponentialMovingAverage.create(params, 0.999))
        batch = jax.random.normal(key, (8, 8, 8, 3)) * 0.5

        apply_fn = jax.jit(lambda p, x, t: model.apply(p, x, t))
        losses = []
        for i in range(8):
            state, loss = step_fn(jax.random.fold_in(key, i), state, batch,
                                  apply_fn)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


class TestCelebAHQBPDAEndToEnd:
    def test_defended_bpda_pipeline(self, key, tmp_path):
        """The full CelebA-HQ combo at toy size: SDEdit-DDPM purifier +
        attribute-D classifier + BPDA+EOT driver (ref run_celebahq_bpda)."""
        size = 32
        model = DDPMUNet(resolution=size, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, attn_resolutions=(16,))
        score_params = model.init(key, jnp.zeros((1, size, size, 3)),
                                  jnp.zeros((1,), jnp.int32))

        clf = AttributeD(resolution=size)
        clf_params = clf.init(jax.random.fold_in(key, 1),
                              jnp.zeros((1, size, size, 3)))

        def classifier_fn(params, x01):
            x = (x01 - 0.5) / 0.5
            logit = clf.apply(params, x)
            return jnp.concatenate([logit, -logit], axis=1)

        defended = DefendedModel(
            score_model_fn=lambda p, x, t: model.apply(p, x, t),
            score_params=score_params,
            classifier_fn=classifier_fn,
            classifier_params=clf_params,
            purify_cfg=PurifyConfig(diffusion_type="celebahq-ddpm", t=4,
                                    grad_mode="none"),
            log_every=10 ** 9)

        x01 = jax.random.uniform(jax.random.fold_in(key, 2),
                                 (2, size, size, 3))
        y = jnp.array([0, 1], jnp.int32)
        res = robustness_eval(
            defended, x01, y, key, "bpda", log_dir=str(tmp_path),
            log=lambda *a: None,
            adv_eps=0.06, adv_eta=0.02, adv_steps=2,
            eot_defense_reps=4, eot_attack_reps=2, defense_batch=4)
        assert res["class_batch"].shape == (4, 2)
        assert 0.0 <= res["robust_acc"] <= 1.0
        assert (tmp_path / "x_adv_bpda.npy").exists()
