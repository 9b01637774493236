"""Factories, resamplers, kv logger, train loop."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.models.factories import (
    model_and_diffusion_defaults, channel_mult_for_image_size,
    create_model, create_gaussian_diffusion, create_model_and_diffusion,
)
from diffpure_tpu.training.resample import (
    UniformSampler, LossSecondMomentResampler, create_named_schedule_sampler,
)
from diffpure_tpu.utils import kvlogger


class TestFactories:
    def test_channel_mult_table(self):
        assert channel_mult_for_image_size(256) == (1, 1, 2, 2, 4, 4)
        assert channel_mult_for_image_size(64) == (1, 2, 3, 4)
        with pytest.raises(ValueError):
            channel_mult_for_image_size(48)

    def test_imagenet_yaml_config_produces_552m_model(self):
        """The configs/imagenet.yml model section through the factory."""
        cfg = dict(attention_resolutions="32,16,8", class_cond=False,
                   diffusion_steps=1000, rescale_timesteps=True,
                   timestep_respacing="1000", image_size=256,
                   learn_sigma=True, noise_schedule="linear",
                   num_channels=256, num_head_channels=64, num_res_blocks=2,
                   resblock_updown=True, use_fp16=True,
                   use_scale_shift_norm=True)
        model, diffusion = create_model_and_diffusion(cfg)
        assert model.out_channels == 6
        assert model.attention_resolutions == (8, 16, 32)
        assert model.channel_mult == (1, 1, 2, 2, 4, 4)
        assert model.dtype == jnp.bfloat16
        assert diffusion.num_timesteps == 1000
        assert diffusion.rescale_timesteps

    def test_respaced_diffusion(self):
        d = create_gaussian_diffusion(steps=1000, learn_sigma=True,
                                      timestep_respacing="ddim100")
        assert d.num_timesteps == 100

    def test_small_model_runs(self, key):
        model = create_model(image_size=64, num_channels=32,
                             num_res_blocks=1, attention_resolutions="16",
                             num_head_channels=16, learn_sigma=True)
        x = jnp.zeros((1, 64, 64, 3))
        t = jnp.array([10])
        params = model.init(key, x, t)
        assert model.apply(params, x, t).shape == (1, 64, 64, 6)


class TestResample:
    def test_uniform(self, key):
        s = UniformSampler(100)
        t, w = s.sample(key, 32)
        assert t.shape == (32,) and (np.asarray(t) < 100).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_named(self):
        assert isinstance(create_named_schedule_sampler("uniform", 10),
                          UniformSampler)
        assert isinstance(
            create_named_schedule_sampler("loss-second-moment", 10),
            LossSecondMomentResampler)

    def test_loss_second_moment_warmup(self, key):
        s = LossSecondMomentResampler.create(4, history_per_term=2)
        t, w = s.sample(key, 8)
        np.testing.assert_allclose(np.asarray(w), 1.0)  # uniform pre-warmup
        # fill history
        for i in range(4):
            ts = jnp.array([0, 1, 2, 3])
            losses = jnp.array([1.0, 2.0, 3.0, 4.0]) * (i + 1)
            s = s.update_with_losses(ts, losses)
        weights = np.asarray(s.weights())
        assert weights[3] > weights[0]  # high-loss timesteps upweighted
        t, w = s.sample(jax.random.fold_in(key, 1), 64)
        assert not np.allclose(np.asarray(w), 1.0)


class TestKVLogger:
    def test_logkv_mean_and_dump(self, capsys):
        lg = kvlogger.KVLogger()
        lg.logkv("a", 1.0)
        lg.logkv_mean("b", 1.0)
        lg.logkv_mean("b", 3.0)
        out = lg.dumpkvs()
        assert out["a"] == 1.0 and out["b"] == 2.0
        assert "a" in capsys.readouterr().out

    def test_json_csv_sinks(self, tmp_path):
        lg = kvlogger.KVLogger(output_formats=[
            kvlogger.make_output_format("json", str(tmp_path)),
            kvlogger.make_output_format("csv", str(tmp_path)),
        ])
        lg.logkv("x", 1.5)
        lg.dumpkvs()
        lg.logkv("x", 2.5)
        lg.logkv("y", 1.0)  # new key -> csv header rewrite
        lg.dumpkvs()
        with open(tmp_path / "progress.json") as f:
            rows = [json.loads(l) for l in f]
        assert rows[0]["x"] == 1.5
        with open(tmp_path / "progress.csv") as f:
            content = f.read()
        assert "x" in content and "y" in content

    def test_profile_kv(self):
        lg = kvlogger.KVLogger()
        with lg.profile_kv("work"):
            pass
        assert "wait_work" in lg.name2val

        @lg.profile("fn")
        def f():
            return 3

        assert f() == 3
        assert "wait_fn" in lg.name2val


class TestTrainLoop:
    def test_loss_descends_and_checkpoints(self, key, tmp_path):
        from diffpure_tpu.training.train_loop import TrainLoop
        from diffpure_tpu.diffusion.discrete import GaussianDiffusion
        from diffpure_tpu.diffusion.schedules import linear_beta_schedule
        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, t):
                h = nn.Conv(8, (3, 3), padding="SAME")(x)
                h = nn.swish(h)
                return nn.Conv(3, (3, 3), padding="SAME")(h)

        model = Tiny()
        params = model.init(key, jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32))
        diffusion = GaussianDiffusion.from_betas(
            linear_beta_schedule(20, 1e-4, 2e-2))
        rng = np.random.RandomState(0)

        def data_gen():
            while True:
                yield rng.randn(8, 8, 8, 3).astype(np.float32) * 0.1, {}

        loop = TrainLoop(
            apply_fn=lambda p, x, t: model.apply(p, x, t),
            diffusion=diffusion, data=data_gen(), params=params,
            batch_size=8, lr=1e-2, log_interval=100, save_interval=100,
            checkpoint_dir=str(tmp_path / "ckpt"))
        losses = [loop.run_step(jnp.asarray(next(data_gen())[0]))
                  for _ in range(12)]
        assert np.mean(losses[-4:]) < np.mean(losses[:4])

        loop.save()
        ckpts = os.listdir(tmp_path / "ckpt")
        assert len(ckpts) >= 1

        # resume
        loop2 = TrainLoop(
            apply_fn=lambda p, x, t: model.apply(p, x, t),
            diffusion=diffusion, data=data_gen(), params=params,
            batch_size=8, lr=1e-2,
            resume_checkpoint=str(tmp_path / "ckpt" / sorted(ckpts)[-1]),
            checkpoint_dir=str(tmp_path / "ckpt2"))
        assert loop2.step == loop.step
