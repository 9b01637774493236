"""CLI entry point: the eval_sde_adv / eval_sde_adv_bpda equivalent.

Builds the defended model from config + checkpoints, loads the evaluation
subset, and runs the requested attack protocol
(ref eval_sde_adv.py:211-323, eval_sde_adv_bpda.py:177-279).

Checkpoint paths follow the reference layout under ./pretrained/
(score_sde/checkpoint_8.pth, guided_diffusion/256x256_diffusion_uncond.pt,
celebahq/celeba_hq.ckpt, cifar10/..., celebahq/<attr>/net_best.pth).
--random_weights runs the full pipeline with random params (smoke tests /
benchmarking without the checkpoint files).
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.config import build_parser, load_config, make_log_dir
from diffpure_tpu.utils import seed_everything, setup_run_logging


def build_score_model(args, config):
    """Score model + params per domain (ref eval_sde_adv.py:40-55,
    runners/*: checkpoint loading)."""
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.models.factories import create_model_and_diffusion
    from diffpure_tpu.models.ddpm_unet import DDPMUNet
    from diffpure_tpu.models import convert as mcv
    from diffpure_tpu.config import namespace2dict

    import jax.numpy as _jnp
    torso_dtype = _jnp.bfloat16 if getattr(args, "precision",
                                           "fp32") == "bf16" else None

    domain = args.domain
    if "cifar10" in domain:
        # built FROM the yaml config like the reference's create_model
        # (custom nf/ch_mult/... configs work; cifar10.yml reproduces the
        # published 107M model)
        from diffpure_tpu.models.factories import ncsnpp_from_config
        model = ncsnpp_from_config(config, dtype=torso_dtype)
        ckpt = "pretrained/score_sde/checkpoint_8.pth"
        if args.random_weights or not os.path.exists(ckpt):
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
            if not args.random_weights:
                print(f"WARNING: {ckpt} missing; using random weights")
        else:
            params = mcv.load_score_sde_checkpoint(ckpt)
        return (lambda p, x, t: model.apply(p, x, t)), params, 32

    if "imagenet" in domain:
        model_cfg = namespace2dict(config.model)
        model, _ = create_model_and_diffusion(model_cfg)
        ckpt = "pretrained/guided_diffusion/256x256_diffusion_uncond.pt"
        if args.random_weights or not os.path.exists(ckpt):
            params = jax.eval_shape(lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1,), jnp.int32)))
            params = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), params)
            if not args.random_weights:
                print(f"WARNING: {ckpt} missing; using zero weights")
        else:
            params = mcv.load_guided_diffusion_checkpoint(ckpt)
        return (lambda p, x, t: model.apply(p, x, t)), params, 256

    if "celebahq" in domain:
        model = DDPMUNet(dtype=torso_dtype)
        ckpt = "pretrained/celebahq/celeba_hq.ckpt"
        if args.random_weights or not os.path.exists(ckpt):
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 256, 256, 3)),
                                jnp.zeros((1,), jnp.int32))
            if not args.random_weights:
                print(f"WARNING: {ckpt} missing; using random weights")
        else:
            params = mcv.load_sdedit_checkpoint(ckpt)
        return (lambda p, x, t: model.apply(p, x, t)), params, 256

    raise NotImplementedError(domain)


def build_classifier(args):
    """Classifier + params (ref utils.py:143-253)."""
    from diffpure_tpu.classifiers import get_classifier
    from diffpure_tpu.models.convert import load_torch_state_dict, \
        to_numpy_state_dict

    name = args.classifier_name
    model, translate, logits_fn = get_classifier(name)

    ckpt_map = {
        "cifar10-resnet-50": "pretrained/cifar10/resnet-50/weights.pt",
        "cifar10-wrn-70-16-dropout":
            "pretrained/cifar10/wrn-70-16-dropout/weights.pt",
        "cifar10-wideresnet-70-16":
            "pretrained/cifar10/wresnet-76-10/weights-best.pt",
    }
    if name.startswith("celebahq__"):
        attr = name.split("__")[-1]
        ckpt = f"pretrained/celebahq/{attr}/net_best.pth"
    else:
        ckpt = ckpt_map.get(name, f"pretrained/classifiers/{name}.pt")

    if args.random_weights or not os.path.exists(ckpt):
        size = 224 if name.startswith("imagenet") else (
            256 if name.startswith("celebahq") else 32)
        dummy = jnp.zeros((1, size, size, 3))
        if name.startswith("celebahq"):
            params = model.init(jax.random.PRNGKey(1), (dummy - 0.5) * 2)
        else:
            params = model.init(jax.random.PRNGKey(1), dummy)
        if not args.random_weights:
            print(f"WARNING: classifier ckpt {ckpt} missing; random weights")
    else:
        sd = load_torch_state_dict(ckpt)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        elif isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        params = translate(sd)
    return logits_fn, params


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--random_weights", action="store_true",
                        help="skip checkpoint loading (smoke test)")
    args = parser.parse_args(argv)
    config = load_config(args.config if os.path.exists(args.config)
                         else os.path.join("configs", args.config))

    log_dir = make_log_dir(args)
    args.log_dir = log_dir
    setup_run_logging(log_dir, args.verbose)
    key = seed_everything(args.seed)
    print(f"log dir: {log_dir}")

    from diffpure_tpu.data import load_data
    from diffpure_tpu.eval import DefendedModel, robustness_eval
    from diffpure_tpu.purify import PurifyConfig

    score_fn, score_params, purify_size = build_score_model(args, config)
    classifier_fn, clf_params = build_classifier(args)

    purify_cfg = PurifyConfig(
        diffusion_type=args.diffusion_type, t=args.t, rand_t=args.rand_t,
        t_delta=args.t_delta, sample_step=args.sample_step,
        score_type=args.score_type, step_size=args.step_size,
        sigma2=args.sigma2, lambda_ld=args.lambda_ld, eta=args.eta,
        n_steps=args.solver_steps,
        grad_mode=("none" if args.attack_version == "bpda"
                   else args.grad_mode))

    defended = DefendedModel(
        score_model_fn=score_fn, score_params=score_params,
        classifier_fn=classifier_fn, classifier_params=clf_params,
        purify_cfg=purify_cfg,
        resize_to=(256 if "imagenet" in args.domain else None))

    x_np, y_np = load_data(args.domain, args.num_sub, args.data_seed,
                           classifier_name=args.classifier_name,
                           adv_batch_size=args.adv_batch_size,
                           shard=jax.process_index(),
                           num_shards=jax.process_count())
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    print(f"x: {x.shape} [{float(x.min()):.3f}, {float(x.max()):.3f}]")

    # multi-chip: shard the batch over the (data, eot) mesh, replicate
    # params; XLA emits the collectives (replaces DataParallel,
    # ref eval_sde_adv.py:227-228)
    if jax.device_count() > 1 and x.shape[0] % jax.device_count() == 0:
        from diffpure_tpu.parallel import make_mesh, replicate, shard_batch
        mesh = make_mesh()
        x = shard_batch(x, mesh)
        defended.score_params = replicate(defended.score_params, mesh)
        defended.classifier_params = replicate(defended.classifier_params,
                                               mesh)
        print(f"sharded over mesh {dict(mesh.shape)}")

    attack_kwargs = {}
    if args.attack_version in ("standard", "rand", "custom"):
        attack_kwargs = dict(norm=args.lp_norm, eps=args.adv_eps,
                             eot_iter=(args.eot_iter
                                       if args.attack_version == "rand"
                                       else 1),
                             apgd_iters_per_dispatch=args.attack_dispatch_iters)
    elif args.attack_version == "stadv":
        attack_kwargs = dict(bound=args.adv_eps, n_iter=100,
                             eot_iter=args.eot_iter,
                             iters_per_dispatch=args.attack_dispatch_iters)
    elif args.attack_version == "bpda":
        attack_kwargs = dict(adv_eps=args.adv_eps, adv_eta=args.adv_eta,
                             adv_steps=args.adv_steps,
                             eot_defense_reps=args.eot_defense_reps,
                             eot_attack_reps=args.eot_attack_reps,
                             defense_batch=args.eot_defense_batch,
                             attack_batch=args.eot_attack_batch,
                             attack_norm=("l_inf" if args.lp_norm == "Linf"
                                          else "l_2"))

    # runtime NFE ledger: fed by host callbacks where supported, and by
    # the attacks' program-output counters everywhere (incl. backends that
    # reject callbacks — the axon case; utils/profiling.py nfe_tally)
    from diffpure_tpu.utils.profiling import count_nfe
    with count_nfe() as nfe:
        results = robustness_eval(defended, x, y, key, args.attack_version,
                                  log_dir=log_dir, **attack_kwargs)
    print(nfe.report())
    print(f"results: {results}")
    return results


if __name__ == "__main__":
    main()
