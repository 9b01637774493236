"""diffpure_tpu: TPU-native adversarial purification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of NVlabs/DiffPure
(ICML 2022): diffusion-based purification (reverse VP-SDE, probability-flow
ODE, Langevin SDE, discrete DDPM) in front of pretrained classifiers,
evaluated under adaptive attacks (AutoAttack Linf/L2 Standard+Rand with EOT,
BPDA+EOT, StAdv).

Layout (bottom-up):
  ops/         Pallas kernels + XLA primitives (upfirdn2d, fused_bias_act,
               attention, groupnorm) with jnp reference implementations.
  models/      NCSN++ / ADM / DDPM UNets (flax, NHWC) + torch ckpt translator.
  diffusion/   VP/subVP/VE SDE closed forms; discrete Gaussian diffusion +
               respacing; score-function adapters.
  solvers/     lax.scan Euler-Maruyama / Euler ODE integrators + custom-VJP
               adjoint (replaces torchsde.sdeint_adjoint).
  purify/      the five purification runners behind one purify() API.
  classifiers/ WideResNet / ResNet / attribute-net classifier zoo.
  attacks/     APGD-CE/T/DLR (+EOT), FAB-T, Square, BPDA+EOT PGD, StAdv.
  eval/        robustness-evaluation drivers (defended model, accuracy).
  parallel/    (data, eot) mesh construction and sharding helpers.
  data/        dataset loading (CIFAR-10 / ImageNet / CelebA-HQ subsets).
"""

__version__ = "0.1.0"
