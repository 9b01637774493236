"""Static configuration for the purification runners.

Mirrors the argparse surface of the reference eval drivers
(ref: eval_sde_adv.py:245-317) plus the runner-internal constants.
Frozen dataclass of Python scalars -> safe to close over under jit.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PurifyConfig:
    # runner selection (ref eval_sde_adv.py:44-55)
    diffusion_type: str = "sde"  # sde | ode | ldsde | ddpm | celebahq-ddpm

    # forward-diffusion depth: integer step count, continuous time = t/1000
    # (ref runners/diffpure_sde.py:228-231)
    t: int = 100
    rand_t: bool = False
    t_delta: int = 15
    sample_step: int = 1
    # fix_rand: one shared forward-noise tile across the batch
    # (ref runners/diffpure_ode.py:202-209; the reference's --fix_rand flag
    # is referenced but never registered — a latent bug fixed here)
    fix_rand: bool = False

    # score adapter (ref --score_type)
    score_type: str = "score_sde"  # score_sde | guided_diffusion
    learn_sigma: bool = True  # guided_diffusion 6-channel output

    # VP-SDE parameters (ref diffpure_sde.py:50-80)
    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 1000

    # solver steps: None -> t steps (torchsde default dt=1e-3 over span
    # t/1000, ref SURVEY.md §3.2); pass fewer for accelerated purification.
    n_steps: int | None = None

    # ODE runner (ref diffpure_ode.py:229-238); 'heun' is the fixed-step
    # higher-order stand-in for the reference's 'dopri5' option
    step_size: float = 1e-3
    ode_method: str = "euler"  # 'euler' | 'heun' 

    # LDSDE runner (ref diffpure_ldsde.py:50-130,195-199)
    sigma2: float = 1e-3
    lambda_ld: float = 1e-2
    eta: float = 5.0
    ldsde_dt: float = 1e-2
    ldsde_t: float = 1e-2  # score evaluated at pinned t (ref :94)

    # gradients through purification:
    #   'checkpoint' - exact backprop via rematerialized scan (default)
    #   'adjoint'    - O(1)-memory adjoint (torchsde-equivalent)
    #   'reversible' - reversible Heun (arXiv:2105.13493): exact O(1)-memory
    #                  gradients + 2nd-order drift (sde runner only)
    #   'none'       - stop_gradient (BPDA purifiers)
    grad_mode: str = "checkpoint"

    # numerical epsilon at the integration end (ref diffpure_sde.py:228)
    epsilon_dt1: float = 1e-5

    # NOTE on the reference's --use_bm flag (BrownianInterval,
    # ref diffpure_sde.py:235-238): our Brownian increments are ALWAYS
    # counter-based and reconstructible from (key, step) — the
    # BrownianInterval semantics are the default here, so the flag is a
    # no-op and intentionally absent.

    def solver_steps(self) -> int:
        return self.n_steps if self.n_steps is not None else self.t
