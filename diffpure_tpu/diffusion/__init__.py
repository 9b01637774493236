from diffpure_tpu.diffusion.sde import SDE, VPSDE, SubVPSDE, VESDE, ReverseSDE
from diffpure_tpu.diffusion.schedules import (
    get_named_beta_schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    space_timesteps,
)
from diffpure_tpu.diffusion.discrete import (
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    SpacedDiffusion,
)
from diffpure_tpu.diffusion.score import (
    get_score_fn,
    eps_to_score_continuous_vp,
    make_guided_score_fn,
)

__all__ = [
    "SDE", "VPSDE", "SubVPSDE", "VESDE", "ReverseSDE",
    "get_named_beta_schedule", "linear_beta_schedule", "cosine_beta_schedule",
    "space_timesteps",
    "GaussianDiffusion", "ModelMeanType", "ModelVarType", "SpacedDiffusion",
    "get_score_fn", "eps_to_score_continuous_vp", "make_guided_score_fn",
]
