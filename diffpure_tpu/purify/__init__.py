from diffpure_tpu.purify.config import PurifyConfig
from diffpure_tpu.purify.runners import (
    purify,
    purify_sde,
    purify_ode,
    purify_ldsde,
    purify_dpm,
    purify_guided_ddpm,
    purify_celebahq_ddpm,
)

__all__ = [
    "PurifyConfig", "purify", "purify_sde", "purify_ode", "purify_ldsde", "purify_dpm",
    "purify_guided_ddpm", "purify_celebahq_ddpm",
]
