from diffpure_tpu.training.losses import (
    get_optimizer,
    optimization_manager,
    get_sde_loss_fn,
    get_smld_loss_fn,
    get_ddpm_loss_fn,
    get_step_fn,
)

__all__ = ["get_optimizer", "optimization_manager", "get_sde_loss_fn",
           "get_smld_loss_fn", "get_ddpm_loss_fn", "get_step_fn"]
