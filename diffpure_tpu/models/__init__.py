from diffpure_tpu.models.registry import register_model, create_model, get_model_cls
from diffpure_tpu.models import ncsnpp  # noqa: F401 (registers 'ncsnpp')
from diffpure_tpu.models import adm_unet  # noqa: F401 (registers 'adm')
from diffpure_tpu.models import ddpm_unet  # noqa: F401 (registers 'ddpm_sdedit')

__all__ = ["register_model", "create_model", "get_model_cls"]
