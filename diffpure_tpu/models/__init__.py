from diffpure_tpu.models.registry import register_model, create_model, get_model_cls
from diffpure_tpu.models import ncsnpp  # noqa: F401 (registers 'ncsnpp')
from diffpure_tpu.models import adm_unet  # noqa: F401 (registers 'adm')
from diffpure_tpu.models import ddpm_unet  # noqa: F401 (registers 'ddpm_sdedit')
from diffpure_tpu.models import ddpm_v1  # noqa: F401 (registers 'ddpm')
from diffpure_tpu.models import ncsnv2  # noqa: F401 (registers ncsnv2_* / ncsn)

__all__ = ["register_model", "create_model", "get_model_cls"]
