from diffpure_tpu.attacks.losses import (
    ce_loss, dlr_loss, dlr_loss_targeted, margin_loss, cw_f6_loss,
)
from diffpure_tpu.attacks.apgd import apgd_attack, APGDConfig
from diffpure_tpu.attacks.square import square_attack, SquareConfig
from diffpure_tpu.attacks.fab import fab_attack, FABConfig
from diffpure_tpu.attacks.pgd import pgd_attack, PGDConfig
from diffpure_tpu.attacks.bpda_eot import bpda_eot_attack, BPDAEOTConfig
from diffpure_tpu.attacks.stadv import stadv_attack, StAdvConfig
from diffpure_tpu.attacks.autoattack import AutoAttack, AutoAttackConfig

__all__ = [
    "ce_loss", "dlr_loss", "dlr_loss_targeted", "margin_loss", "cw_f6_loss",
    "apgd_attack", "APGDConfig", "square_attack", "SquareConfig",
    "fab_attack", "FABConfig", "pgd_attack", "PGDConfig",
    "bpda_eot_attack", "BPDAEOTConfig", "stadv_attack", "StAdvConfig",
    "AutoAttack", "AutoAttackConfig",
]
