from diffpure_tpu.eval.defended import DefendedModel
from diffpure_tpu.eval.accuracy import get_accuracy
from diffpure_tpu.eval.drivers import (
    eval_autoattack, eval_stadv, eval_bpda, robustness_eval,
)

__all__ = ["DefendedModel", "get_accuracy", "eval_autoattack", "eval_stadv",
           "eval_bpda", "robustness_eval"]
