from diffpure_tpu.utils.logging import Logger, setup_run_logging
from diffpure_tpu.utils.prng import key_for, seed_everything

__all__ = ["Logger", "setup_run_logging", "key_for", "seed_everything"]
