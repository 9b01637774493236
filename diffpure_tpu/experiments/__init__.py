"""In-env validation experiments (trained-weights defense demonstration)."""
from diffpure_tpu.experiments.defense_demo import (  # noqa: F401
    DemoConfig, demo_spec, train_demo_classifier, train_demo_score,
    build_demo_defended, run_demo_protocol, run_dose_response,
)
