from pita_tpu.configs.registry import (
    ExperimentConfig,
    EXPERIMENTS,
    DEBUG_OVERLAYS,
    build_trainer,
    compose,
    parse_overrides,
)
