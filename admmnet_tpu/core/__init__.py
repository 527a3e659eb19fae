from admmnet_tpu.core.config import (
    ADMMOptions,
    DataConfig,
    ModelConfig,
    PeakSearchConfig,
    ProblemSpec,
    TrainConfig,
)

__all__ = [
    "ADMMOptions",
    "DataConfig",
    "ModelConfig",
    "PeakSearchConfig",
    "ProblemSpec",
    "TrainConfig",
]
