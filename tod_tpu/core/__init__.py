from tod_tpu.core.config import (  # noqa: F401
    CameraConfig,
    GeometryConfig,
    ModelConfig,
    PipelineConfig,
    PlannerConfig,
    ServerConfig,
    TrainConfig,
)
from tod_tpu.core.types import Detections, Frame, Path, Scene  # noqa: F401
from tod_tpu.core.registry import get_model, list_models, register_model  # noqa: F401
