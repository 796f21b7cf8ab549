from tod_tpu.models.mobilenetv2 import MobileNetV2  # noqa: F401
from tod_tpu.models.resnet import ResNet  # noqa: F401
from tod_tpu.models.fpn import FPN  # noqa: F401
from tod_tpu.models.protonet import ProtoNet  # noqa: F401
from tod_tpu.models.heads import PredictionHead, SemanticHead  # noqa: F401
from tod_tpu.models.yolact import Yolact, YolactOutputs, create_model  # noqa: F401
