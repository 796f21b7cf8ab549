from tod_tpu.train.matcher import match_anchors  # noqa: F401
from tod_tpu.train.losses import yolact_loss  # noqa: F401
from tod_tpu.train.synthetic_data import SyntheticDetectionData  # noqa: F401
from tod_tpu.train.dataset import DiskDetectionData, export_dataset  # noqa: F401
from tod_tpu.train.augment import Augmented, device_augment  # noqa: F401
from tod_tpu.train.domainrand import DomainRandomizedData  # noqa: F401
from tod_tpu.train.pool import ScenePool  # noqa: F401
from tod_tpu.train.trainer import TrainState, Trainer, make_train_step  # noqa: F401
