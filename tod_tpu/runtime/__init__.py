from tod_tpu.runtime.frame_source import (  # noqa: F401
    FrameSource,
    PacedSource,
    PNGSource,
    RingSource,
    SyntheticSource,
    TraceSource,
    write_trace,
)
from tod_tpu.runtime.profiler import FPSMeter, StageTimer  # noqa: F401
from tod_tpu.runtime.engine import Engine  # noqa: F401
from tod_tpu.runtime.multistream import MultiStreamEngine  # noqa: F401
