from tod_tpu.serve.server import PathServer, PathStore  # noqa: F401
from tod_tpu.serve.client import PathClient  # noqa: F401
