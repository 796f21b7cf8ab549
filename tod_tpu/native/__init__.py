from tod_tpu.native import loader  # noqa: F401
