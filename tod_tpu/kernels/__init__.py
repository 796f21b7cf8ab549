from tod_tpu.kernels.mask_assembly import assemble_crop_masks  # noqa: F401
