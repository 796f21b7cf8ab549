from tod_tpu.utils.image_io import load_image, save_gray_bmp, save_rgb  # noqa: F401
