from sphereflake_tpu.utils.image import write_png  # noqa: F401
