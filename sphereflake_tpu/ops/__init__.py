from sphereflake_tpu.ops import transforms  # noqa: F401
