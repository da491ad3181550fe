from sphereflake_tpu.models.sphereflake import child_templates, root_frame  # noqa: F401
