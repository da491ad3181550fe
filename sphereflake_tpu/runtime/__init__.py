from sphereflake_tpu.runtime.progressive import (  # noqa: F401
    ProgressiveState,
    progressive_init,
    progressive_step,
)
