from sphereflake_tpu.parallel.mesh import make_mesh  # noqa: F401
from sphereflake_tpu.parallel.sharded import (  # noqa: F401
    fit_step_sharded,
    render_frame_sharded,
    render_gbuffer_sharded,
)
