from sphereflake_tpu.parallel.mesh import make_mesh  # noqa: F401
from sphereflake_tpu.parallel.sharded import (  # noqa: F401
    fit_step_sharded,
    make_frame_mesh,
    render_frame_sharded,
    render_frames_dp,
    render_gbuffer_sharded,
)
