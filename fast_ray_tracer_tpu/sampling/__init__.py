from fast_ray_tracer_tpu.sampling.cmj import (  # noqa: F401
    cmj_points_static,
    cmj_points,
)
