from fast_ray_tracer_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer, enable_compile_cache, rays_per_second, trace_context,
)
