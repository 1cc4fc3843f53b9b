from fast_ray_tracer_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer, device_memory_limit, enable_compile_cache, memory_budget,
    rays_per_second, trace_context,
)
