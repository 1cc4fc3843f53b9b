from fast_ray_tracer_tpu.io.ppm import (  # noqa: F401
    construct_ppm,
    write_ppm,
    write_png,
    read_ppm,
    read_png,
)
