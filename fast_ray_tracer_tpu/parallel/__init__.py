from fast_ray_tracer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicate_scene, shard_pixel_batch,
)
from fast_ray_tracer_tpu.parallel.train import (  # noqa: F401
    make_train_step, merge_params, split_params,
)
