"""Multi-host distribution entry points.

The reference's only parallelism is a single-node pthread pool over
per-thread world replicas (src/renderer/renderer.c:243-281,
src/libs/thpool/thpool.c) — it cannot scale past one process. The
TPU-native equivalent (SURVEY.md §5): `jax.distributed.initialize()` per
host makes every host's chips visible in ONE global mesh; the scene IR is
replicated, pixels shard over the global 'batch' axis, and collectives
ride ICI within a slice / DCN across slices. Each host feeds only its
addressable shard of the pixel batch and receives its addressable shard
of the canvas — there is no coordinator bottleneck.

Typical multi-host driver (one per process):

    from fast_ray_tracer_tpu.parallel import distributed as dist
    dist.init()                       # TPU pods: args auto-discovered
    mesh = dist.global_mesh()
    canvas = render_scene(scene, mesh=mesh, ...)
    dist.shutdown()

On non-TPU clusters pass coordinator_address/num_processes/process_id
explicitly (jax.distributed's standard contract).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from fast_ray_tracer_tpu.parallel.mesh import BATCH_AXIS


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None,
         local_device_ids=None) -> None:
    """jax.distributed.initialize wrapper. On TPU pods all arguments are
    discovered from the environment; elsewhere pass them explicitly
    (coordinator 'host:port', the process count, and this process' id)."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def shutdown() -> None:
    jax.distributed.shutdown()


def global_mesh() -> Mesh:
    """1-D mesh over ALL processes' devices on the 'batch' axis.

    jax.devices() is the global list after jax.distributed.initialize;
    its default order groups each process' devices contiguously, so a
    'batch'-sharded array's addressable shards line up with the feeding
    host — per-host pixel slices need no permutation."""
    return Mesh(np.asarray(jax.devices()), (BATCH_AXIS,))


def process_shard(n: int):
    """This process' [lo, hi) slice of a length-n batch axis that is
    evenly sharded over the global mesh (host-side data feeding)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    per = -(-n // nproc)
    return pid * per, min(n, (pid + 1) * per)
