"""Pinned repro for the lax.map-wrapped-mesh-fold TPU worker fault.

Round-3/4 observation (the reason ops/intersect.py serializes with a
budget that normal chunks never exceed): a clustered-mesh gather fold
whose vmapped blocks sit under `jax.lax.map` runs fine ONCE, then kills
the remote TPU worker on its SECOND execution ("worker crashed / kernel
fault") — same runtime-bug family as the round-3 vmapped while_loop
early-exit fault.  The workaround is to keep ray batches under the
memory budget so the fold never enters lax.map on TPU
(render.py chunk caps, photon.py batch ladder).

Run this on a TPU runtime update to check whether the workaround is
still needed:

    python tools/repro_laxmap_fault.py            # expect: FAULT (today)
    FRT_MESH_FOLD_BUDGET=2e9 python tools/repro_laxmap_fault.py
                                                  # forces a tiny group
                                                  # -> deeper lax.map

If it prints "OK: second execution survived", the runtime is fixed and
the budgets in intersect.py/render.py/photon.py can be relaxed.

DO NOT run from tests or while another process is using the TPU — a
faulted worker takes the whole tunnel down until it restarts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the serialized lax.map path regardless of chip memory
os.environ.setdefault("FRT_MESH_FOLD_BUDGET", "1e8")
# keep the Pallas kernel out of the way: this repro targets the jnp fold
os.environ.setdefault("FRT_MESH_PALLAS", "0")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fast_ray_tracer_tpu.ops.intersect import mesh_closest
    from fast_ray_tracer_tpu.scene.compile import compile_scene
    from fast_ray_tracer_tpu.scene.model import (
        CameraDesc, ConfigDesc, SceneDesc, ShapeDesc,
    )

    # synthetic triangle soup big enough to cluster (compile.py:618)
    rng = np.random.default_rng(0)
    n_tri = 8192
    centers = rng.uniform(-5, 5, (n_tri, 3))
    tris = centers[:, None, :] + rng.uniform(-0.2, 0.2, (n_tri, 3, 3))
    shapes = [ShapeDesc(kind="triangle", p1=tuple(t[0]), p2=tuple(t[1]),
                        p3=tuple(t[2])) for t in tris]
    scene = SceneDesc(camera=CameraDesc(width=8, height=8),
                      lights=[],
                      world=[ShapeDesc(kind="group", children=shapes)],
                      config=ConfigDesc())
    ir = compile_scene(scene, dtype=jnp.float32)
    assert ir.meta.use_clusters, "repro needs the clustered fold"

    R = 65536           # big enough that the tiny budget forces lax.map
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    f = jax.jit(lambda o_, d_: mesh_closest(ir, o_, d_))
    print("execution 1 ...", flush=True)
    t, idx = f(o, d)
    jax.block_until_ready(t)
    print("execution 1 ok; execution 2 ...", flush=True)
    t, idx = f(o, d)
    jax.block_until_ready(t)      # historically: worker crash here
    print("OK: second execution survived — the lax.map workaround can "
          "be re-evaluated (relax FRT_MESH_FOLD_BUDGET defaults).",
          flush=True)


if __name__ == "__main__":
    main()
