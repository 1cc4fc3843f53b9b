"""Per-phase device-time breakdown of the flagship render on the real
TPU (the per-op profiler is unavailable through the remote-device
tunnel, so the bound is located by timing nested sub-programs of the
headline workload: intersection only -> +prepare -> +direct light ->
full bucketed trace; each extra phase's marginal time is its share).

Usage: python tools/profile_phases.py [reps]
Writes a table to stdout; bench.py's utilization entry carries the
aggregate FLOP/s / logical-bytes numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.utils import enable_compile_cache

enable_compile_cache()


def timed(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(reps=8):
    from fast_ray_tracer_tpu.render.camera import build_camera, rays_for_pixels
    from fast_ray_tracer_tpu.render.integrator import (
        build_statics, prepare_computations, shade_direct, spawn_counts,
        trace_bucketed,
    )
    from fast_ray_tracer_tpu.ops.intersect import intersect_candidates
    from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
    from fast_ray_tracer_tpu.scene.compile import compile_scene
    from fast_ray_tracer_tpu.scene.demo import glass_spheres

    W, H = 800, 400
    dtype = jnp.float32
    scene = glass_spheres(W, H)
    ir = compile_scene(scene, dtype=dtype)
    cam_rt = build_camera(scene.camera, dtype=dtype)
    rt = build_statics(ir, scene.config)
    depth = scene.config.di_path_length

    n = W * H
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype), (n, 2))
    ap = jnp.zeros((n, 2), dtype)

    @jax.jit
    def rays(px, py, uv, ap):
        return rays_for_pixels(cam_rt, px, py, uv, ap)

    o, d = jax.block_until_ready(rays(px, py, uv, ap))

    @jax.jit
    def f_intersect(ir_in, o, d):
        return intersect_candidates(ir_in, o, d)

    @jax.jit
    def f_prepare(ir_in, o, d):
        c = prepare_computations(ir_in, rt, o, d)
        return c.p, c.normalv, c.n1, c.over_Kd

    @jax.jit
    def f_direct(ir_in, o, d):
        c = prepare_computations(ir_in, rt, o, d)
        return shade_direct(ir_in, rt, c, None)

    counts = [int(x) for x in jax.jit(
        lambda i, o, d: spawn_counts(i, rt, o, d, depth, None))(ir, o, d)]
    buckets = [max(256, int(np.ceil(c * 1.1 / 4096)) * 4096) for c in counts]

    @jax.jit
    def f_full(ir_in, o, d):
        tr, ovf = trace_bucketed(ir_in, rt, o, d, depth, None, buckets)
        return tr.a + tr.d + tr.s, ovf

    rows = []
    t_int = timed(f_intersect, (ir, o, d), reps)
    t_prep = timed(f_prepare, (ir, o, d), reps)
    t_dir = timed(f_direct, (ir, o, d), reps)
    t_full = timed(f_full, (ir, o, d), reps)
    lanes = n + sum(buckets)
    rows.append(("level0 intersect_candidates (R x 24 slots)", t_int))
    rows.append(("level0 prepare_computations (marginal)", t_prep - t_int))
    rows.append(("level0 + direct light/shadows (marginal)", t_dir - t_prep))
    rows.append((f"full d5 bucketed trace ({lanes} lanes, 6 levels)",
                 t_full))
    rows.append(("  -> per-lane-level vs level0-only estimate",
                 t_full - t_dir * lanes / n))

    print(f"device: {jax.devices()[0].device_kind}  R={n} rays  "
          f"buckets={buckets}")
    for name, t in rows:
        print(f"{name:55s} {t * 1e3:9.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
