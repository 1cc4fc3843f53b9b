"""A/B the Pallas mesh intersector vs the jnp gather-fold on the TPU.

Times raw mesh queries (closest + shadow over the 141k-triangle
bounding_boxes soup) and a real render chunk, for FRT_MESH_PALLAS=0 vs
auto. Run AFTER any full bench to avoid contending for the tunnel.

Usage: python tools/bench_mesh_pallas.py [--render]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu import load_scene
from fast_ray_tracer_tpu.ops import intersect, mesh_pallas
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.utils import enable_compile_cache

enable_compile_cache()


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    scene = load_scene(".baseline/golden/bbox_tiny.yml")
    ir = compile_scene(scene, dtype=jnp.float32)
    print(f"mesh: {ir.meta.n_triangles} tris, {ir.meta.n_clusters} clusters",
          flush=True)
    rng = np.random.default_rng(0)
    R = 16384
    # camera-ish rays: from a point above, toward the soup bbox
    lo = np.asarray(ir.cluster_min).min(0)
    hi = np.asarray(ir.cluster_max).max(0)
    o = np.broadcast_to((hi + (hi - lo) * 0.5), (R, 3)).astype(np.float32)
    tgt = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tri_rank = jnp.arange(ir.meta.n_triangles, dtype=jnp.int32)
    tri_shadow = jnp.ones(ir.meta.n_triangles, bool)

    results = {}
    for label, env in (("jnp", "0"), ("pallas", "auto")):
        os.environ["FRT_MESH_PALLAS"] = env
        cfn = jax.jit(lambda o_, d_: intersect.mesh_closest(ir, o_, d_))
        sfn = jax.jit(lambda o_, d_: intersect.mesh_shadow_reduce(
            ir, tri_rank, tri_shadow, o_, d_))
        tc, (t, idx) = timed(cfn, o, d)
        ts, (rk, st) = timed(sfn, o, d)
        nh = int(jnp.isfinite(t).sum())
        results[label] = (tc, ts, t, idx, rk, st)
        print(f"{label:7s} closest {tc*1e3:8.2f} ms ({R/tc/1e6:6.2f} Mq/s) "
              f"shadow {ts*1e3:8.2f} ms ({R/ts/1e6:6.2f} Mq/s) hits={nh}",
              flush=True)

    (_, _, t0_, i0, r0, s0) = results["jnp"]
    (_, _, t1, i1, r1, s1) = results["pallas"]
    hit = np.isfinite(np.asarray(t0_))
    dt = np.abs(np.asarray(t1)[hit] - np.asarray(t0_)[hit])
    print(f"parity: hits equal={int((np.isfinite(np.asarray(t1)) == hit).sum())}/{R} "
          f"max|dt|={dt.max() if hit.any() else 0:.3e} "
          f"rank equal={(np.asarray(r0) == np.asarray(r1)).mean():.4f}")

    if "--render" in sys.argv:
        from fast_ray_tracer_tpu.render.render import render_scene
        from fast_ray_tracer_tpu.scene.model import replace
        scene.camera = replace(scene.camera, width=600, height=240)
        for label, env in (("pallas", "auto"), ("jnp", "0")):
            os.environ["FRT_MESH_PALLAS"] = env
            t0 = time.perf_counter()
            c = render_scene(scene, dtype=jnp.float32, chunk_pixels=16384)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            c = render_scene(scene, dtype=jnp.float32, chunk_pixels=16384)
            warm = time.perf_counter() - t0
            px = 600 * 240
            print(f"render {label}: cold {cold:.1f}s warm {warm:.1f}s "
                  f"({px/warm:.0f} px/s warm)", flush=True)


if __name__ == "__main__":
    main()
