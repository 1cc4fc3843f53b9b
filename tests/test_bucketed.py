"""Device-bucket wavefront compaction (integrator.trace_bucketed) must be
arithmetically identical to the exact unrolled trace — it is the TPU
production path (render.py picks it on non-CPU backends), so its parity is
load-bearing for every golden result rendered on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_ray_tracer_tpu.render.camera import build_camera, rays_for_pixels
from fast_ray_tracer_tpu.render.integrator import (
    build_statics, spawn_counts, trace, trace_bucketed,
)
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.demo import glass_spheres


def _rays(scene, n, dtype):
    cam_rt = build_camera(scene.camera, dtype=dtype)
    W, H = scene.camera.width, scene.camera.height
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))[:n]
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))[:n]
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype), (n, 2))
    ap = jnp.zeros((n, 2), dtype)
    return rays_for_pixels(cam_rt, px, py, uv, ap)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_bucketed_matches_exact(dtype):
    scene = glass_spheres(64, 32)
    ir = compile_scene(scene, dtype=dtype)
    rt = build_statics(ir, scene.config)
    depth = scene.config.di_path_length
    o, d = _rays(scene, 64 * 32, dtype)

    exact = trace(ir, rt, o, d, depth, None)
    counts = [int(c) for c in spawn_counts(ir, rt, o, d, depth, None)]
    buckets = [max(64, int(np.ceil(c * 1.25 / 64)) * 64) for c in counts]
    got, ovf = trace_bucketed(ir, rt, o, d, depth, None, buckets)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(exact.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(exact.d), np.asarray(got.d))
    np.testing.assert_array_equal(np.asarray(exact.s), np.asarray(got.s))


def test_bucketed_overflow_flag():
    scene = glass_spheres(32, 16)
    ir = compile_scene(scene, dtype=jnp.float32)
    rt = build_statics(ir, scene.config)
    depth = scene.config.di_path_length
    o, d = _rays(scene, 32 * 16, jnp.float32)
    counts = [int(c) for c in spawn_counts(ir, rt, o, d, depth, None)]
    assert counts[0] > 8  # scene spawns children at level 0
    # starve the first-level bucket: overflow must be reported
    buckets = [8] + [max(64, c) for c in counts[1:]]
    _, ovf = trace_bucketed(ir, rt, o, d, depth, None, buckets)
    assert bool(ovf)


def test_bucket_calibration_disk_cache(tmp_path, monkeypatch):
    """Calibrated bucket tuples persist keyed by scene content: same
    scene hits, any content change (geometry, config, resolution)
    misses, corrupt cache files are ignored."""
    import jax.numpy as jnp
    from fast_ray_tracer_tpu.render import render as R
    from fast_ray_tracer_tpu.scene.compile import compile_scene
    from fast_ray_tracer_tpu.scene.demo import glass_spheres
    from fast_ray_tracer_tpu.scene.model import replace

    monkeypatch.setenv("FRT_COMPILE_CACHE", str(tmp_path))
    sc = glass_spheres(16, 8)
    ir = compile_scene(sc, dtype=jnp.float32)
    k = R._bucket_cache_key(ir, sc.config, 16, 8, 128, jnp.float32, 5)
    assert R._bucket_cache_get(k) is None
    R._bucket_cache_put(k, (512, 256, 256))
    assert R._bucket_cache_get(k) == (512, 256, 256)
    # same inputs -> same key (deterministic)
    assert k == R._bucket_cache_key(ir, sc.config, 16, 8, 128,
                                    jnp.float32, 5)
    # any knob change -> different key
    assert k != R._bucket_cache_key(ir, sc.config, 32, 8, 128,
                                    jnp.float32, 5)
    assert k != R._bucket_cache_key(ir, sc.config, 16, 8, 128,
                                    jnp.float32, 4)
    sc2 = glass_spheres(16, 8)
    sc2.config = replace(sc2.config, photon_count=123)
    assert k != R._bucket_cache_key(ir, sc2.config, 16, 8, 128,
                                    jnp.float32, 5)
    # geometry change -> different key
    ir2 = compile_scene(glass_spheres(16, 8), dtype=jnp.float32)
    ir2.inv_tf = ir2.inv_tf + 1e-3
    assert k != R._bucket_cache_key(ir2, sc.config, 16, 8, 128,
                                    jnp.float32, 5)
    # corrupt cache file -> treated as miss, put still works
    with open(R._bucket_cache_path(), "w") as f:
        f.write("{corrupt")
    assert R._bucket_cache_get(k) is None
    R._bucket_cache_put(k, (256,))
    assert R._bucket_cache_get(k) == (256,)
