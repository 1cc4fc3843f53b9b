"""Secondary driver metrics for bench.py (BASELINE.md:30-32):
forward+backward wall-clock, Cornell-box GI throughput, clustered-mesh
throughput, and multi-device scaling efficiency. Each entry is
independently guarded so one failure doesn't sink the headline line."""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp


def _guard(fn):
    try:
        return fn()
    except Exception:
        traceback.print_exc()
        return None


def fwd_bwd_ms(timer):
    """Forward+backward wall-clock for a pixel-loss gradient over every
    float scene parameter on the 800x400 flagship scene (the driver metric
    BASELINE.md:30-32 asks for fwd+bwd ms)."""
    from fast_ray_tracer_tpu.render.camera import build_camera
    from fast_ray_tracer_tpu.render.integrator import build_statics
    from fast_ray_tracer_tpu.parallel.train import (
        make_train_step, split_params,
    )
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
    target = jnp.zeros((n, 3), dtype)

    params, static = split_params(ir)
    init, step = make_train_step(rt, cam_rt, static, 1, path_length,
                                 remat=True)
    state = init(params)
    jstep = jax.jit(step)
    with timer.phase("fwd_bwd_compile"):
        state2, loss = jstep(state, px, py, uv, ap, target)
        jax.block_until_ready(loss)
    times = []
    with timer.phase("fwd_bwd_timed"):
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss = jstep(state, px, py, uv, ap, target)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
    assert bool(jnp.isfinite(loss))
    return round(min(times) * 1000.0, 1)


def run(timer):
    out = {}
    v = _guard(lambda: fwd_bwd_ms(timer))
    if v is not None:
        out["fwd_bwd_ms_800x400_d5"] = v
    return out
