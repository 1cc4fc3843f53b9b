"""Multi-device data parallelism on the 8-device virtual CPU mesh.

The driver's dryrun_multichip covers compile+execute of the full sharded
train step; these tests additionally assert numerical equivalence:
sharded forward == single-device forward, and the GSPMD-inserted gradient
all-reduce produces the same update as unsharded training.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.conftest import GOLDEN  # noqa: F401  (conftest env setup)

from fast_ray_tracer_tpu.parallel.mesh import (
    BATCH_AXIS, make_mesh, replicate_scene, shard_pixel_batch,
)
from fast_ray_tracer_tpu.parallel.train import (
    make_train_step, merge_params, split_params,
)
from fast_ray_tracer_tpu.render.camera import build_camera
from fast_ray_tracer_tpu.render.integrator import build_statics
from fast_ray_tracer_tpu.render.render import pixel_colors
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.demo import glass_spheres


needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")

W, H = 32, 16


def _setup():
    scene = glass_spheres(W, H)
    ir = compile_scene(scene, dtype=jnp.float64)
    cam_rt = build_camera(scene.camera, dtype=jnp.float64)
    rt = build_statics(ir, scene.config)
    n = W * H
    px = np.tile(np.arange(W, dtype=np.int32), H)
    py = np.repeat(np.arange(H, dtype=np.int32), W)
    uv = np.broadcast_to(np.asarray(cmj_points_static(1, 1), np.float64),
                         (n, 2))
    ap = np.zeros((n, 2), np.float64)
    return scene, ir, cam_rt, rt, (px, py, uv, ap)


@needs_devices
def test_sharded_forward_matches_single_device():
    scene, ir, cam_rt, rt, (px, py, uv, ap) = _setup()
    pl = scene.config.di_path_length

    ref = pixel_colors(ir, rt, cam_rt, jnp.asarray(px), jnp.asarray(py),
                       jnp.asarray(uv), jnp.asarray(ap), 1, pl, None)

    mesh = make_mesh(8)
    ir_r = replicate_scene(mesh, ir)
    px_s, py_s, uv_s, ap_s = shard_pixel_batch(mesh, px, py, uv, ap)

    fn = jax.jit(lambda i, a, b, c, d:
                 pixel_colors(i, rt, cam_rt, a, b, c, d, 1, pl, None),
                 out_shardings=NamedSharding(mesh, P(BATCH_AXIS)))
    out = fn(ir_r, px_s, py_s, uv_s, ap_s)
    assert len(out.sharding.device_set) == 8
    # GSPMD partitioning changes XLA fusion boundaries -> last-ulp FP
    # reassociation (measured max 4e-14 in f64); not a semantic difference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12)


@needs_devices
def test_sharded_train_step_matches_single_device():
    scene, ir, cam_rt, rt, (px, py, uv, ap) = _setup()
    pl = scene.config.di_path_length
    params, static = split_params(ir)
    p2 = dict(params)
    p2["mat_Kd"] = params["mat_Kd"] * 0.7
    target = np.asarray(pixel_colors(
        merge_params(p2, static), rt, cam_rt, jnp.asarray(px),
        jnp.asarray(py), jnp.asarray(uv), jnp.asarray(ap), 1, pl, None))

    init, step = make_train_step(rt, cam_rt, static, 1, pl)

    # single device
    s1 = init(params)
    s1, loss1 = jax.jit(step)(s1, jnp.asarray(px), jnp.asarray(py),
                              jnp.asarray(uv), jnp.asarray(ap),
                              jnp.asarray(target))

    # 8-device mesh: pixels sharded, params replicated; GSPMD inserts the
    # gradient psum
    mesh = make_mesh(8)
    s8 = replicate_scene(mesh, init(params))
    px_s, py_s, uv_s, ap_s, tgt_s = shard_pixel_batch(
        mesh, px, py, uv, ap, target)
    s8, loss8 = jax.jit(step)(s8, px_s, py_s, uv_s, ap_s, tgt_s)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-12)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s8.params[k]),
                                   np.asarray(s1.params[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)


@needs_devices
def test_render_scene_sharded_matches_single_device():
    """render_scene(mesh=...) — the production sharded path (shard_map +
    per-device bucket compaction) must byte-match the single-device
    render on a deterministic scene."""
    from fast_ray_tracer_tpu.render.render import render_scene
    scene = glass_spheres(W, H)
    ref = render_scene(scene, dtype=jnp.float64, chunk_pixels=128)
    mesh = make_mesh(8)
    out = render_scene(scene, dtype=jnp.float64, chunk_pixels=128,
                       mesh=mesh)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)


@pytest.mark.slow
def test_multiprocess_distributed_render(tmp_path):
    """TRUE multi-host path: 2 jax.distributed processes (gloo), 4 virtual
    CPU devices each, one global 8-device mesh. Each process feeds only
    its addressable pixel shards (jax.make_array_from_callback) and
    gathers the canvas; both hosts' canvases must agree and match the
    single-process render to FP-reassociation noise."""
    import subprocess
    import sys
    import textwrap

    script = tmp_path / "dist_render.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        fl = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            fl + " --xla_force_host_platform_device_count=4").strip()
        pid = int(sys.argv[1]); nproc = int(sys.argv[2])
        sys.path.insert(0, {str(pathlib_root)!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        from fast_ray_tracer_tpu.parallel import distributed as dist
        dist.init(coordinator_address="localhost:12357",
                  num_processes=nproc, process_id=pid)
        import jax.numpy as jnp
        import numpy as np
        from fast_ray_tracer_tpu.render.render import render_scene
        from fast_ray_tracer_tpu.scene.demo import glass_spheres
        mesh = dist.global_mesh()
        canvas = render_scene(glass_spheres(64, 32), dtype=jnp.float64,
                              chunk_pixels=256, mesh=mesh)
        np.save({str(tmp_path)!r} + f"/canvas_{{pid}}.npy", canvas)
        dist.shutdown()
    """))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, str(script), str(i), "2"],
                              env=env) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=480) == 0
    c0 = np.load(tmp_path / "canvas_0.npy")
    c1 = np.load(tmp_path / "canvas_1.npy")
    ref = np.asarray(render_scene_single())
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_allclose(c0, ref, rtol=0, atol=1e-12)


def render_scene_single():
    from fast_ray_tracer_tpu.render.render import render_scene
    return render_scene(glass_spheres(64, 32), dtype=jnp.float64,
                        chunk_pixels=256)


import os  # noqa: E402
import pathlib  # noqa: E402
pathlib_root = str(pathlib.Path(__file__).resolve().parent.parent)
