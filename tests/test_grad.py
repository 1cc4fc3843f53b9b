"""Differentiability: pixel-loss gradients vs central finite differences.

New capability vs the forward-only reference (SURVEY.md §7 step 7):
gradients of a pixel loss flow to material tables, light intensities and
positions, and primitive inverse transforms. FD-allclose on the flagship
glass-spheres scene (reflective + refractive, depth-5 wavefront) in f64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import GOLDEN  # noqa: F401  (forces conftest env setup)

from fast_ray_tracer_tpu.parallel.train import (
    make_train_step, merge_params, split_params,
)
from fast_ray_tracer_tpu.render.camera import build_camera
from fast_ray_tracer_tpu.render.integrator import build_statics
from fast_ray_tracer_tpu.render.render import pixel_colors
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.demo import glass_spheres


W, H = 24, 12


def _setup(dtype=jnp.float64):
    scene = glass_spheres(W, H)
    ir = compile_scene(scene, dtype=dtype)
    cam_rt = build_camera(scene.camera, dtype=dtype)
    rt = build_statics(ir, scene.config)
    n = W * H
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype), (n, 2))
    ap = jnp.zeros((n, 2), dtype)
    pl = scene.config.di_path_length
    return scene, ir, cam_rt, rt, (px, py, uv, ap), pl


def _loss_fn(rt, cam_rt, static, args, path_length, target):
    px, py, uv, ap = args

    def loss(params):
        ir = merge_params(params, static)
        img = pixel_colors(ir, rt, cam_rt, px, py, uv, ap, 1,
                           path_length, None)
        return jnp.mean((img - target) ** 2)

    return loss


def _fd_check(loss, params, name, idx, eps, rtol):
    """Central finite difference on one scalar entry of params[name]."""
    g = jax.grad(loss)(params)[name]
    flat = np.asarray(params[name], np.float64).copy()
    base = flat[idx]

    def at(v):
        p2 = dict(params)
        arr = flat.copy()
        arr[idx] = v
        p2[name] = jnp.asarray(arr)
        return float(loss(p2))

    fd = (at(base + eps) - at(base - eps)) / (2 * eps)
    an = float(np.asarray(g)[idx])
    assert np.isclose(an, fd, rtol=rtol, atol=1e-9), (name, idx, an, fd)
    return an


def test_gradients_match_fd():
    scene, ir, cam_rt, rt, args, pl = _setup()
    params, static = split_params(ir)
    # target: a slightly perturbed render so the loss/grads are non-zero
    img = pixel_colors(ir, rt, cam_rt, *args, 1, pl, None)
    target = img * 0.9 + 0.01
    loss = jax.jit(_loss_fn(rt, cam_rt, static, args, pl, target))

    checked = 0
    # material diffuse (Kd), specular (Ks), reflectivity on a few entries
    for name, idx in [("mat_Kd", (1, 0)), ("mat_Ks", (1, 1)),
                      ("mat_refl", (2, 0)), ("mat_Ns", (1,)),
                      ("light_intensity", (0, 1)),
                      ("light_pos", (0, 0))]:
        if name not in params:
            continue
        an = _fd_check(loss, params, name, idx, 3e-5, 2e-3)
        checked += 1
        if name in ("mat_Kd", "light_intensity"):
            assert an != 0.0, f"{name} gradient unexpectedly zero"
    assert checked >= 4


def test_transform_gradients_match_fd():
    """Gradients flow through a primitive's inverse transform (translation
    entries of the world->object matrices)."""
    scene, ir, cam_rt, rt, args, pl = _setup()
    params, static = split_params(ir)
    img = pixel_colors(ir, rt, cam_rt, *args, 1, pl, None)
    target = img * 0.9
    loss = jax.jit(_loss_fn(rt, cam_rt, static, args, pl, target))
    name = "inv_tf" if "inv_tf" in params else None
    if name is None:
        cands = [k for k in params if "inv" in k or "tf" in k
                 or "transform" in k]
        assert cands, f"no transform param found in {sorted(params)}"
        name = cands[0]
    arr = np.asarray(params[name])
    # translation column entry of the second primitive
    idx = (1,) + tuple([0] * (arr.ndim - 3)) + (0, 3)
    _fd_check(loss, params, name, idx, 3e-5, 5e-3)


def test_train_step_recovers_material():
    """Inverse rendering: optimizing the diffuse table against a target
    rendered with scaled Kd reduces the pixel loss by >10x."""
    scene, ir, cam_rt, rt, args, pl = _setup()
    params, static = split_params(ir)
    # target: same scene with scaled diffuse
    p2 = dict(params)
    p2["mat_Kd"] = params["mat_Kd"] * 0.6
    target = pixel_colors(merge_params(p2, static), rt, cam_rt, *args,
                          1, pl, None)

    # optimize only the perturbed table; everything else is static
    opt_params = {"mat_Kd": params["mat_Kd"]}
    rest = {k: v for k, v in params.items() if k != "mat_Kd"}
    static2 = {"fields": {**static["fields"], **rest},
               "meta": static["meta"]}
    init, step = make_train_step(rt, cam_rt, static2, 1, pl)
    state = init(opt_params)
    step = jax.jit(step)
    px, py, uv, ap = args
    losses = []
    for _ in range(40):
        state, loss = step(state, px, py, uv, ap, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])


def test_bucketed_gradients_match_unrolled():
    """Differentiating THROUGH the compacted static-bucket wavefront
    (pixel_colors buckets=...) matches the 2^depth unrolled trace —
    per-lane arithmetic is identical and the compaction gathers are
    linear — with ONE documented exception: the spawn value gates prune
    subtrees whose refl/Tf is exactly zero, so those rows carry
    subgradient 0 where the unrolled path reports the one-sided growth
    derivative (see trace_bucketed). This is the memory-viable path
    full-frame fwd+bwd uses (bench_extras: 63R lanes unrolled vs ~10R
    bucketed at depth 5; 14.9 GB vs 1.5 GB of temps on v5e)."""
    from fast_ray_tracer_tpu.render.integrator import default_buckets

    scene, ir, cam_rt, rt, args, pl = _setup()
    params, static = split_params(ir)
    img = pixel_colors(ir, rt, cam_rt, *args, 1, pl, None)
    target = img * 0.9 + 0.01
    buckets = default_buckets(args[0].shape[0], pl)

    def loss_u(p):
        return jnp.mean((pixel_colors(merge_params(p, static), rt, cam_rt,
                                      *args, 1, pl, None) - target) ** 2)

    def loss_b(p):
        return jnp.mean((pixel_colors(merge_params(p, static), rt, cam_rt,
                                      *args, 1, pl, None, remat="level",
                                      buckets=buckets) - target) ** 2)

    assert np.isclose(float(loss_b(params)), float(loss_u(params)),
                      rtol=1e-12)
    gu = jax.grad(loss_u)(params)
    gb = jax.grad(loss_b)(params)
    # rows pruned by the value gates: all-zero Tf / all-zero refl
    zero_tf = ~np.any(np.asarray(ir.mat_Tf) != 0.0, axis=-1)
    zero_rf = ~np.any(np.asarray(ir.mat_refl) != 0.0, axis=-1)
    assert zero_tf.any() and (~zero_tf).any(), "fixture needs both kinds"
    for k in sorted(gu):
        a, b = np.asarray(gu[k]), np.asarray(gb[k])
        if k == "mat_Tf":
            np.testing.assert_allclose(b[~zero_tf], a[~zero_tf],
                                       rtol=5e-6, atol=1e-12, err_msg=k)
            # pruned rows: the documented subgradient-0 behavior
            np.testing.assert_array_equal(b[zero_tf], 0.0)
        elif k == "mat_refl":
            np.testing.assert_allclose(b[~zero_rf], a[~zero_rf],
                                       rtol=5e-6, atol=1e-12, err_msg=k)
        else:
            np.testing.assert_allclose(b, a, rtol=5e-6, atol=1e-12,
                                       err_msg=k)
