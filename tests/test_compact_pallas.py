"""Parity + gradient tests for the Pallas monotone compaction kernels
(ops/compact_pallas.py) in interpreter mode against the XLA reference
formulation they replace (jnp.nonzero + row gathers)."""

import os

import numpy as np
import pytest

os.environ["FRT_COMPACT_PALLAS"] = "interpret"

import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.ops import compact_pallas as cp


def _ref_compact(src, act, B, fill_row):
    pad = jnp.concatenate([src, jnp.asarray(fill_row, src.dtype)[None]])
    (idx,) = jnp.nonzero(act, size=B, fill_value=src.shape[0])
    return pad[idx]


def _ref_expand(child, act):
    pos = jnp.clip(jnp.cumsum(act.astype(jnp.int32)) - 1, 0,
                   child.shape[0] - 1)
    return jnp.where(act[:, None], child[pos], 0.0)


def _cases():
    rng = np.random.default_rng(0)
    for n, b, c, p in [(256, 256, 6, 0.5), (1024, 512, 6, 0.3),
                       (1500, 1024, 9, 0.7), (2048, 1152, 3, 0.05),
                       (4096, 2048, 9, 0.95), (300, 128, 2, 0.0),
                       (1024, 256, 6, 1.0)]:
        act = rng.random(n) < p
        # keep count <= B (overflow is detected separately and discarded)
        on = np.nonzero(act)[0]
        if len(on) > b:
            act[on[b:]] = False
        src = rng.standard_normal((n, c)).astype(np.float32)
        yield n, b, c, act, src


@pytest.mark.parametrize("case", list(_cases()),
                         ids=lambda t: f"n{t[0]}_b{t[1]}_c{t[2]}")
def test_compact_matches_nonzero(case):
    n, b, c, act, src = case
    fill = tuple(float(i) + 0.5 for i in range(c))
    got = cp.compact_rows(jnp.asarray(src), jnp.asarray(act), b, fill)
    want = _ref_compact(jnp.asarray(src), jnp.asarray(act), b, fill)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("case", list(_cases()),
                         ids=lambda t: f"n{t[0]}_b{t[1]}_c{t[2]}")
def test_expand_matches_gather(case):
    n, b, c, act, src = case
    rng = np.random.default_rng(1)
    child = rng.standard_normal((b, c)).astype(np.float32)
    got = cp.expand_rows(jnp.asarray(child), jnp.asarray(act))
    want = _ref_expand(jnp.asarray(child), jnp.asarray(act))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vjps_match_reference():
    rng = np.random.default_rng(2)
    n, b, c = 1300, 1024, 6
    act = jnp.asarray(rng.random(n) < 0.6)
    src = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    child = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    fill = (0.0,) * c
    ct_b = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    ct_n = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

    _, vjp = jax.vjp(lambda s: cp.compact_rows(s, act, b, fill), src)
    _, vjp_ref = jax.vjp(lambda s: _ref_compact(s, act, b, fill), src)
    np.testing.assert_allclose(np.asarray(vjp(ct_b)[0]),
                               np.asarray(vjp_ref(ct_b)[0]), rtol=0, atol=0)

    _, vjp = jax.vjp(lambda ch: cp.expand_rows(ch, act), child)
    _, vjp_ref = jax.vjp(lambda ch: _ref_expand(ch, act), child)
    np.testing.assert_allclose(np.asarray(vjp(ct_n)[0]),
                               np.asarray(vjp_ref(ct_n)[0]), rtol=0, atol=0)


def test_bucketed_trace_integration_interpret():
    """trace_bucketed through the interpret-mode kernels == the XLA
    nonzero/gather path, bit for bit (f32; the f64 golden suite exercises
    only the XLA path since enabled() gates on f32)."""
    from fast_ray_tracer_tpu.render.camera import build_camera, rays_for_pixels
    from fast_ray_tracer_tpu.render.integrator import (
        build_statics, default_buckets, trace_bucketed,
    )
    from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
    from fast_ray_tracer_tpu.scene.compile import compile_scene
    from fast_ray_tracer_tpu.scene.demo import glass_spheres

    W, H = 64, 32
    dtype = jnp.float32
    scene = glass_spheres(W, H)
    ir = compile_scene(scene, dtype=dtype)
    cam_rt = build_camera(scene.camera, dtype=dtype)
    rt = build_statics(ir, scene.config)
    depth = scene.config.di_path_length
    n = W * H
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype),
                          (n, 2))
    ap = jnp.zeros((n, 2), dtype)
    o, d = rays_for_pixels(cam_rt, px, py, uv, ap)
    bk = default_buckets(n, depth)

    def render():
        tr, ovf = trace_bucketed(ir, rt, o, d, depth, None, bk)
        assert not bool(ovf)
        return np.asarray((tr.a + tr.d + tr.s) / 3.0)

    assert cp.enabled(dtype)
    img_pallas = render()
    os.environ["FRT_COMPACT_PALLAS"] = "0"
    try:
        img_xla = render()
    finally:
        os.environ["FRT_COMPACT_PALLAS"] = "interpret"
    np.testing.assert_array_equal(img_pallas, img_xla)
