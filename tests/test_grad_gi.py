"""Gradients THROUGH the photon-mapped GI pipeline, FD-validated.

Round-4 verdict item #1: stored photon powers used to be host-built
constants, so d(pixel)/d(mat_Kd, light_intensity) through lighting_gi/
final_gather was zero on the tracing side. The provenance replay
(photon.live_photon_powers / with_live_power) makes the stored powers a
live function of the material/light tables while the photon STRUCTURE
(positions, directions, storage decisions, RR draws) stays frozen at its
traced values. These tests pin:

  * the live recompute reproduces the host-packed powers bit-for-bit at
    the traced parameter values,
  * a GI pixel's gradient w.r.t. a wall's Kd and the light intensity is
    nonzero and matches central finite differences of the SAME function
    (frozen structure + live powers — the function the optimizer sees).

Reference GI pipeline being differentiated: renderer.c:626-687 +
photon_tracer.c:202-257.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import GOLDEN  # noqa: F401  (forces conftest env setup)

from fast_ray_tracer_tpu import load_scene
from fast_ray_tracer_tpu.parallel.train import merge_params, split_params
from fast_ray_tracer_tpu.render import photon
from fast_ray_tracer_tpu.render.camera import build_camera
from fast_ray_tracer_tpu.render.integrator import build_statics
from fast_ray_tracer_tpu.render.render import pixel_colors
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.model import replace


W = H = 16


def _setup(dtype=jnp.float64):
    sc = load_scene(str(GOLDEN / "cornell_small.yml"))
    sc.camera = replace(sc.camera, width=W, height=H)
    sc.config = replace(sc.config, photon_count=20000,
                        gi_usteps=2, gi_vsteps=2,
                        irradiance_estimate_num=50)
    ir = compile_scene(sc, dtype=dtype)
    cam_rt = build_camera(sc.camera, dtype=dtype)
    rt = build_statics(ir, sc.config)
    pmaps = photon.trace_photons(ir, rt, jax.random.PRNGKey(7), dtype,
                                 caustic=sc.config.include_caustics,
                                 global_=sc.config.include_final_gather)
    rt = rt._replace(gi_hook=photon.make_gi_hook(pmaps, sc.config,
                                                 live_power=True))
    n = W * H
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    uv = jnp.broadcast_to(jnp.asarray(cmj_points_static(1, 1), dtype),
                          (n, 2))
    ap = jnp.zeros((n, 2), dtype)
    return sc, ir, cam_rt, rt, pmaps, (px, py, uv, ap)


def test_live_power_matches_host_packed():
    _, ir, _, _, pmaps, _ = _setup()
    pm = pmaps[photon.GLOBAL]
    assert pm is not None and pm.prov_mat is not None
    pml = photon.with_live_power(pm, ir)
    P = photon.P_PACK
    assert bool(jnp.array_equal(pml.packed[:, 3 * P:6 * P],
                                pm.packed[:, 3 * P:6 * P]))
    assert bool(jnp.array_equal(pml.ovf_power, pm.ovf_power))


def test_gi_gradient_fd():
    sc, ir, cam_rt, rt, pmaps, args = _setup()
    px, py, uv, ap = args
    params, static = split_params(ir)
    key = jax.random.PRNGKey(3)
    pl = sc.config.di_path_length

    def loss(p):
        ir2 = merge_params(p, static)
        img = pixel_colors(ir2, rt, cam_rt, px, py, uv, ap, 1, pl, key)
        return jnp.mean(img)

    grads = jax.grad(loss)(params)
    g_kd = np.asarray(grads["mat_Kd"])
    g_int = np.asarray(grads["light_intensity"])

    # the wall materials' Kd gradients must be nonzero THROUGH the map:
    # pick the entry with the largest |grad| and FD-validate it
    assert np.abs(g_kd).sum() > 0.0
    assert np.abs(g_int).sum() > 0.0

    def fd(name, idx, eps):
        flat = np.asarray(params[name], np.float64).copy()

        def at(v):
            p2 = dict(params)
            arr = flat.copy()
            arr[idx] = v
            p2[name] = jnp.asarray(arr)
            return float(loss(p2))

        base = flat[idx]
        return (at(base + eps) - at(base - eps)) / (2 * eps)

    idx_kd = np.unravel_index(np.abs(g_kd).argmax(), g_kd.shape)
    fd_kd = fd("mat_Kd", idx_kd, 1e-4)
    assert np.isclose(float(g_kd[idx_kd]), fd_kd, rtol=5e-4, atol=1e-10), \
        (float(g_kd[idx_kd]), fd_kd)

    idx_i = np.unravel_index(np.abs(g_int).argmax(), g_int.shape)
    fd_i = fd("light_intensity", idx_i, 1e-4)
    assert np.isclose(float(g_int[idx_i]), fd_i, rtol=5e-4, atol=1e-10), \
        (float(g_int[idx_i]), fd_i)


def test_gi_gradient_flows_from_stored_power_alone():
    """Isolate the tracing-side path: gradient of the GI term w.r.t.
    light intensity with the QUERY side held at the traced values is
    nonzero (the round-4 gap was exactly this path being zero)."""
    sc, ir, cam_rt, rt, pmaps, args = _setup()
    pm = pmaps[photon.GLOBAL]

    # query at photon positions inside the DENSEST grid cell so the
    # found >= 8 estimate gate passes, with eyev facing the photons
    P = photon.P_PACK
    rows_per_cell = np.diff(np.asarray(pm.row_start))
    r0 = int(np.asarray(pm.row_start)[int(rows_per_cell.argmax())])
    row = np.asarray(pm.packed[r0])[:9 * P].reshape(9, P)
    live = row[0] < 1e29
    pts = jnp.asarray(row[0:3, live].T)
    eye = jnp.asarray(-row[6:9, live].T)

    def f(inten):
        ir2 = dataclasses.replace(ir, light_intensity=inten)
        pml = photon.with_live_power(pm, ir2)
        irr, _ = photon.irradiance_estimate(
            pml, pts, eye, sc.config.irradiance_estimate_num,
            sc.config.irradiance_estimate_radius,
            sc.config.irradiance_estimate_cone_filter_k)
        return jnp.sum(irr)

    g = jax.grad(f)(ir.light_intensity)
    assert float(jnp.abs(g).sum()) > 0.0
