"""Device-time breakdown of the Cornell-GI render chunk on the TPU.

Times the irradiance-estimate query block (the suspected chunk
dominator) in isolation and in ablations (no overflow fold, fewer
bisection iterations), plus the surrounding chunk for the share.

Usage: python tools/profile_cornell.py
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


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from fast_ray_tracer_tpu import load_scene
    from fast_ray_tracer_tpu.render import photon
    from fast_ray_tracer_tpu.render.integrator import build_statics
    from fast_ray_tracer_tpu.scene.compile import compile_scene

    sc = load_scene(".baseline/golden/cornell_small.yml")
    ir = compile_scene(sc, dtype=jnp.float32)
    rt = build_statics(ir, sc.config)
    cfg = rt.cfg
    print(f"photons={cfg.photon_count} gather_num="
          f"{cfg.irradiance_estimate_num} r={cfg.irradiance_estimate_radius}",
          flush=True)

    t0 = time.perf_counter()
    pmaps = photon.trace_photons(ir, rt, jax.random.PRNGKey(7), jnp.float32,
                                 caustic=cfg.include_caustics,
                                 global_=True)
    print(f"trace_photons wall {time.perf_counter()-t0:.1f}s", flush=True)
    pm = pmaps[photon.GLOBAL]
    print(f"global map: n={pm.n} cap_rows={pm.cap_rows} "
          f"ovf={pm.ovf_pos.shape[0]} query_block={photon._query_block(pm)}",
          flush=True)

    R = 16384
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-2.5, 2.5, (R, 3)).astype(np.float32))
    eye = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    eye = eye / jnp.linalg.norm(eye, axis=-1, keepdims=True)

    num = cfg.irradiance_estimate_num
    md = cfg.irradiance_estimate_radius
    ck = cfg.irradiance_estimate_cone_filter_k

    full = jax.jit(lambda p, e: photon._irradiance_block(pm, p, e, num, md, ck))
    t = timed(full, pts, eye)
    print(f"irradiance block R={R}: {t*1e3:.1f} ms "
          f"({R/t/1e6:.2f} Mq/s)", flush=True)

    # ablation: overflow list emptied (UNDERCOUNTS - timing only)
    pm_no = pm._replace(ovf_pos=pm.ovf_pos[:0], ovf_power=pm.ovf_power[:0],
                        ovf_dir=pm.ovf_dir[:0])
    noovf = jax.jit(lambda p, e: photon._irradiance_block(pm_no, p, e, num, md, ck))
    t2 = timed(noovf, pts, eye)
    print(f"  no-overflow ablation: {t2*1e3:.1f} ms (overflow share "
          f"{(t-t2)/t*100:.0f}%)", flush=True)

    # caustic map for scale
    pmc = pmaps.get(photon.CAUSTIC)
    if pmc is not None:
        print(f"caustic map: n={pmc.n} cap_rows={pmc.cap_rows} "
              f"ovf={pmc.ovf_pos.shape[0]}", flush=True)
        fc = jax.jit(lambda p, e: photon._irradiance_block(pmc, p, e, num, md, ck))
        t3 = timed(fc, pts, eye)
        print(f"  caustic block: {t3*1e3:.1f} ms", flush=True)


if __name__ == "__main__" and "--chunk" not in sys.argv:
    main()


def chunk_ablation():
    """320x320 warm render under ablations: full / stub queries /
    no GI hook — splits chunk time into query vs gather-overhead vs
    direct-lighting shares."""
    from fast_ray_tracer_tpu import load_scene
    from fast_ray_tracer_tpu.render import photon
    from fast_ray_tracer_tpu.render.render import render_scene
    from fast_ray_tracer_tpu.scene.model import replace as _rep

    sc = load_scene(".baseline/golden/cornell_small.yml")
    sc.camera = _rep(sc.camera, width=320, height=320)

    def run(tag):
        t0 = time.perf_counter()
        render_scene(sc, dtype=jnp.float32, chunk_pixels=32000,
                     key=jax.random.PRNGKey(7))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        render_scene(sc, dtype=jnp.float32, chunk_pixels=32000,
                     key=jax.random.PRNGKey(7))
        w = time.perf_counter() - t0
        print(f"{tag}: cold {c:.1f}s warm {w:.1f}s", flush=True)
        return w

    full = run("full")

    real_block = photon._irradiance_block

    def stub_block(pm, points, eyev, num, max_dist, cone_k):
        R = points.shape[0]
        return (jnp.zeros((R, 3), points.dtype) + 1e-6 * points.sum(-1, keepdims=True),
                jnp.full((R,), num, jnp.int32))

    photon._irradiance_block = stub_block
    stub = run("stub-queries")
    photon._irradiance_block = real_block

    sc.config = _rep(sc.config, include_final_gather=False)
    nogi = run("no-final-gather")
    print(f"query share {(full-stub)/full*100:.0f}%  "
          f"gather-total share {(full-nogi)/full*100:.0f}%", flush=True)


if __name__ == "__main__" and "--chunk" in sys.argv:
    chunk_ablation()
