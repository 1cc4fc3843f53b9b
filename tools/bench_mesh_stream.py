"""Streaming-vs-resident-vs-jnp mesh intersector benchmark (TPU).

Synthetic Morton-ordered soup beyond the resident VMEM budget: the
round-4 verdict asked for a bench entry proving the streaming Pallas
kernel keeps kernel-class throughput past the 8 MB cliff (>=5x the jnp
gather fold). Prints one JSON line consumed by bench_extras.

Usage: python tools/bench_mesh_stream.py [n_tris] [n_rays]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.utils import enable_compile_cache

enable_compile_cache()


def build_soup(n_tri, seed=0):
    """Morton-ish coherent clustered soup (clusters along a space curve
    like compile.py's Morton ordering produces)."""
    from fast_ray_tracer_tpu.scene.ir import SceneIR, SceneMeta
    C = 64
    nc = n_tri // C
    rng = np.random.default_rng(seed)
    # cluster centers on a coarse grid walk -> spatially coherent ids
    g = max(2, int(round(nc ** (1 / 3))))
    idx = np.arange(nc)
    centers = np.stack([idx % g, (idx // g) % g, idx // (g * g)],
                       -1).astype(np.float32)
    centers += rng.normal(0, 0.1, centers.shape)
    base = centers[:, None, :] + rng.normal(0, 0.25, (nc, C, 3))
    p1 = base.reshape(-1, 3).astype(np.float32)
    e1 = rng.normal(0, 0.2, (nc * C, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (nc * C, 3)).astype(np.float32)
    v = np.stack([p1, p1 + e1, p1 + e2], 1)
    cmin = v.reshape(nc, C * 3, 3).min(1)
    cmax = v.reshape(nc, C * 3, 3).max(1)
    meta = SceneMeta(n_triangles=nc * C, use_clusters=True, n_clusters=nc,
                     cluster_size=C)
    ir = SceneIR(meta=meta, tri_p1=jnp.asarray(p1), tri_e1=jnp.asarray(e1),
                 tri_e2=jnp.asarray(e2), cluster_min=jnp.asarray(cmin),
                 cluster_max=jnp.asarray(cmax))
    return ir, float(centers.max())


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


def run(n_tri=512 * 1024, n_rays=16384):
    """-> result dict; also callable from bench_extras (in-process: a
    second TPU client through the tunnel contends with the first).

    16k rays: the jnp-fold BASELINE needs (rays x n_clusters) slab
    tables and OOMs 16 GB at 64k rays x 8k clusters — the streaming
    kernel itself has no such scaling (only the shortlist masks)."""
    from fast_ray_tracer_tpu.ops import intersect, mesh_pallas

    ir, extent = build_soup(n_tri)
    assert not mesh_pallas._resident_fits(ir, 0), \
        "soup must exceed the resident budget for this bench"

    rng = np.random.default_rng(1)
    o = rng.uniform(-2, extent + 2, (n_rays, 3)).astype(np.float32)
    tgt = rng.uniform(0, extent, (n_rays, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    out = {"n_tris": n_tri, "n_rays": n_rays}

    saved = os.environ.get("FRT_MESH_PALLAS")
    try:
        os.environ["FRT_MESH_PALLAS"] = "0"
        t_jnp, (tj, ij) = timed(
            jax.jit(lambda a, b: intersect.mesh_closest(ir, a, b)), o, d)
        out["jnp_fold_ms"] = round(t_jnp * 1e3, 2)

        os.environ["FRT_MESH_PALLAS"] = "auto"
        t_str, (ts, is_) = timed(
            jax.jit(lambda a, b: intersect.mesh_closest(ir, a, b)), o, d)
        out["stream_ms"] = round(t_str * 1e3, 2)
        out["stream_speedup_vs_jnp"] = round(t_jnp / t_str, 2)
    finally:
        if saved is None:
            os.environ.pop("FRT_MESH_PALLAS", None)
        else:
            os.environ["FRT_MESH_PALLAS"] = saved

    tj, ts = np.asarray(tj), np.asarray(ts)
    hit = np.isfinite(tj)
    assert (np.isfinite(ts) == hit).all(), "hit-mask parity"
    if hit.any():
        np.testing.assert_allclose(ts[hit], tj[hit], rtol=1e-5)
    out["parity"] = "ok"
    out["hit_frac"] = round(float(hit.mean()), 3)
    return out


def main():
    n_tri = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 1024
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    print(json.dumps(run(n_tri, n_rays)), flush=True)


if __name__ == "__main__":
    main()
