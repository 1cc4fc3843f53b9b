"""Top-level render driver.

The reference parallelizes with one pthread job per scanline over
per-thread world replicas (renderer.c:243-281). Here the image is a flat
pixel batch: every pixel's usteps x vsteps subpixel samples become rays in
one batch, chunked to bound memory, each chunk one jit'd device program.
Multi-chip sharding shards the pixel axis over a jax Mesh (see
parallel/mesh.py) — the scene tables are replicated, the canvas is the
only gathered output, exactly the data-parallel structure the reference's
thread pool approximates on shared memory.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.sampling.cmj import (
    cmj_points_batched, cmj_points_static,
)
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.ir import SceneIR
from fast_ray_tracer_tpu.scene.model import SceneDesc
from fast_ray_tracer_tpu.render.camera import (
    build_camera, rays_for_pixels, sample_aperture,
)
from fast_ray_tracer_tpu.render.integrator import (
    Triple, build_statics, color_at, trace_bucketed,
)


def _bucket_cache_path():
    import os
    d = os.environ.get("FRT_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/jax_comp"))
    return os.path.join(d, "frt_buckets.json")


def _bucket_cache_key(ir, cfg, W, H, chunk_pixels, dtype, path_length):
    """Descriptor hash over everything spawn counts can depend on: static
    meta + config + render geometry + a cheap per-leaf fingerprint.

    Big leaves (a 141k-tri mesh is ~100 MB of tensors) are fingerprinted
    by shape/dtype + a 64 KB strided sample + head/tail slices instead of
    hashing every byte — render startup used to sha1 the full scene per
    invocation. A colliding stale entry is harmless by design: buckets
    only seed the calibration, and the overflow-escalation path detects
    and rewrites an undersized tuple."""
    import hashlib
    h = hashlib.sha1()
    h.update(repr(ir.meta).encode())
    h.update(repr(cfg).encode())
    h.update(f"{W}x{H}:{chunk_pixels}:{jnp.dtype(dtype).name}"
             f":{path_length}:v2".encode())
    SMALL = 1 << 20
    for leaf in jax.tree_util.tree_leaves(ir):
        a = np.asarray(leaf)
        h.update(f"{a.shape}{a.dtype}".encode())
        if a.nbytes <= SMALL:
            h.update(a.tobytes())
        else:
            flat = a.reshape(-1)
            step = max(1, flat.size // 8192)
            h.update(np.ascontiguousarray(flat[::step][:8192]).tobytes())
            h.update(np.ascontiguousarray(flat[:2048]).tobytes())
            h.update(np.ascontiguousarray(flat[-2048:]).tobytes())
    return h.hexdigest()


def _bucket_cache_get(key):
    import json
    import os
    try:
        with open(_bucket_cache_path()) as f:
            v = json.load(f).get(key)
        return tuple(int(x) for x in v) if v else None
    except (OSError, ValueError):
        return None


def _bucket_cache_put(key, buckets):
    import json
    import os
    path = _bucket_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, ValueError):
            d = {}
        d[key] = list(buckets)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)
    except OSError:
        pass                      # cache is an optimization, never fatal


def pixel_colors(ir: SceneIR, rt, cam_rt, px_r, py_r, uv_r, ap,
                 n_samples: int, path_length: int, key=None,
                 remat=False, buckets=None):
    """Pure forward: pixel ids (+ subpixel uv, aperture offsets), repeated
    n_samples times per pixel -> (n_pixels, 3) linear canvas colors.

    This is the differentiable render core shared by render_scene and the
    training step (parallel/train.py): per-sample color_at, per-pixel
    average, final (A + D + S) / 3 (renderer.c:174-230). `remat`
    checkpoints each wavefront level for the backward pass (see
    integrator._make_level_fn for the mode strings).

    `buckets` (a per-level size tuple from integrator.calibrate_buckets /
    default_buckets) routes through the compacted static-bucket wavefront
    instead of the 2^depth unrolled trace — the difference between a
    ~10R-lane and a 63R-lane backward graph at depth 5, which is what
    made full-frame fwd+bwd fit on-chip. Compaction is differentiable
    (nonzero gathers; the upward combine re-gathers), and per-lane
    arithmetic matches `trace` exactly; overflow lanes would be dropped,
    so calibrate with margin (the forward render path's escalation logic
    covers production renders)."""
    orig, dirs = rays_for_pixels(cam_rt, px_r, py_r, uv_r, ap)
    if buckets is not None:
        # value gates stay ON even under differentiation: ungated
        # spawning admits every refract_active lane (over_d > 0 holds
        # for all opaque hits), which regrows the 2^depth graph the
        # buckets exist to avoid. Consequence (documented, tested): a
        # material whose refl/Tf is EXACTLY zero has subgradient 0
        # through the specular subtree — the one-sided derivative at
        # the prune boundary. Entries with any nonzero channel get
        # exact gradients.
        triple, _ovf = trace_bucketed(ir, rt, orig, dirs, path_length,
                                      key, list(buckets), remat=remat)
    else:
        triple = color_at(ir, rt, orig, dirs, path_length, key,
                          remat=remat)
    n = px_r.shape[0] // n_samples
    a = triple.a.reshape(n, n_samples, 3).mean(axis=1)
    d = triple.d.reshape(n, n_samples, 3).mean(axis=1)
    s = triple.s.reshape(n, n_samples, 3).mean(axis=1)
    return (a + d + s) / 3.0


def render_scene(scene: SceneDesc, dtype=jnp.float32,
                 chunk_pixels: int = 8192, key=None,
                 progress: bool = False,
                 checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 8,
                 mesh=None, timer=None) -> np.ndarray:
    """Render a scene to an (H, W, 3) float canvas (linear, pre-encode).

    Deterministic configs (no jitter, point aperture) need no key and
    reproduce the reference renderer's output; stochastic configs take a
    jax PRNG key replacing the reference's global drand48.

    With `checkpoint_path` the chunk loop snapshots the partial canvas
    every `checkpoint_every` chunks and resumes from the snapshot on
    restart (new capability vs the reference, which loses a killed render
    — SURVEY.md §5). Chunks are deterministic in (key, chunk index), so a
    resumed render is identical to an uninterrupted one.

    With `mesh` (a 1-D jax Mesh over the 'batch' axis, see
    parallel/mesh.py) each chunk's pixels shard over the devices via
    shard_map: the scene tables are replicated, every device runs the
    bucketed wavefront over ITS OWN shard (per-device compaction — no
    cross-device nonzero), and the only communication is the final
    per-chunk gather. Per-lane arithmetic is identical to the
    single-device path. Multi-host: make the mesh span all processes'
    devices (parallel/distributed.py) — each host feeds its addressable
    shard of the chunk.
    """
    if timer is None:
        from fast_ray_tracer_tpu.utils import PhaseTimer
        timer = PhaseTimer()           # unreported default; callers pass
                                       # their own to surface the phases
    with timer.phase("compile_scene"):
        ir = compile_scene(scene, dtype=dtype)
        cam = scene.camera
        cam_rt = build_camera(cam, dtype=dtype)
        rt = build_statics(ir, scene.config)

    # photon pass (generated main: trace_photons before rendering,
    # yaml_parser.py:201-216)
    cfg = scene.config
    # two distinct gates (reference quirk): photons are TRACED when any of
    # the three flags is set (generated main, yaml_parser.py:201), but GI
    # terms are APPLIED at shading only under use_gi = include_global ||
    # visualize_photon_map (setup_config, renderer.c:62) — a scene setting
    # only visualize-soft-indirect traces photons and never reads them.
    use_gi = (cfg.include_global or cfg.visualize_photon_map
              or cfg.visualize_soft_indirect)
    shade_gi = cfg.include_global or cfg.visualize_photon_map
    if cfg.photon_count > 0 and use_gi:
        from fast_ray_tracer_tpu.render import photon
        pm_key = jax.random.PRNGKey(1234) if key is None else \
            jax.random.fold_in(key, 12345)
        # maps populated exactly as the generated main does
        # (yaml_parser.py:201-216): caustic iff include_caustics, global
        # iff include_final_gather
        with timer.phase("trace_photons", count=cfg.photon_count):
            pmaps = photon.trace_photons(
                ir, rt, pm_key, dtype,
                caustic=cfg.include_caustics,
                global_=cfg.include_final_gather)
        if shade_gi:
            # hook rides RenderStatics (NOT the caller's ConfigDesc —
            # mutating cfg leaked a stale hook into later renders of the
            # same SceneDesc)
            rt = rt._replace(gi_hook=photon.make_gi_hook(pmaps, cfg))

    needs_rng = (cam.aperture.jitter or cam.aperture.kind not in
                 ("POINT_APERTURE", "HEXAGONAL_APERTURE",
                  "PENTAGONAL_APERTURE", "OCTAGONAL_APERTURE")
                 or any(info[3] for info in ir.meta.light_info)
                 or (cfg.photon_count > 0 and use_gi))
    if needs_rng and key is None:
        key = jax.random.PRNGKey(0)
    if not needs_rng:
        key = None

    W, H = cam.width, cam.height
    S = cam.usteps * cam.vsteps
    path_length = scene.config.di_path_length

    # deterministic subpixel jitter table (jitter=False -> constant for all
    # pixels, matching sampler reset semantics)
    det_table = jnp.asarray(cmj_points_static(cam.usteps, cam.vsteps), dtype)

    # device-side static-bucket wavefront compaction
    # (integrator.trace_bucketed) is THE compacted path on every backend:
    # ONE probe on the first chunk measures per-level spawn counts, the
    # whole render compiles with shared static buckets, and overflow
    # escalates the buckets once (recompile) before falling back to the
    # exact 2^depth unrolled trace. Scenes with no specular tree (and no
    # GI) skip compaction entirely — one level, nothing to compact.
    use_bucketed = ir.meta.has_reflective or ir.meta.has_refractive
    from fast_ray_tracer_tpu.ops.intersect import (
        mesh_shortlist, shortlist_worthwhile,
    )
    use_shortlist = shortlist_worthwhile(ir.meta)

    @partial(jax.jit, static_argnums=())
    def chunk_rays(px, py, chunk_key):
        n = px.shape[0]
        # subpixel sample table per pixel: (n, S, 2)
        if chunk_key is None or not cam.aperture.jitter:
            uv = jnp.broadcast_to(det_table[None], (n, S, 2))
            ap_key = None if chunk_key is None else chunk_key
        else:
            kt, ap_key = jax.random.split(chunk_key)
            uv = cmj_points_batched(kt, n, cam.usteps, cam.vsteps, dtype)
        px_r = jnp.repeat(px, S)
        py_r = jnp.repeat(py, S)
        uv_r = uv.reshape(n * S, 2)
        ap = sample_aperture(cam_rt, n * S,
                             None if ap_key is None else ap_key, dtype)
        return rays_for_pixels(cam_rt, px_r, py_r, uv_r, ap)

    def _avg(triple):
        n = triple.a.shape[0] // S
        a = triple.a.reshape(n, S, 3).mean(axis=1)
        d = triple.d.reshape(n, S, 3).mean(axis=1)
        s = triple.s.reshape(n, S, 3).mean(axis=1)
        return (a + d + s) / 3.0

    # ---- single-device chunk programs ---------------------------------
    # chunk_fns caches ONE compiled program per (buckets, shortlist)
    # variant; remote compiles through the TPU tunnel cost tens of
    # seconds, so the round-3 design (fresh bucket tuple + compile per
    # chunk) dominated GI walls — now every chunk reuses the calibrated
    # program and only overflow pays a second compile.
    chunk_fns = {}
    calib = {"buckets": None}

    def _quantize(counts, margin):
        return tuple(max(256, int(math.ceil(c * margin / 4096)) * 4096)
                     for c in counts)

    def probe_counts(ir_in, px, py, ck):
        if "probe" not in chunk_fns:
            from fast_ray_tracer_tpu.render.integrator import spawn_counts

            def p(i, px_c, py_c, k):
                o, d = chunk_rays(px_c, py_c, k)
                rk = None if k is None else jax.random.fold_in(k, 1)
                return spawn_counts(i, rt, o, d, path_length, rk)
            chunk_fns["probe"] = jax.jit(p)
        return [int(x) for x in chunk_fns["probe"](ir_in, px, py, ck)]

    def chunk_fn(buckets, shortlist):
        kk = (buckets, shortlist)
        if kk in chunk_fns:
            return chunk_fns[kk]

        def f(ir_in, px_c, py_c, ck, _b=buckets, _s=shortlist):
            orig, dirs = chunk_rays(px_c, py_c, ck)
            ray_key = None if ck is None else jax.random.fold_in(ck, 1)
            import contextlib
            cm = mesh_shortlist() if _s else contextlib.nullcontext()
            with cm as sink:
                if use_bucketed:
                    tr, b_ovf = trace_bucketed(ir_in, rt, orig, dirs,
                                               path_length, ray_key,
                                               list(_b))
                else:
                    tr = color_at(ir_in, rt, orig, dirs, path_length,
                                  ray_key)
                    b_ovf = jnp.bool_(False)
                m_ovf = sink.combined() if sink is not None \
                    else jnp.bool_(False)
            return _avg(tr), b_ovf, m_ovf
        chunk_fns[kk] = jax.jit(f)
        return chunk_fns[kk]

    def exact_chunk(ir_in, px, py, ck):
        if "exact" not in chunk_fns:
            def g(i, px_c, py_c, k):
                o, d = chunk_rays(px_c, py_c, k)
                rk = None if k is None else jax.random.fold_in(k, 1)
                return _avg(color_at(i, rt, o, d, path_length, rk))
            chunk_fns["exact"] = jax.jit(g)
        return np.asarray(chunk_fns["exact"](ir_in, px, py, ck))

    def render_chunk_single(ir_in, px, py, ck):
        buckets = calib["buckets"] if use_bucketed else ()
        res, b_ovf, m_ovf = jax.device_get(
            chunk_fn(buckets, use_shortlist)(ir_in, px, py, ck))
        if b_ovf:
            # exact per-level counts for THIS chunk; the escalated
            # buckets become the shared program for the rest of the run
            esc = _quantize(probe_counts(ir_in, px, py, ck), 1.2)
            buckets = tuple(max(a, b) for a, b in zip(buckets, esc))
            calib["buckets"] = buckets
            if calib.get("cache_key"):
                _bucket_cache_put(calib["cache_key"], buckets)
            print(f"bucket overflow: recalibrated to {buckets}",
                  flush=True)
            res, b_ovf, m_ovf = jax.device_get(
                chunk_fn(buckets, use_shortlist)(ir_in, px, py, ck))
        if m_ovf and not b_ovf:
            # some mesh ray unsettled within the shortlist rounds: the
            # full-fold program re-renders this chunk exactly
            res, b_ovf, _ = jax.device_get(
                chunk_fn(buckets, False)(ir_in, px, py, ck))
        if b_ovf:
            # probe ceiling exceeded (spawns > 3x primary): never
            # silent — the unrolled exact path re-renders the chunk
            print(f"bucket overflow persists (buckets={buckets}): chunk "
                  "re-rendered on the exact unrolled path", flush=True)
            res = exact_chunk(ir_in, px, py, ck)
        return res

    # ---- multi-device sharded chunk path (mesh is not None) -----------
    sharded_fns = {}

    def render_chunk_sharded(ir_in, px, py, chunk_key):
        """shard_map over the mesh's 'batch' axis: each device traces its
        own pixel shard with per-device static-bucket compaction (nonzero
        stays shard-local — no cross-device data movement until the final
        gather). Stochastic chunks fold the device index into the key so
        shards draw disjoint random streams."""
        import contextlib
        import os
        try:
            from jax import shard_map as _sm
        except ImportError:          # older jax
            from jax.experimental.shard_map import shard_map as _sm
        from jax.sharding import PartitionSpec as P

        def shard_map(f, **kw):
            # pallas_call inside shard_map cannot declare its outputs'
            # varying-across-mesh axes (ShapeDtypeStruct has no vma), so
            # the vma/replication check must be off for the bodies that
            # run the compaction/mesh kernels
            try:
                return _sm(f, check_vma=False, **kw)
            except TypeError:        # pre-0.9 jax: check_rep
                return _sm(f, check_rep=False, **kw)

        mesh_platform = mesh.devices.flat[0].platform

        def _kmode(env_var):
            # _mode() keyed off default_backend() mislowers when the
            # mesh's devices differ from the default backend (the axon
            # TPU plugin keeps default_backend()=="tpu" for a CPU mesh):
            # resolve the kernel mode from the MESH's platform instead
            v = os.environ.get(env_var, "auto")
            if v == "0":
                return "off"
            if mesh_platform == "tpu":
                return "tpu"
            return "interpret" if v in ("1", "interpret") else "off"

        @contextlib.contextmanager
        def mesh_kernel_modes():
            from ..ops import compact_pallas as _cp, mesh_pallas as _mp
            with _cp.override_mode(_kmode("FRT_COMPACT_PALLAS")), \
                 _mp.override_mode(_kmode("FRT_MESH_PALLAS")):
                yield
        from fast_ray_tracer_tpu.render.integrator import (
            spawn_counts, trace_bucketed,
        )
        ndev = int(np.prod(mesh.devices.shape))
        ir_spec = jax.tree_util.tree_map(lambda _: P(), ir_in)

        def local_rays(px_b, py_b, ck):
            if ck is not None:
                ck = jax.random.fold_in(ck, jax.lax.axis_index("batch"))
            o, d = chunk_rays(px_b, py_b, ck)
            rk = None if ck is None else jax.random.fold_in(ck, 1)
            return o, d, rk

        multi = jax.process_count() > 1

        def put_batch(*arrays):
            """Global 'batch'-sharded inputs. Multi-process: every host
            holds the same full array and contributes only the shards it
            addresses (jax.make_array_from_callback)."""
            if not multi:
                return arrays
            from jax.sharding import NamedSharding
            sh = NamedSharding(mesh, P("batch"))
            return tuple(
                jax.make_array_from_callback(a.shape, sh,
                                             lambda idx, _a=a: _a[idx])
                for a in arrays)

        def fetch(global_arr):
            """Full canvas on every host (one all-gather per chunk)."""
            if not multi:
                return np.asarray(global_arr)
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(global_arr,
                                                  tiled=True))

        if use_bucketed and "probe" not in sharded_fns:
            def probe_body(ir_b, px_b, py_b, ck):
                o, d, rk = local_rays(px_b, py_b, ck)
                c = spawn_counts(ir_b, rt, o, d, path_length, rk)
                c = jnp.stack(c) if c else jnp.zeros((0,), jnp.int32)
                # replicated max over devices -> every host reads the
                # same bucket sizes without touching remote shards
                return jax.lax.pmax(c, "batch")
            sharded_fns["probe"] = jax.jit(shard_map(
                probe_body, mesh=mesh,
                in_specs=(ir_spec, P("batch"), P("batch"), P()),
                out_specs=P()))

        px_g, py_g = put_batch(px, py)
        if use_bucketed:
            # one calibration for the whole render (first chunk + 1.35
            # margin), like the single-device path
            if "buckets" not in sharded_fns:
                with mesh_kernel_modes():
                    counts = np.asarray(
                        sharded_fns["probe"](ir_in, px_g, py_g, chunk_key))
                sharded_fns["buckets"] = tuple(
                    max(256, int(math.ceil(c * 1.35 / 1024)) * 1024)
                    for c in counts)
            buckets = sharded_fns["buckets"]
        else:
            buckets = ()

        if buckets not in sharded_fns:
            def render_body(ir_b, px_b, py_b, ck, _b=buckets):
                o, d, rk = local_rays(px_b, py_b, ck)
                if use_bucketed:
                    tr, ovf = trace_bucketed(ir_b, rt, o, d, path_length,
                                             rk, list(_b))
                else:
                    tr = color_at(ir_b, rt, o, d, path_length, rk)
                    ovf = jnp.bool_(False)
                return _avg(tr), jax.lax.pmax(ovf.astype(jnp.int32),
                                              "batch")
            sharded_fns[buckets] = jax.jit(shard_map(
                render_body, mesh=mesh,
                in_specs=(ir_spec, P("batch"), P("batch"), P()),
                out_specs=(P("batch"), P())))
        with mesh_kernel_modes():
            res, ovf = sharded_fns[buckets](ir_in, px_g, py_g, chunk_key)
        if use_bucketed and bool(np.asarray(ovf)):
            print(f"bucket overflow (buckets={buckets}): sharded chunk "
                  "re-rendered on the exact unrolled path", flush=True)
            if "exact" not in sharded_fns:
                def exact_body(ir_b, px_b, py_b, ck):
                    o, d, rk = local_rays(px_b, py_b, ck)
                    return _avg(color_at(ir_b, rt, o, d, path_length, rk))
                sharded_fns["exact"] = jax.jit(shard_map(
                    exact_body, mesh=mesh,
                    in_specs=(ir_spec, P("batch"), P("batch"), P()),
                    out_specs=P("batch")))
            with mesh_kernel_modes():
                res = sharded_fns["exact"](ir_in, px_g, py_g, chunk_key)
        return fetch(res)

    total = W * H
    if ir.meta.use_clusters:
        from ..ops import mesh_pallas
        # refractive clustered scenes run mesh_containers on the jnp fold
        # even when the Pallas intersector handles closest/shadow, so the
        # fold's memory profile governs whenever needs_hit_sort is set
        pallas_only = (mesh_pallas.enabled(ir, dtype, aux_planes=2)
                       and not ir.meta.needs_hit_sort)
        if pallas_only:
            # Pallas mesh path: the only per-ray mesh temps are the
            # (R, Nsc) shortlist masks — 4x bigger rays/chunk fit easily
            cap_rays = max(8192,
                           32768 // max(1, ir.meta.max_light_samples // 4))
        else:
            # jnp fold programs hold (blocks x B x Nc) and
            # (blocks x B x K*C) fold temps per level per light; beyond
            # ~8k rays/chunk the composed program OOMs device memory /
            # faults the remote TPU worker, so cap the chunk (and scale
            # down with per-light shadow samples)
            cap_rays = max(2048,
                           8192 // max(1, ir.meta.max_light_samples // 4))
        # the caps bound RAYS per chunk; each pixel launches S camera
        # samples, so divide the pixel cap by S (a 2x2-AA clustered chunk
        # previously reached 4x the intended ray batch)
        chunk_pixels = min(chunk_pixels, max(256, cap_rays // S))
    if mesh is not None:
        ndev = int(np.prod(mesh.devices.shape))
        chunk_pixels = -(-chunk_pixels // ndev) * ndev   # divisible shards
    xs = np.tile(np.arange(W, dtype=np.int32), H)
    ys = np.repeat(np.arange(H, dtype=np.int32), W)
    out = np.zeros((total, 3), dtype=np.float64)
    n_chunks = math.ceil(total / chunk_pixels)

    def chunk_arrays(c):
        lo = c * chunk_pixels
        hi = min(lo + chunk_pixels, total)
        # pad the tail chunk to the fixed chunk size (one compiled
        # program for every chunk)
        pad = chunk_pixels - (hi - lo)
        px = np.concatenate([xs[lo:hi], np.zeros(pad, np.int32)])
        py = np.concatenate([ys[lo:hi], np.zeros(pad, np.int32)])
        ck = None if key is None else jax.random.fold_in(key, c)
        return jnp.asarray(px), jnp.asarray(py), ck

    if use_bucketed and mesh is None:
        # ONE bucket calibration for the whole render: max per-level
        # spawn counts over five sampled chunks (the top of the image is
        # often background and alone would under-size every bucket),
        # 1.5x margin, one shared tuple for every chunk. The round-3
        # design probed and potentially recompiled per chunk — and each
        # escalation recompile of a big GI program costs minutes through
        # the remote-TPU tunnel, far more than a probe pass. The tuple
        # persists on disk beside the XLA compile cache, keyed by the
        # full scene content: a repeat render (the production regime the
        # compile cache already serves) skips the probes entirely, and a
        # stale entry only ever costs the existing overflow-escalation
        # path, which rewrites it.
        ck_hash = _bucket_cache_key(ir, rt.cfg, W, H, chunk_pixels,
                                    dtype, path_length)
        cached = _bucket_cache_get(ck_hash)
        if cached is not None:
            calib["buckets"] = cached
        else:
            with timer.phase("probe_buckets"):
                samples = sorted({0, n_chunks // 4, n_chunks // 2,
                                  (3 * n_chunks) // 4, n_chunks - 1})
                counts = [probe_counts(ir, *chunk_arrays(c))
                          for c in samples]
                calib["buckets"] = _quantize(
                    [max(v) for v in zip(*counts)], 1.5)
            _bucket_cache_put(ck_hash, calib["buckets"])
        calib["cache_key"] = ck_hash
    start_chunk = 0
    if checkpoint_path is not None:
        from fast_ray_tracer_tpu.parallel.checkpoint import (
            load_render_progress, save_render_progress,
        )
        snap = load_render_progress(checkpoint_path)
        if snap is not None and snap["total_chunks"] == n_chunks \
                and snap["canvas"].shape == (total, 3):
            out = snap["canvas"]
            start_chunk = snap["chunks_done"]
    chunk_phase = timer.phase("render_chunks", n=n_chunks - start_chunk)
    chunk_phase.__enter__()
    for c in range(start_chunk, n_chunks):
        lo = c * chunk_pixels
        hi = min(lo + chunk_pixels, total)
        fn = render_chunk_sharded if mesh is not None \
            else render_chunk_single
        res = fn(ir, *chunk_arrays(c))
        out[lo:hi] = np.asarray(res[: hi - lo], np.float64)
        if checkpoint_path is not None and (
                (c + 1) % checkpoint_every == 0 or c + 1 == n_chunks):
            save_render_progress(checkpoint_path, out, c + 1, n_chunks, None)
        if progress:
            print(f"chunk {c + 1}/{n_chunks}", flush=True)
    chunk_phase.__exit__(None, None, None)
    return out.reshape(H, W, 3)
