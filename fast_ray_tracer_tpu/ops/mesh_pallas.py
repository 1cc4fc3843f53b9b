"""VMEM-resident Pallas clustered-mesh intersector (TPU).

The reference answers mesh queries with a per-ray recursive BVH descent
(src/shapes/group.c:91-147) — branchy pointer chasing that maps badly to
a vector unit.  The jnp fold in ops/intersect.py (_mesh_gather_reduce)
replaced it with rounds of HBM gathers of 128-cluster slabs, but random
gathers on this chip run at a fixed ~0.33 G rows/s, so every fold round
pays ~8k gathered triangle rows per 32-ray block whether or not the rays
need them.

This kernel removes the gathers entirely:

 * the whole triangle soup lives in VMEM for the duration of the grid
   (9 component planes of shape (Nsc, 128) with a constant index_map —
   ~4.6 MB for the 141k-triangle bench mesh, well under the ~16 MB/core
   budget; larger meshes fall back to the jnp fold),
 * XLA-side, per 32-ray block, a vectorized slab test against the
   supercluster AABBs (pairs of adjacent Morton-ordered 64-triangle
   clusters) produces a COMPACTED, near-to-far-ordered shortlist of live
   supercluster ids — the lockstep analog of the reference's ordered
   BVH descent,
 * the kernel folds ONLY the shortlisted superclusters: a dynamic-bound
   fori_loop reads one (1, 128) row slab per component per supercluster
   and runs a (32, 128) Möller-Trumbore (triangle.c:10-44 semantics,
   identical predicate chain to intersect._triangle_t) merged into a
   running monoid carry.

Exactness: unlike the shortlist fold (FRT_MESH_SHORT_ROUNDS + overflow
re-render), every live supercluster is folded, so results are exact and
no fallback probe is needed.

Gate: FRT_MESH_PALLAS = auto (default, on for the TPU backend) | 0 (off)
| 1 / interpret (on everywhere, interpreter mode off-TPU — used by the
CPU parity tests).
"""

import contextlib
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON

_mode_override = None     # set via override_mode(); beats env + backend


@contextlib.contextmanager
def override_mode(mode):
    """Force the kernel mode for code traced inside the context: "off"
    disables, "interpret"/"tpu" force that lowering. Used by the sharded
    render path when the mesh's devices are not the default backend (the
    axon TPU plugin keeps default_backend()=="tpu" even for CPU meshes)."""
    global _mode_override
    prev = _mode_override
    _mode_override = mode
    try:
        yield
    finally:
        _mode_override = prev

SC = 128                 # triangles per supercluster (2 clusters of 64)
BLOCK_RAYS = 32          # rays per kernel grid step
_BIG = 1e30              # empty-box / dead-rank sentinel (finite: no NaNs)


def _vmem_budget():
    """Resident bytes cap for the VMEM-resident kernel; larger meshes
    stream supercluster rows HBM->VMEM instead (see _stream_call).
    Override: FRT_MESH_PALLAS_VMEM (bytes)."""
    return int(float(os.environ.get("FRT_MESH_PALLAS_VMEM",
                                    8 * 1024 * 1024)))


_STREAM_BUFS = 8         # DMA ring depth for the streaming kernel


def _mode():
    if _mode_override is not None:
        return None if _mode_override in ("off", "0") else _mode_override
    v = os.environ.get("FRT_MESH_PALLAS", "auto")
    if v == "0":
        return None
    if jax.default_backend() == "tpu":
        return "tpu"
    if v in ("1", "interpret"):
        return "interpret"
    return None


def enabled(ir, dtype, aux_planes: int) -> bool:
    """Pallas path applies: TPU (or forced interpret), f32 rays, and the
    resident planes (9 triangle components + aux) fit the VMEM budget.

    Shadow ranks ride an f32 plane in the kernel, so they must be exact
    f32 integers: ranks are DFS visit positions over document leaves
    (divide.shadow_ranks), bounded by the leaf count <= n_analytic +
    n_triangles — gate on that bound staying under 2^24."""
    meta = ir.meta
    if not meta.use_clusters or _mode() is None:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if meta.n_analytic + meta.n_triangles >= 2 ** 24:
        return False
    # beyond the resident budget the STREAMING kernel takes over (ring-
    # buffered per-supercluster DMA) — no size cliff at the VMEM budget,
    # matching group.c which has none; the cap is the per-block SMEM
    # shortlist (1, Nsc) i32 staying comfortably inside scalar memory
    nsc = -(-meta.n_clusters * meta.cluster_size // SC)
    return nsc <= 16384            # ~2.1M triangles


def _resident_fits(ir, aux_planes: int) -> bool:
    meta = ir.meta
    nsc = -(-meta.n_clusters * meta.cluster_size // SC)
    return (9 + aux_planes) * nsc * SC * 4 <= _vmem_budget()


# ---------------------------------------------------------------------------
# packing (in-trace: pure reshapes of SceneIR tensors, fused away by XLA)
# ---------------------------------------------------------------------------

def _pack_tris(ir):
    """(9, Nsc, SC) component planes [p1|e1|e2 x xyz] padded with
    degenerate triangles (zero edges -> det 0 -> never a hit)."""
    nt = ir.tri_p1.shape[0]
    nsc = -(-nt // SC)
    pad = nsc * SC - nt

    def plane(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)])
        return a.reshape(nsc, SC, 3)

    p1, e1, e2 = plane(ir.tri_p1), plane(ir.tri_e1), plane(ir.tri_e2)
    return jnp.stack([p1[..., 0], p1[..., 1], p1[..., 2],
                      e1[..., 0], e1[..., 1], e1[..., 2],
                      e2[..., 0], e2[..., 1], e2[..., 2]])


def _pack_plane(ir, vals, fill=0.0):
    """(Nt,) per-triangle scalar -> (Nsc, SC) f32 plane."""
    nt = vals.shape[0]
    nsc = -(-nt // SC)
    pad = nsc * SC - nt
    v = vals.astype(jnp.float32)
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), fill, jnp.float32)])
    return v.reshape(nsc, SC)


def _sc_boxes(ir):
    """Supercluster AABBs: union of each pair of adjacent clusters
    (Morton order keeps pairs spatially tight). (Nsc, 3) min / max."""
    per = SC // ir.meta.cluster_size
    nc = ir.meta.n_clusters
    nsc = -(-nc // per)
    pad = nsc * per - nc
    cmin, cmax = ir.cluster_min, ir.cluster_max
    if pad:
        cmin = jnp.concatenate([cmin, jnp.full((pad, 3), _BIG, cmin.dtype)])
        cmax = jnp.concatenate([cmax, jnp.full((pad, 3), -_BIG, cmax.dtype)])
    return (cmin.reshape(nsc, per, 3).min(axis=1),
            cmax.reshape(nsc, per, 3).max(axis=1))


def _shortlist(ir, orig, dirs, priority=None):
    """Per-block compacted shortlist. orig/dirs: (nblk*B, 3).

    Returns ids (nblk, Nsc) i32 — live supercluster ids sorted by
    ascending `priority` (default: per-block min slab-entry t, i.e.
    near-to-far) followed by dead ids — and counts (nblk, 1) i32."""
    sc_min, sc_max = _sc_boxes(ir)
    tiny = 1e-12
    d = dirs
    safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / safe
    t1 = (sc_min[None] - orig[:, None]) * inv[:, None]      # (R,Nsc,3)
    t2 = (sc_max[None] - orig[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmin <= tmax) & (tmax > 0.0)
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    nsc = sc_min.shape[0]
    hb = hit.reshape(-1, BLOCK_RAYS, nsc)
    eb = entry.reshape(-1, BLOCK_RAYS, nsc)
    live = hb.any(axis=1)                                   # (nblk,Nsc)
    if priority is None:
        key = eb.min(axis=1)                                # near-to-far
    else:
        key = jnp.broadcast_to(priority[None], live.shape)
    key = jnp.where(live, key, jnp.inf)
    ids = jnp.argsort(key, axis=-1).astype(jnp.int32)
    counts = live.sum(axis=-1, dtype=jnp.int32)[:, None, None]
    return ids[:, None, :], counts


def _block_rays(orig, dirs):
    """Pad to a BLOCK_RAYS multiple (dead lanes parked at _BIG miss every
    AABB) and pack as (nblk, B, 8) [ox oy oz dx dy dz 0 0]."""
    r = orig.shape[0]
    pad = (-r) % BLOCK_RAYS
    if pad:
        orig = jnp.concatenate(
            [orig, jnp.full((pad, 3), _BIG, orig.dtype)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
    packed = jnp.concatenate(
        [orig, dirs, jnp.zeros((orig.shape[0], 2), orig.dtype)], axis=-1)
    return packed.reshape(-1, BLOCK_RAYS, 8), orig, dirs


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _mt_rows(rays_ref, tris_ref, s):
    """(B, SC) Möller-Trumbore for supercluster s: (t-masked-with-ok,
    raw ok mask). Predicate chain identical to intersect._triangle_t
    (triangle.c:10-44)."""
    row = pl.ds(s, 1)
    return _mt_core(rays_ref,
                    [tris_ref[c, row, :] for c in range(9)])


def _mt_core(rays_ref, comp):
    """Möller-Trumbore of the block's rays against 9 loaded component
    rows comp = [p1x..e2z] each (1, SC) -> (t, ok) of (B, SC)."""
    ox = rays_ref[0, :, 0:1]
    oy = rays_ref[0, :, 1:2]
    oz = rays_ref[0, :, 2:3]
    dx = rays_ref[0, :, 3:4]
    dy = rays_ref[0, :, 4:5]
    dz = rays_ref[0, :, 5:6]
    p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z = comp
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= EPSILON
    f = 1.0 / jnp.where(ok, det, 1.0)
    tx = ox - p1x
    ty = oy - p1y
    tz = oz - p1z
    u = f * (tx * px + ty * py + tz * pz)
    ok &= (u >= 0.0) & (u <= 1.0)
    # qvec = p1o x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    return t, ok


def _closest_kernel(rays_ref, ids_ref, cnt_ref, tris_ref, keep_ref,
                    t_ref, i_ref, *, with_keep):
    def body(k, carry):
        best_t, best_i = carry
        s = ids_ref[0, 0, k]
        t, ok = _mt_rows(rays_ref, tris_ref, s)
        ok &= t > 0.0
        if with_keep:
            ok &= keep_ref[pl.ds(s, 1), :] > 0.0
        tm = jnp.where(ok, t, jnp.inf)
        rm = jnp.min(tm, axis=1, keepdims=True)              # (B,1)
        lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
        am = jnp.min(jnp.where(tm == rm, lane, SC), axis=1, keepdims=True)
        upd = rm < best_t
        return (jnp.where(upd, rm, best_t),
                jnp.where(upd, s * SC + am, best_i))

    b = rays_ref.shape[1]
    init = (jnp.full((b, 1), jnp.inf, jnp.float32),
            jnp.zeros((b, 1), jnp.int32))
    best_t, best_i = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, init)
    t_ref[0] = best_t
    i_ref[0] = best_i


def _shadow_kernel(rays_ref, ids_ref, cnt_ref, tris_ref, rank_ref,
                   cast_ref, r_ref, t_ref):
    def body(k, carry):
        acc_r, acc_t = carry
        s = ids_ref[0, 0, k]
        t, ok = _mt_rows(rays_ref, tris_ref, s)
        ok &= t > 0.0
        rank = rank_ref[pl.ds(s, 1), :]                      # (1,SC)
        rk = jnp.where(ok, rank, _BIG)
        rmin = jnp.min(rk, axis=1, keepdims=True)            # (B,1)
        sel = ok & (rk == rmin) & (cast_ref[pl.ds(s, 1), :] > 0.0)
        tsel = jnp.min(jnp.where(sel, t, jnp.inf), axis=1, keepdims=True)
        # rank-lexicographic merge (ranks unique per leaf, so an
        # equal-rank merge never mixes leaves)
        lt = rmin < acc_r
        eq = rmin == acc_r
        acc_t = jnp.where(lt, tsel,
                          jnp.where(eq, jnp.minimum(acc_t, tsel), acc_t))
        return jnp.minimum(acc_r, rmin), acc_t

    b = rays_ref.shape[1]
    init = (jnp.full((b, 1), _BIG, jnp.float32),
            jnp.full((b, 1), jnp.inf, jnp.float32))
    acc_r, acc_t = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, init)
    r_ref[0] = acc_r
    t_ref[0] = acc_t


# ---------------------------------------------------------------------------
# streaming kernels (soup larger than VMEM: ring-buffered HBM->VMEM DMA)
# ---------------------------------------------------------------------------

def _ring(ids_ref, hbm_refs, bufs, sems):
    """DMA descriptors for one ring slot: shortlist entry k's supercluster
    row of every streamed plane. hbm_refs[0] is the (9, Nsc, SC) triangle
    planes (strided 9-segment copy, 512 B per segment); the rest are
    (Nsc, SC) aux planes."""
    def make(slot, k):
        s = ids_ref[0, 0, k]
        out = [pltpu.make_async_copy(hbm_refs[0].at[:, pl.ds(s, 1), :],
                                     bufs[0].at[slot], sems[0].at[slot])]
        for h, b, sem in zip(hbm_refs[1:], bufs[1:], sems[1:]):
            out.append(pltpu.make_async_copy(h.at[pl.ds(s, 1), :],
                                             b.at[slot], sem.at[slot]))
        return out
    return make


def _stream_fold(rays_ref, ids_ref, cnt_ref, hbm_refs, bufs, sems,
                 init, step):
    """Shared ring-buffered fold over the block's shortlist: DMA entry
    k+_STREAM_BUFS into slot k%_STREAM_BUFS after consuming entry k, so
    up to _STREAM_BUFS copies stay in flight while the VPU runs the
    Möller-Trumbore merge. `step(carry, s, comp, aux)` consumes the
    loaded rows."""
    n = cnt_ref[0, 0, 0]
    make = _ring(ids_ref, hbm_refs, bufs, sems)

    for w in range(_STREAM_BUFS):
        @pl.when(w < n)
        def _(w=w):
            for dma in make(w, w):
                dma.start()

    def body(k, carry):
        slot = jax.lax.rem(k, jnp.asarray(_STREAM_BUFS, k.dtype))
        for dma in make(slot, k):
            dma.wait()
        s = ids_ref[0, 0, k]
        comp = [bufs[0][slot, c] for c in range(9)]
        aux = [b[slot] for b in bufs[1:]]
        carry = step(carry, s, comp, aux)
        nxt = k + _STREAM_BUFS

        @pl.when(nxt < n)
        def _():
            for dma in make(slot, nxt):
                dma.start()
        return carry

    return jax.lax.fori_loop(0, n, body, init)


def _stream_closest_kernel(rays_ref, ids_ref, cnt_ref, tris_hbm, *rest,
                           with_keep):
    if with_keep:
        keep_hbm, t_ref, i_ref, tbuf, kbuf, tsem, ksem = rest
        hbm_refs, bufs, sems = [tris_hbm, keep_hbm], [tbuf, kbuf], \
            [tsem, ksem]
    else:
        t_ref, i_ref, tbuf, tsem = rest
        hbm_refs, bufs, sems = [tris_hbm], [tbuf], [tsem]

    def step(carry, s, comp, aux):
        best_t, best_i = carry
        t, ok = _mt_core(rays_ref, comp)
        ok &= t > 0.0
        if with_keep:
            ok &= aux[0] > 0.0
        tm = jnp.where(ok, t, jnp.inf)
        rm = jnp.min(tm, axis=1, keepdims=True)              # (B,1)
        lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
        am = jnp.min(jnp.where(tm == rm, lane, SC), axis=1, keepdims=True)
        upd = rm < best_t
        return (jnp.where(upd, rm, best_t),
                jnp.where(upd, s * SC + am, best_i))

    b = rays_ref.shape[1]
    init = (jnp.full((b, 1), jnp.inf, jnp.float32),
            jnp.zeros((b, 1), jnp.int32))
    best_t, best_i = _stream_fold(rays_ref, ids_ref, cnt_ref, hbm_refs,
                                  bufs, sems, init, step)
    t_ref[0] = best_t
    i_ref[0] = best_i


def _stream_shadow_kernel(rays_ref, ids_ref, cnt_ref, tris_hbm, rank_hbm,
                          cast_hbm, r_ref, t_ref, tbuf, rbuf, cbuf,
                          tsem, rsem, csem):
    def step(carry, s, comp, aux):
        acc_r, acc_t = carry
        t, ok = _mt_core(rays_ref, comp)
        ok &= t > 0.0
        rk = jnp.where(ok, aux[0], _BIG)
        rmin = jnp.min(rk, axis=1, keepdims=True)            # (B,1)
        sel = ok & (rk == rmin) & (aux[1] > 0.0)
        tsel = jnp.min(jnp.where(sel, t, jnp.inf), axis=1, keepdims=True)
        lt = rmin < acc_r
        eq = rmin == acc_r
        acc_t = jnp.where(lt, tsel,
                          jnp.where(eq, jnp.minimum(acc_t, tsel), acc_t))
        return jnp.minimum(acc_r, rmin), acc_t

    b = rays_ref.shape[1]
    init = (jnp.full((b, 1), _BIG, jnp.float32),
            jnp.full((b, 1), jnp.inf, jnp.float32))
    acc_r, acc_t = _stream_fold(
        rays_ref, ids_ref, cnt_ref, [tris_hbm, rank_hbm, cast_hbm],
        [tbuf, rbuf, cbuf], [tsem, rsem, csem], init, step)
    r_ref[0] = acc_r
    t_ref[0] = acc_t


def _stream_call(kernel, rays, ids, counts, tris, aux, n_out_i32):
    """pallas_call wrapper for the streaming kernels: triangle planes and
    aux planes stay OFF-chip (memory_space ANY); per-block VMEM holds
    only the ray block, the SMEM shortlist, and the DMA ring buffers."""
    nblk = rays.shape[0]
    nsc = tris.shape[1]
    NB = _STREAM_BUFS
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, BLOCK_RAYS, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        any_spec,
    ] + [any_spec for _ in aux]
    out_specs = tuple(
        pl.BlockSpec((1, BLOCK_RAYS, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM) for _ in range(2))
    out_shape = tuple(
        jax.ShapeDtypeStruct((nblk, BLOCK_RAYS, 1),
                             jnp.int32 if k >= 2 - n_out_i32 else jnp.float32)
        for k in range(2))
    scratch = [pltpu.VMEM((NB, 9, 1, SC), jnp.float32)]
    scratch += [pltpu.VMEM((NB, 1, SC), jnp.float32) for _ in aux]
    scratch += [pltpu.SemaphoreType.DMA((NB,)) for _ in range(1 + len(aux))]
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_mode() == "interpret",
    )(rays, ids, counts, tris, *aux)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _call(kernel, rays, ids, counts, tris, aux, n_out_i32):
    nblk = rays.shape[0]
    nsc = tris.shape[1]

    def const(shape):
        # constant index_map: the block stays VMEM-resident across the
        # whole grid (no per-step re-DMA of the triangle soup)
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, BLOCK_RAYS, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        const((9, nsc, SC)),
    ] + [const((nsc, SC)) for _ in aux]
    out_specs = tuple(
        pl.BlockSpec((1, BLOCK_RAYS, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM) for _ in range(2))
    # outputs ordered (f32..., i32...) per kernel signature; n_out_i32
    # counts from the BACK (closest: t then idx -> 1 trailing i32)
    out_shape = tuple(
        jax.ShapeDtypeStruct((nblk, BLOCK_RAYS, 1),
                             jnp.int32 if k >= 2 - n_out_i32 else jnp.float32)
        for k in range(2))
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_mode() == "interpret",
    )(rays, ids, counts, tris, *aux)


def closest(ir, orig, dirs, keep=None):
    """Pallas nearest positive triangle hit: (t (R,), tri_index (R,));
    misses t=inf. Drop-in for intersect.mesh_closest on TPU/f32.
    Soups within the VMEM budget run fully resident; larger soups stream
    supercluster rows through a DMA ring (_stream_call)."""
    r = orig.shape[0]
    rays, orig_p, dirs_p = _block_rays(orig, dirs)
    ids, counts = _shortlist(ir, orig_p, dirs_p)
    tris = _pack_tris(ir)
    with_keep = keep is not None
    aux = (_pack_plane(ir, keep, fill=0.0),) if with_keep else ()
    if _resident_fits(ir, 1 if with_keep else 0):
        if with_keep:
            kern = functools.partial(_closest_kernel, with_keep=True)
        else:
            def kern(ra, idr, cn, tr, t_ref, i_ref):
                _closest_kernel(ra, idr, cn, tr, None, t_ref, i_ref,
                                with_keep=False)
        t, idx = _call(kern, rays, ids, counts, tris, aux, n_out_i32=1)
    else:
        kern = functools.partial(_stream_closest_kernel,
                                 with_keep=with_keep)
        t, idx = _stream_call(kern, rays, ids, counts, tris, aux,
                              n_out_i32=1)
    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    # padded-triangle defense (degenerate pads can't hit) + miss idx 0
    return t, jnp.where(jnp.isfinite(t), idx, 0)


def shadow(ir, tri_rank, tri_shadow, orig, dirs):
    """Pallas early-exit shadow components: (min rank (R,) i32 —
    _BIG_RANK when none, nearest casting t within that rank (R,)).
    Drop-in for intersect.mesh_shadow_reduce on TPU/f32.

    tri_rank must be exactly representable in f32 (< 2^24): enabled()
    gates the whole Pallas path on n_analytic + n_triangles < 2^24,
    which bounds every DFS leaf rank."""
    r = orig.shape[0]
    rays, orig_p, dirs_p = _block_rays(orig, dirs)
    c = ir.meta.cluster_size
    nc = ir.meta.n_clusters
    cluster_rank = jnp.min(
        tri_rank.reshape(nc, c), axis=-1).astype(jnp.float32)
    per = SC // c
    pad = (-nc) % per
    if pad:
        cluster_rank = jnp.concatenate(
            [cluster_rank, jnp.full((pad,), _BIG, jnp.float32)])
    sc_rank = cluster_rank.reshape(-1, per).min(axis=1)
    ids, counts = _shortlist(ir, orig_p, dirs_p, priority=sc_rank)
    tris = _pack_tris(ir)
    aux = (_pack_plane(ir, tri_rank, fill=_BIG),
           _pack_plane(ir, tri_shadow, fill=0.0))
    if _resident_fits(ir, 2):
        rk, t = _call(_shadow_kernel, rays, ids, counts, tris, aux,
                      n_out_i32=0)
    else:
        rk, t = _stream_call(_stream_shadow_kernel, rays, ids, counts,
                             tris, aux, n_out_i32=0)
    rk = rk.reshape(-1)[:r]
    t = t.reshape(-1)[:r]
    big = np.int32(np.iinfo(np.int32).max)
    rank_i = jnp.where(rk < 1e9, rk, 0.0).astype(jnp.int32)
    return jnp.where(rk < 1e9, rank_i, big), t
