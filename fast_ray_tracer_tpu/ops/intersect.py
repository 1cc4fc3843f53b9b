"""Batched ray-primitive intersection.

The reference dispatches per-shape `local_intersect` function pointers while
walking a BVH tree per ray (src/shapes/*, src/renderer/world.c:163-197).
Here each primitive *type block* is intersected as one dense batched
computation over (rays x prims), and hit reduction happens with masked
min / top_k — no tree, no recursion, no dynamic allocation. Type-specific
epsilon behavior matches the C code (EPSILON=1e-5 `equal` tests for
degenerate quadratics, cap tests, Möller-Trumbore determinant cutoff).

Candidate layout: every analytic primitive contributes its type's maximum
intersection count (sphere/cube 2, plane 1, cylinder/cone/toroid 4 —
src/shapes/* xs scratch sizes) of t-slots, triangles one slot; misses are
+inf. Slot-to-primitive mapping is static per scene.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.constants import EPSILON
from fast_ray_tracer_tpu.ops.quartic import solve_quartic
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR


class Candidates(NamedTuple):
    t: jnp.ndarray          # (R, H) candidate hit distances, +inf = miss
    slot_prim: np.ndarray   # (H,) static: global primitive index per slot


def slot_tables(meta) -> np.ndarray:
    """Static slot -> global-prim-index map. Analytic blocks, plus dense
    triangle slots only when the mesh is small (no clustering)."""
    ids = []
    for typ, start, count in meta.type_ranges:
        k = IR.TYPE_MAX_HITS[typ]
        for p in range(start, start + count):
            ids.extend([p] * k)
    if not meta.use_clusters:
        ids.extend(range(meta.n_analytic, meta.n_analytic + meta.n_triangles))
    if not ids:
        # zero analytic prims + clustered mesh (e.g. cornell_box_water):
        # one dead slot (its t is always +inf) keeps every slot-indexed
        # gather in range; the mesh path supplies the real hits
        ids = [0]
    return np.asarray(ids, dtype=np.int32)


# ---------------------------------------------------------------------------
# per-type local intersectors: object-space rays (R, N, 3) -> t (R, N, k)
# ---------------------------------------------------------------------------

def _sphere_t(o, d):
    """src/shapes/sphere.c:13-39 (unit sphere at origin)."""
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(d * o, axis=-1)
    c = jnp.sum(o * o, axis=-1) - 1.0
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    # double-where grad guard: sqrt'(0)=inf at tangent hits / misses
    pos = disc > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    inv2a = 1.0 / (2.0 * a)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    inf = jnp.inf
    return jnp.stack([jnp.where(ok, t0, inf), jnp.where(ok, t1, inf)], -1)


def _plane_t(o, d):
    """src/shapes/plane.c:10-24 (xz plane)."""
    ok = jnp.abs(d[..., 1]) >= EPSILON
    t = -o[..., 1] / jnp.where(ok, d[..., 1], 1.0)
    return jnp.where(ok, t, jnp.inf)[..., None]


def _cube_t(o, d):
    """src/shapes/cube.c slab test, preserving the inf-handling semantics."""
    def axis(oc, dc):
        tmin_n = -1.0 - oc
        tmax_n = 1.0 - oc
        use_div = jnp.abs(dc) >= EPSILON
        safe = jnp.where(use_div, dc, 1.0)
        tmin = jnp.where(use_div, tmin_n / safe,
                         jnp.where(tmin_n < 0, -jnp.inf, jnp.inf))
        tmax = jnp.where(use_div, tmax_n / safe,
                         jnp.where(tmax_n < 0, -jnp.inf, jnp.inf))
        return jnp.minimum(tmin, tmax), jnp.maximum(tmin, tmax)

    xmin, xmax = axis(o[..., 0], d[..., 0])
    ymin, ymax = axis(o[..., 1], d[..., 1])
    zmin, zmax = axis(o[..., 2], d[..., 2])
    tmin = jnp.maximum(jnp.maximum(xmin, ymin), zmin)
    tmax = jnp.minimum(jnp.minimum(xmax, ymax), zmax)
    ok = tmin <= tmax
    inf = jnp.inf
    return jnp.stack([jnp.where(ok, tmin, inf), jnp.where(ok, tmax, inf)], -1)


def _cylinder_t(o, d, params):
    """src/shapes/cylinder.c:42-87 — body quadratic + caps."""
    mn, mx = params[..., 0], params[..., 1]
    closed = params[..., 2] > 0.5
    a = d[..., 0] ** 2 + d[..., 2] ** 2
    b = 2.0 * (o[..., 0] * d[..., 0] + o[..., 2] * d[..., 2])
    c = o[..., 0] ** 2 + o[..., 2] ** 2 - 1.0
    a_ok = jnp.abs(a) >= EPSILON       # equal(a, 0) test
    disc = b * b - 4.0 * a * c
    ok = a_ok & (disc >= 0.0)
    pos = disc > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    safe_a = jnp.where(a_ok, a, 1.0)
    t0 = (-b - sq) / (2.0 * safe_a)
    t1 = (-b + sq) / (2.0 * safe_a)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    y0 = o[..., 1] + lo * d[..., 1]
    y1 = o[..., 1] + hi * d[..., 1]
    inf = jnp.inf
    body0 = jnp.where(ok & (mn <= y0) & (y0 <= mx), lo, inf)
    body1 = jnp.where(ok & (mn <= y1) & (y1 <= mx), hi, inf)

    dy_ok = jnp.abs(d[..., 1]) >= EPSILON
    safe_dy = jnp.where(dy_ok, d[..., 1], 1.0)
    tc0 = (mn - o[..., 1]) / safe_dy
    tc1 = (mx - o[..., 1]) / safe_dy

    def in_cap(t):
        x = o[..., 0] + t * d[..., 0]
        z = o[..., 2] + t * d[..., 2]
        return x * x + z * z <= 1.0

    cap_ok = closed & dy_ok
    cap0 = jnp.where(cap_ok & in_cap(tc0), tc0, inf)
    cap1 = jnp.where(cap_ok & in_cap(tc1), tc1, inf)
    return jnp.stack([body0, body1, cap0, cap1], -1)


def _cone_t(o, d, params):
    """src/shapes/cone.c:42-97 — double cone + caps (|y| cap radius)."""
    mn, mx = params[..., 0], params[..., 1]
    closed = params[..., 2] > 0.5
    a = d[..., 0] ** 2 + d[..., 2] ** 2 - d[..., 1] ** 2
    b = 2.0 * (o[..., 0] * d[..., 0] + o[..., 2] * d[..., 2]
               - o[..., 1] * d[..., 1])
    c = o[..., 0] ** 2 + o[..., 2] ** 2 - o[..., 1] ** 2
    inf = jnp.inf

    a_zero = jnp.abs(a) < EPSILON
    b_zero = jnp.abs(b) < EPSILON
    t_lin = -c / jnp.where(b_zero, 1.0, 2.0 * b)
    lin0 = jnp.where(a_zero & ~b_zero, t_lin, inf)

    disc = b * b - 4.0 * a * c
    ok = ~a_zero & (disc >= 0.0)
    pos = disc > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    safe_a = jnp.where(a_zero, 1.0, a)
    t0 = (-b - sq) / (2.0 * safe_a)
    t1 = (-b + sq) / (2.0 * safe_a)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    y0 = o[..., 1] + lo * d[..., 1]
    y1 = o[..., 1] + hi * d[..., 1]
    # note strict inequalities for the cone body (cone.c:82-89)
    body0 = jnp.where(ok & (mn < y0) & (y0 < mx), lo, inf)
    body1 = jnp.where(ok & (mn < y1) & (y1 < mx), hi, inf)
    slot0 = jnp.where(a_zero, lin0, body0)
    slot1 = jnp.where(a_zero, inf, body1)

    dy_ok = jnp.abs(d[..., 1]) >= EPSILON
    safe_dy = jnp.where(dy_ok, d[..., 1], 1.0)
    tc0 = (mn - o[..., 1]) / safe_dy
    tc1 = (mx - o[..., 1]) / safe_dy

    def in_cap(t, y):
        x = o[..., 0] + t * d[..., 0]
        z = o[..., 2] + t * d[..., 2]
        return x * x + z * z <= jnp.abs(y)

    cap_ok = closed & dy_ok
    cap0 = jnp.where(cap_ok & in_cap(tc0, mn), tc0, inf)
    cap1 = jnp.where(cap_ok & in_cap(tc1, mx), tc1, inf)
    return jnp.stack([slot0, slot1, cap0, cap1], -1)


def _toroid_t(o, d, params):
    """src/shapes/toroid.c:14-52 — quartic solve (upcast to f64)."""
    dtype = o.dtype
    o64 = o.astype(jnp.float64)
    d64 = d.astype(jnp.float64)
    r1 = params[..., 0].astype(jnp.float64)
    r2 = params[..., 1].astype(jnp.float64)
    sum_d_sq = jnp.sum(d64 * d64, axis=-1)
    e = jnp.sum(o64 * o64, axis=-1) - r1 * r1 - r2 * r2
    f = jnp.sum(o64 * d64, axis=-1)
    four_a_sq = 4.0 * r1 * r1
    oy, dy = o64[..., 1], d64[..., 1]
    c0 = e * e - four_a_sq * (r2 * r2 - oy * oy)
    c1 = 4.0 * f * e + 2.0 * four_a_sq * oy * dy
    c2 = 2.0 * sum_d_sq * e + 4.0 * f * f + four_a_sq * dy * dy
    c3 = 4.0 * sum_d_sq * f
    c4 = sum_d_sq * sum_d_sq
    roots = solve_quartic(c0, c1, c2, c3, c4)
    return roots.astype(dtype)


def _triangle_t(orig, dirs, p1, e1, e2):
    """Möller-Trumbore (src/shapes/triangle.c:10-44), world space.

    orig/dirs: (R, 3); p1/e1/e2: (N, 3) -> t: (R, N).
    """
    d = dirs[:, None, :]                        # (R,1,3)
    o = orig[:, None, :]
    dce2 = jnp.cross(d, e2[None, :, :])          # (R,N,3)
    det = jnp.sum(e1[None] * dce2, axis=-1)      # (R,N)
    ok = jnp.abs(det) >= EPSILON
    f = 1.0 / jnp.where(ok, det, 1.0)
    p1o = o - p1[None]                           # (R,N,3)
    u = f * jnp.sum(p1o * dce2, axis=-1)
    ok &= (u >= 0.0) & (u <= 1.0)
    oce1 = jnp.cross(p1o, e1[None])
    v = f * jnp.sum(d * oce1, axis=-1)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * jnp.sum(e2[None] * oce1, axis=-1)
    return jnp.where(ok, t, jnp.inf), u, v


def triangle_uv_at(ir: SceneIR, tri_idx, orig, dirs):
    """Recompute barycentric (u, v) of the winning triangle hit per ray."""
    p1 = ir.tri_p1[tri_idx]
    e1 = ir.tri_e1[tri_idx]
    e2 = ir.tri_e2[tri_idx]
    dce2 = jnp.cross(dirs, e2)
    det = jnp.sum(e1 * dce2, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(det) >= EPSILON, det, 1.0)
    p1o = orig - p1
    u = f * jnp.sum(p1o * dce2, axis=-1)
    oce1 = jnp.cross(p1o, e1)
    v = f * jnp.sum(dirs * oce1, axis=-1)
    return u, v


# ---------------------------------------------------------------------------
# candidate assembly
# ---------------------------------------------------------------------------

def intersect_candidates(ir: SceneIR, orig, dirs) -> jnp.ndarray:
    """All candidate hit t values: (R, H), +inf for misses.

    Slot order matches slot_tables(meta).
    """
    meta = ir.meta
    if meta.use_clusters and meta.n_analytic == 0 and not meta.n_triangles:
        return jnp.full((orig.shape[0], 1), jnp.inf, orig.dtype)
    parts = []
    for typ, start, count in meta.type_ranges:
        inv = ir.inv_tf[start:start + count]          # (N,4,4)
        lin = inv[:, :3, :3]
        trans = inv[:, :3, 3]
        # object-space rays (R, N, 3) as one (R,3)x(3,3N) matmul per block
        # (W[j, n*3+i] = lin[n,i,j]); HIGHEST keeps true-f32 accumulation on
        # TPU (the default would drop to bf16 passes and wreck the 1e-5
        # epsilon tests)
        W = lin.transpose(2, 0, 1).reshape(3, count * 3)
        R = orig.shape[0]
        o = jnp.dot(orig, W,
                    precision=jax.lax.Precision.HIGHEST).reshape(R, count, 3) \
            + trans[None]
        d = jnp.dot(dirs, W,
                    precision=jax.lax.Precision.HIGHEST).reshape(R, count, 3)
        params = ir.prim_params[start:start + count][None]  # (1,N,4)
        if typ == IR.SPHERE:
            t = _sphere_t(o, d)
        elif typ == IR.PLANE:
            t = _plane_t(o, d)
        elif typ == IR.CUBE:
            t = _cube_t(o, d)
        elif typ == IR.CYLINDER:
            t = _cylinder_t(o, d, params)
        elif typ == IR.CONE:
            t = _cone_t(o, d, params)
        elif typ == IR.TOROID:
            t = _toroid_t(o, d, params)
        parts.append(t.reshape(t.shape[0], -1))
    if meta.n_triangles and not meta.use_clusters:
        t_tri, _, _ = _triangle_t(orig, dirs, ir.tri_p1, ir.tri_e1, ir.tri_e2)
        parts.append(t_tri)
    if not parts:
        return jnp.full((orig.shape[0], 1), jnp.inf, orig.dtype)
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# CSG filtering
# ---------------------------------------------------------------------------

def csg_static_tables(meta, slot_prim: np.ndarray, prim_csg, prim_anc,
                      prim_side):
    """Static per-tree slot lists and the postorder filter program.

    prim_csg/prim_anc/prim_side are sequences of PYTHON ints (arbitrary
    precision — trees of any node count, no 31-bit i32 mask cap): the
    per-node membership/side bits are resolved HERE into static (K,) bool
    arrays per program entry, so no bitmask ever reaches the device."""
    trees = []
    slot_csg = np.asarray([prim_csg[p] for p in slot_prim], np.int64)
    for t, prog in enumerate(meta.csg_trees):
        slots = np.nonzero(slot_csg == t)[0].astype(np.int32)
        tree_prims = slot_prim[slots]
        entries = []
        for e in prog:
            if e[0] == "c":
                _, nid, op = e
                in_node = np.asarray(
                    [(prim_anc[p] >> nid) & 1 == 1 for p in tree_prims])
                lhit = np.asarray(
                    [(prim_side[p] >> nid) & 1 == 0 for p in tree_prims])
                entries.append(("c", in_node, lhit, op))
            else:
                # branch index per tree-slot (-1 = not under this group)
                branch = np.full(len(slots), -1, np.int32)
                for b, prims in enumerate(e[1]):
                    for prim in prims:
                        branch[tree_prims == prim] = b
                entries.append(("g", len(e[1]), branch))
        trees.append((slots, tuple(entries)))
    return trees


_CSG_PAIRWISE_MAX = 16    # trees up to this many leaf slots take the
# sort-free pairwise path; larger trees (orrery gear: 40+) keep the
# argsort walk whose (R,K,K) pairwise matrix would dominate


def apply_csg_filter(t_cand, csg_tables, shadow: bool = False):
    """Kill intersections disallowed by the csg truth tables
    (csg_filter_intersections, src/shapes/csg.c:27-125).

    For each tree: sort the tree's candidate ts ascending (misses +inf sort
    last), then run the tree's POSTORDER program: at a csg node a
    surviving hit toggles the node's in-left/in-right state and is kept
    iff allowed by the op's truth table; children filter their own hits
    before the parent sees them, exactly like the recursive
    csg_local_intersect.

    shadow=True additionally applies the reference's stop_after_first_hit
    group truncation INSIDE csg trees (group.c:104-123): at each internal
    group, child subtrees after the first one that produced a t > 0 hit
    contribute nothing — is_shadowed sees a partially-built csg hit list
    (renderer.c:73-93 passes true)."""
    out = t_cand
    for slots, prog in csg_tables:
        K = len(slots)
        if K == 0:
            continue
        ts = out[:, slots]                                  # (R,K)
        if K <= _CSG_PAIRWISE_MAX:
            # Small trees take a sort-free pairwise path: the postorder
            # walk only needs, per candidate, the PARITY of each node's
            # left/right toggles among candidates strictly earlier in
            # the stable (t, slot-position) order — computable from the
            # (R,K,K) strict-predecessor matrix with dense compare/sum
            # ops. The argsort + permuted gathers + inverse-permutation
            # scatter of the general path cost ~0.9 s per 3.2M-ray
            # shadow batch on the Cornell box (variadic sorts are far
            # slower than dense passes on TPU); this path is exact and
            # bit-identical (same stable order, same truth tables).
            pos = jnp.arange(K)
            before = (ts[:, :, None] > ts[:, None, :]) \
                | ((ts[:, :, None] == ts[:, None, :])
                   & (pos[None, :, None] > pos[None, None, :]))  # j<i
            alive = jnp.isfinite(ts)
            for e in prog:
                if e[0] == "g":
                    if not shadow:
                        continue
                    n_branches, branch = e[1], e[2]
                    br = jnp.asarray(branch)
                    stopped = jnp.zeros(ts.shape[0], bool)
                    for b in range(n_branches):
                        member = br[None] == b
                        alive = alive & ~(member & stopped[:, None])
                        pos_b = jnp.any(member & alive & (ts > 0.0),
                                        axis=-1)
                        stopped = stopped | pos_b
                    continue
                _, in_node_static, lhit_static, op = e
                inn = alive & jnp.asarray(in_node_static)[None]
                lh = jnp.asarray(lhit_static)[None]
                l_tog = inn & lh
                r_tog = inn & ~lh
                inl = (jnp.sum((before & l_tog[:, None, :])
                               .astype(jnp.int32), -1) & 1) == 1
                inr = (jnp.sum((before & r_tog[:, None, :])
                               .astype(jnp.int32), -1) & 1) == 1
                if op == 0:        # union
                    allowed = (lh & ~inr) | (~lh & ~inl)
                elif op == 1:      # intersection
                    allowed = (lh & inr) | (~lh & inl)
                else:              # difference
                    allowed = (lh & ~inr) | (~lh & inl)
                alive = alive & (allowed | ~inn)
            out = out.at[:, slots].set(jnp.where(alive, ts, jnp.inf))
            continue
        order = jnp.argsort(ts, axis=-1)                    # ascending
        ts_s = jnp.take_along_axis(ts, order, axis=-1)
        alive = jnp.isfinite(ts_s)
        for e in prog:
            if e[0] == "g":
                if not shadow:
                    continue
                n_branches, branch = e[1], e[2]
                branch_s = jnp.asarray(branch)[order]       # (R,K)
                stopped = jnp.zeros(ts_s.shape[0], bool)
                for b in range(n_branches):
                    member = branch_s == b
                    alive = alive & ~(member & stopped[:, None])
                    pos_b = jnp.any(member & alive & (ts_s > 0), axis=-1)
                    stopped = stopped | pos_b
                continue
            _, in_node_static, lhit_static, op = e
            in_node = alive & jnp.asarray(in_node_static)[order]
            lhit = jnp.asarray(lhit_static)[order]
            l_tog = (in_node & lhit).astype(jnp.int32)
            r_tog = (in_node & ~lhit).astype(jnp.int32)
            inl = (jnp.cumsum(l_tog, axis=-1) - l_tog) % 2 == 1
            inr = (jnp.cumsum(r_tog, axis=-1) - r_tog) % 2 == 1
            if op == 0:        # union
                allowed = (lhit & ~inr) | (~lhit & ~inl)
            elif op == 1:      # intersection
                allowed = (lhit & inr) | (~lhit & inl)
            else:              # difference
                allowed = (lhit & ~inr) | (~lhit & inl)
            alive = alive & (allowed | ~in_node)
        ts_s = jnp.where(alive, ts_s, jnp.inf)
        # scatter back through the inverse permutation
        inv = jnp.argsort(order, axis=-1)
        ts_f = jnp.take_along_axis(ts_s, inv, axis=-1)
        out = out.at[:, slots].set(ts_f)
    return out


# ---------------------------------------------------------------------------
# clustered triangle mesh queries (large meshes)
# ---------------------------------------------------------------------------

def cluster_mask(ir: SceneIR, orig, dirs, line: bool = False):
    """Conservative ray-vs-cluster-AABB slab test: (mask (R, Nc) bool,
    entry t (R, Nc) — +inf where missed).

    Replaces the reference's per-ray BVH AABB walk (group.c:91-96,
    bounding_box.c:163-175) with one dense test over all clusters.

    line=True keeps boxes entirely behind the origin (tmax <= 0) — the
    reference's bounding_box_intersects has NO positivity test
    (bounding_box.c:165-175), and the refraction containers walk
    (renderer.c:406-447) runs over negative-t intersections too; the
    default drops them because only t > 0 can win a closest/shadow
    query."""
    d = dirs
    # finite saturated inverse: no 0-division NaN, conservative slabs
    tiny = 1e-12
    safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / safe                                    # (R,3)
    t1 = (ir.cluster_min[None] - orig[:, None]) * inv[:, None]   # (R,Nc,3)
    t2 = (ir.cluster_max[None] - orig[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    if line:
        hit = tmin <= tmax
        entry = jnp.where(hit, tmin, jnp.inf)
    else:
        hit = (tmin <= tmax) & (tmax > 0.0)
        entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    return hit, entry


_BIG_RANK = np.int32(np.iinfo(np.int32).max)   # host scalar: a module-
# level jnp constant would materialize on the import-time default device
# (the TPU tunnel) and block lowering when that device is busy
_GATHER_CLUSTERS = 128    # clusters gathered per merge round
_MESH_BLOCK_RAYS = 32     # rays per block (tight frusta, few live clusters)
_DEAD_ORIGIN = 1e30   # dead-lane sentinel: hits no cluster AABB

# Shortlist mode: inside a `mesh_shortlist()` context each fold processes
# only the first `rounds` rounds of the priority-sorted clusters and
# reports a per-fold "some ray unsettled" flag into the context's sink.
# The caller checks the OR of the flags once per chunk and re-renders the
# chunk with the exact full fold when it fires (render.py) — the same
# probe/overflow/fallback pattern the static-bucket wavefront uses. This
# is the lockstep analog of the reference's ordered per-ray BVH descent +
# early exit (src/shapes/group.c:91-147): near-to-far ordering settles
# almost every ray within a couple of rounds, and the few that don't are
# caught by the flag instead of a per-block dynamic loop (a vmapped
# while_loop early exit reproducibly faulted the TPU runtime in round 3).
_SHORTLIST = {"rounds": 0, "sink": None}
_SHORT_ROUNDS_DEFAULT = int(os.environ.get("FRT_MESH_SHORT_ROUNDS", "2"))


class _ShortlistSink:
    """Collects per-fold unsettled flags during tracing; `combined()`
    ORs them into one scalar for the chunk's overflow check."""

    def __init__(self):
        self.flags = []

    def combined(self):
        out = jnp.bool_(False)
        for f in self.flags:
            out = out | f
        return out


@contextmanager
def mesh_shortlist(rounds: int = None):
    """Enable shortlist mesh folds for the enclosed trace; yields the
    sink whose .combined() is the chunk's mesh-overflow flag."""
    sink = _ShortlistSink()
    prev = dict(_SHORTLIST)
    _SHORTLIST["rounds"] = _SHORT_ROUNDS_DEFAULT if rounds is None else rounds
    _SHORTLIST["sink"] = sink
    try:
        yield sink
    finally:
        _SHORTLIST.update(prev)


def shortlist_worthwhile(meta) -> bool:
    """Shortlist folds pay once the full fold spans several rounds (the
    cut saves (n_rounds - rounds)/n_rounds of all mesh work; tiny meshes
    fit in the shortlist anyway and would only add the fallback risk)."""
    if not meta.use_clusters:
        return False
    n_rounds = -(-meta.n_clusters // _GATHER_CLUSTERS)
    return n_rounds > max(1, _SHORT_ROUNDS_DEFAULT) + 1


def neutralize_rays(orig, dirs, active):
    """Park inactive lanes far outside every cluster AABB, pointing away,
    so the blocked cluster skip (and every intersector) sees clean misses
    (their shading contribution is masked anyway)."""
    a = active[:, None]
    return (jnp.where(a, orig, _DEAD_ORIGIN),
            jnp.where(a, dirs, jnp.ones((), dirs.dtype)))


def _mesh_gather_reduce(ir: SceneIR, orig, dirs, order_fn, init_fn,
                        chunk_fn, merge_fn, stop_fn, line: bool = False,
                        extra=()):
    """TPU-native clustered-mesh reduction over rounds of K clusters.

    Per ray block (vmapped — no serialized lax.map): order the live
    clusters by a query-specific priority (near-to-far entry t for
    closest-hit, min shadow-walk rank for shadow queries), then fold
    them in rounds of K clusters — each round gathers K*C triangles and
    runs one dense (B x K*C) Möller-Trumbore merged into a running
    monoid state. Outside a shortlist context all ceil(Nc/K) rounds run
    (exact for any cluster count); inside one, only `rounds` rounds run
    and rays whose state could still improve (stop_fn vs the per-ray
    suffix bound over the unprocessed clusters) raise the context's
    overflow flag.

    order_fn(mask (B,Nc), entry (B,Nc)) -> (priority (Nc,) ascending
    sort key over clusters, bound (B,Nc) per-ray per-cluster improvement
    bound); init_fn(B, dtype) -> state; chunk_fn(tri_idx, t, *extra_b)
    -> state; merge_fn(a, b) -> state; stop_fn(state, suffix_bound (B,))
    -> (B,) bool "this ray cannot improve from any remaining cluster"
    (None -> always run every round, no shortlist cut).

    line=True folds intersections of ANY sign (containers walk); the
    default masks to t > 0. `extra`: per-ray (R,)/(R,k) arrays blocked
    alongside the rays and passed to chunk_fn."""
    meta = ir.meta
    C = meta.cluster_size
    Nc = meta.n_clusters
    K = min(_GATHER_CLUSTERS, Nc)
    R = orig.shape[0]
    B = min(_MESH_BLOCK_RAYS, R)
    pad = (-R) % B
    if pad:
        orig = jnp.concatenate(
            [orig, jnp.full((pad, 3), _DEAD_ORIGIN, orig.dtype)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
        extra = tuple(jnp.concatenate(
            [e, jnp.zeros((pad,) + e.shape[1:], e.dtype)]) for e in extra)
    nblk = orig.shape[0] // B
    orig_b = orig.reshape(nblk, B, 3)
    dirs_b = dirs.reshape(nblk, B, 3)
    extra_b = tuple(e.reshape(nblk, B, *e.shape[1:]) for e in extra)
    arangeC = jnp.arange(C)
    n_rounds = -(-Nc // K)
    sink = _SHORTLIST["sink"]
    run_rounds = n_rounds
    if sink is not None and stop_fn is not None:
        run_rounds = min(max(1, _SHORTLIST["rounds"]), n_rounds)

    def block(o, d, *ex):
        mask, entry = cluster_mask(ir, o, d, line=line)   # (B,Nc)
        any_mask = jnp.any(mask, axis=0)                  # (Nc,)
        priority, bound = order_fn(mask, entry)
        # dead clusters sort last; live ones by ascending priority
        order = jnp.argsort(jnp.where(any_mask, priority, jnp.inf))
        pad_k = run_rounds * K - Nc
        sorted_live = any_mask[order]
        if pad_k > 0:
            order = jnp.concatenate(
                [order, jnp.zeros((pad_k,), order.dtype)])
            sorted_live = jnp.concatenate(
                [sorted_live, jnp.zeros((pad_k,), bool)])

        def fold_round(acc, r):
            ids = jax.lax.dynamic_slice(order, (r * K,), (K,))
            live = jax.lax.dynamic_slice(sorted_live, (r * K,), (K,))
            tri_idx = (ids[:, None] * C + arangeC[None]).reshape(-1)
            p1 = ir.tri_p1[tri_idx]
            e1 = ir.tri_e1[tri_idx]
            e2 = ir.tri_e2[tri_idx]
            t, _, _ = _triangle_t(o, d, p1, e1, e2)       # (B,K*C)
            valid = jnp.broadcast_to(live[:, None], (K, C)).reshape(-1)
            ok = valid[None] & jnp.isfinite(t)
            if not line:
                ok = ok & (t > 0.0)
            tmask = jnp.where(ok, t, jnp.inf)
            return merge_fn(acc, chunk_fn(tri_idx, tmask, *ex)), None

        acc = init_fn(B, o.dtype)
        if run_rounds <= 4:
            for r in range(run_rounds):
                acc, _ = fold_round(acc, jnp.int32(r))
        else:
            acc, _ = jax.lax.scan(fold_round, acc,
                                  jnp.arange(run_rounds, dtype=jnp.int32))
        if run_rounds < n_rounds:
            # per-ray best possible improvement among unprocessed
            # clusters; a ray whose state could still improve is
            # unsettled -> chunk overflow -> exact full-fold re-render.
            # (run_rounds < n_rounds implies run_rounds*K < Nc, so
            # `order` is unpadded here.)
            suffix = jnp.min(bound[:, order][:, run_rounds * K:], axis=-1)
            unsettled = ~stop_fn(acc, suffix)
            return acc, jnp.any(unsettled)
        return acc, jnp.bool_(False)

    # memory guard: the vmapped fold materializes (rays x K*C) Möller-
    # Trumbore intermediates per round; big ray batches (large render
    # chunks, adaptive photon batches) are serialized over groups of
    # blocks with lax.map so peak memory stays ~GROUP*B*K*C floats
    # regardless of R. The TPU budget is set high enough that normal
    # render chunks / photon batches never trigger the map — a program
    # whose mesh fold sat under lax.map reproducibly killed the TPU
    # worker on its SECOND execution (chunk 1 fine, chunk 2 "worker
    # crashed / kernel fault"), the same runtime-bug family as round 3's
    # while_loop early exit; CPU keeps the tight budget (f64 goldens
    # with million-ray photon batches genuinely need the bound)
    itemsize = jnp.dtype(orig.dtype).itemsize
    # budget = 75% of the device's memory limit (16 GB on v5e -> 12 GB,
    # the empirically safe bound), 1.5 GB on host CPU; override with
    # FRT_MESH_FOLD_BUDGET (bytes). tools/repro_laxmap_fault.py pins the
    # runtime fault the serialization path dodges.
    from fast_ray_tracer_tpu.utils import memory_budget
    budget = memory_budget(0.75, 1.5e9, "FRT_MESH_FOLD_BUDGET")
    group = max(1, int(budget / max(1, B * K * C * itemsize * 4)))
    if nblk <= group:
        out, unsettled = jax.vmap(block)(orig_b, dirs_b, *extra_b)
    else:
        pad_g = (-nblk) % group
        if pad_g:
            padder = lambda a, fill: jnp.concatenate(
                [a, jnp.full((pad_g,) + a.shape[1:], fill, a.dtype)])
            orig_b = padder(orig_b, _DEAD_ORIGIN)
            dirs_b = padder(dirs_b, jnp.ones((), dirs.dtype))
            extra_b = tuple(padder(e, 0) for e in extra_b)
        ng = orig_b.shape[0] // group
        gr = lambda a: a.reshape(ng, group, *a.shape[1:])
        out, unsettled = jax.lax.map(
            lambda args: jax.vmap(block)(*args),
            (gr(orig_b), gr(dirs_b), *map(gr, extra_b)))
        out = jax.tree_util.tree_map(
            lambda a: a.reshape(ng * group, *a.shape[2:])[:nblk], out)
        unsettled = unsettled.reshape(-1)[:nblk]
    if sink is not None and run_rounds < n_rounds:
        sink.flags.append(jnp.any(unsettled))
    return jax.tree_util.tree_map(
        lambda a: a.reshape(-1, *a.shape[2:])[:R]
        if a.ndim > 2 else a.reshape(-1)[:R], out)


def mesh_closest(ir: SceneIR, orig, dirs, keep=None):
    """Nearest positive triangle hit over the clustered mesh:
    (t (R,), tri_index (R,)); misses are t=inf. Clusters stream
    near-to-far (block-min entry t); a ray is settled once its best t is
    at or below every remaining cluster's entry t.

    `keep`: optional (Nt,) bool — triangles to consider; the photon
    pass's `hit(xs, /*filter_shadow_casters*/true)` (photon_tracer.c:190)
    needs the nearest CASTING hit, i.e. non-casting triangles are
    transparent to the query, not ray-killing."""
    from . import mesh_pallas
    if mesh_pallas.enabled(ir, orig.dtype, aux_planes=1):
        return mesh_pallas.closest(ir, orig, dirs, keep=keep)

    def order(mask, entry):
        return jnp.min(entry, axis=0), entry

    def init(B, dtype):
        return (jnp.full((B,), jnp.inf, dtype),
                jnp.zeros((B,), jnp.int32))

    def chunk(tri_idx, tpos):
        if keep is not None:
            tpos = jnp.where(keep[tri_idx][None], tpos, jnp.inf)
        tmin = jnp.min(tpos, axis=-1)
        idx = tri_idx[jnp.argmin(tpos, axis=-1)].astype(jnp.int32)
        return tmin, jnp.where(jnp.isfinite(tmin), idx, 0)

    def merge(a, b):
        upd = b[0] < a[0]
        return jnp.where(upd, b[0], a[0]), jnp.where(upd, b[1], a[1])

    def stop(acc, suffix_entry):
        return acc[0] <= suffix_entry

    return _mesh_gather_reduce(ir, orig, dirs, order, init, chunk, merge,
                               stop)


def mesh_shadow_reduce(ir: SceneIR, tri_rank, tri_shadow, orig, dirs):
    """Early-exit shadow components over the clustered mesh: per ray the
    minimum shadow-walk rank among triangles with a positive hit and the
    nearest positive casts-shadow t within that rank's leaf (see
    shadow_hit_early_exit). Clusters stream in ascending min-rank order;
    a ray is settled once its best rank is at or below every remaining
    cluster's min rank. Partial (rank, t) states merge
    rank-lexicographically (ranks are unique per leaf, so an equal-rank
    merge never mixes leaves)."""
    from . import mesh_pallas
    if mesh_pallas.enabled(ir, orig.dtype, aux_planes=2):
        return mesh_pallas.shadow(ir, tri_rank, tri_shadow, orig, dirs)
    C = ir.meta.cluster_size
    Nc = ir.meta.n_clusters
    cluster_rank = jnp.min(tri_rank.reshape(Nc, C), axis=-1)   # (Nc,)

    def order(mask, entry):
        bound = jnp.where(mask, cluster_rank[None].astype(entry.dtype),
                          jnp.inf)
        return cluster_rank.astype(entry.dtype), bound

    def init(B, dtype):
        return (jnp.full((B,), _BIG_RANK), jnp.full((B,), jnp.inf, dtype))

    def chunk(tri_idx, tpos):
        pos = jnp.isfinite(tpos)
        rk = jnp.where(pos, tri_rank[tri_idx][None], _BIG_RANK)  # (B,T)
        rmin = jnp.min(rk, axis=-1)
        sel = pos & (rk == rmin[:, None]) & tri_shadow[tri_idx][None]
        tsel = jnp.min(jnp.where(sel, tpos, jnp.inf), axis=-1)
        return rmin, tsel

    def merge(a, b):
        ra, ta = a
        rb, tb = b
        r = jnp.minimum(ra, rb)
        t = jnp.where(ra < rb, ta,
                      jnp.where(rb < ra, tb, jnp.minimum(ta, tb)))
        return r, t

    def stop(acc, suffix_rank):
        return acc[0].astype(suffix_rank.dtype) <= suffix_rank

    return _mesh_gather_reduce(ir, orig, dirs, order, init, chunk, merge,
                               stop)


def mesh_containers(ir: SceneIR, tri_ni, orig, dirs, t_hit, hit_tri):
    """Refraction-containers contribution of the clustered mesh.

    The reference containers walk (renderer.c:406-447) runs over the
    FULLY sorted intersection list, negative t included. A triangle
    contributes at most one intersection per ray (Möller-Trumbore), so
    its parity before the hit is simply "has an entry with t < t_hit",
    and the walk's candidate is the included entry with the LATEST t.
    The inclusive walk (n2) additionally counts the hit entry itself —
    for a mesh hit that is exactly the hit triangle (`hit_tri`, -1 when
    the hit is analytic). Folds ALL line-intersecting clusters
    (line=True — the reference's AABB test has no positivity cut,
    bounding_box.c:165-175).

    Returns (t1, ni1, t2, ni2): latest included entry t (-inf if none)
    and its material Ni for each walk; the caller merges against the
    dense-table walk by comparing ts."""
    def order(mask, entry):
        return jnp.min(entry, axis=0), entry    # full fold: order moot

    def init(B, dtype):
        neg = jnp.full((B,), -jnp.inf, dtype)
        one = jnp.ones((B,), dtype)
        return neg, one, neg, one

    def chunk(tri_idx, t, t_hit_b, hit_tri_b):
        fin = jnp.isfinite(t)
        ni = tri_ni[tri_idx]                               # (T,)
        inc1 = fin & (t < t_hit_b[:, None])
        inc2 = inc1 | (fin & (tri_idx[None] == hit_tri_b[:, None]))

        def pick(inc):
            tm = jnp.where(inc, t, -jnp.inf)
            best = jnp.max(tm, axis=-1)
            arg = jnp.argmax(tm, axis=-1)
            nib = jnp.where(jnp.isfinite(best), ni[arg], 1.0)
            return best, nib

        t1, n1 = pick(inc1)
        t2, n2 = pick(inc2)
        return t1, n1, t2, n2

    def merge(a, b):
        def later(ta, na_, tb, nb):
            upd = tb > ta
            return jnp.where(upd, tb, ta), jnp.where(upd, nb, na_)

        t1, n1 = later(a[0], a[1], b[0], b[1])
        t2, n2 = later(a[2], a[3], b[2], b[3])
        return t1, n1, t2, n2

    return _mesh_gather_reduce(
        ir, orig, dirs, order, init, chunk, merge, stop_fn=None,
        line=True, extra=(t_hit, hit_tri))


class Hit(NamedTuple):
    valid: jnp.ndarray      # (R,) bool
    t: jnp.ndarray          # (R,)
    prim: jnp.ndarray       # (R,) i32 global primitive index (0 if none)


def closest_hit(t_cand, slot_prim, mask=None) -> Hit:
    """First intersection with t > 0 (reference `hit()`,
    src/intersection/intersection.c:41-54). `mask`: (H,) slot filter."""
    t = jnp.where(t_cand > 0.0, t_cand, jnp.inf)
    if mask is not None:
        t = jnp.where(mask[None], t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    # t[argmin] == min exactly; min fuses into one reduction pass where
    # take_along_axis would add a per-row gather
    tbest = jnp.min(t, axis=-1)
    prim = jnp.asarray(slot_prim)[idx]
    return Hit(valid=jnp.isfinite(tbest), t=tbest, prim=prim)


def sorted_hits(t_cand, slot_prim, k: int):
    """K nearest intersections sorted ascending by t, *including negative t*
    (the refraction containers walk starts from the most-negative
    intersection — src/renderer/renderer.c:406-447 over the fully sorted xs).
    Returns (t_sorted (R,K), prim_sorted (R,K) with -1 padding)."""
    k = min(k, t_cand.shape[-1])
    # top_k(-t) is descending in -t, i.e. already ascending in t
    neg_t, idx = jax.lax.top_k(-t_cand, k)
    t_sorted = -neg_t
    prim = jnp.where(jnp.isfinite(t_sorted), jnp.asarray(slot_prim)[idx], -1)
    return t_sorted, prim


def containers_n1_n2(meta, t_cand, t_hit, prim_ni, with_entry_t=False):
    """Sort-free "containers" walk (renderer.c:406-447) over the dense
    candidate slots — replaces the former top_k + O(R*K^2) same-prim
    reduction with O(R*H) per-primitive parity/segmented-max.

    with_entry_t=True additionally returns each walk's latest included
    entry t (-inf when no object is inside) so the caller can merge with
    the clustered-mesh containers fold (mesh_containers) by lateness.

    Derivation: the reference walks the t-ascending intersection list up
    to the hit (exclusive for n1, inclusive for n2); an object is in the
    containers iff it has an odd number of entries so far, and n1/n2 is
    the Ni of the inside object whose latest entry is last in walk order
    (lexicographic (t, slot), ties in t resolved by top_k's stable
    index order — the hit entry is the FIRST slot with t == t_hit, so
    "strictly before the hit" is exactly t < t_hit). Candidate slots of a
    primitive are contiguous and static (slot_tables), so per-prim counts
    and last-entry keys are reshape reductions, not gathers."""
    R, H = t_cand.shape
    dtype = t_cand.dtype
    valid = jnp.isfinite(t_cand)
    slot_idx = jnp.arange(H, dtype=jnp.int32)
    is_hit = valid & (t_cand == t_hit[:, None])
    hit_slot = jnp.argmax(is_hit, axis=-1).astype(jnp.int32)
    before1 = valid & (t_cand < t_hit[:, None])
    before2 = before1 | (is_hit & (slot_idx[None] == hit_slot[:, None]))

    # static per-block layout: (offset, count, k) + global prim ids per col
    blocks = []
    off = 0
    prim_ids = []
    for typ, start, count in meta.type_ranges:
        k = IR.TYPE_MAX_HITS[typ]
        blocks.append((off, count, k))
        prim_ids.extend(range(start, start + count))
        off += count * k
    if meta.n_triangles and not meta.use_clusters:
        blocks.append((off, meta.n_triangles, 1))
        prim_ids.extend(range(meta.n_analytic,
                              meta.n_analytic + meta.n_triangles))
        off += meta.n_triangles
    ni_cols = prim_ni[np.asarray(prim_ids, np.int32)]          # (P,)

    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def solve(before):
        cnts, lts, lslots = [], [], []
        for boff, count, k in blocks:
            b = before[:, boff:boff + count * k].reshape(R, count, k)
            t = t_cand[:, boff:boff + count * k].reshape(R, count, k)
            sl = slot_idx[boff:boff + count * k].reshape(count, k)
            cnts.append(jnp.sum(b, axis=-1, dtype=jnp.int32))
            tm = jnp.where(b, t, neg_inf)
            lt = jnp.max(tm, axis=-1)
            lts.append(lt)
            lslots.append(jnp.max(
                jnp.where(tm == lt[..., None], sl[None], -1), axis=-1))
        cnt = jnp.concatenate(cnts, axis=-1)                   # (R,P)
        lt = jnp.concatenate(lts, axis=-1)
        lslot = jnp.concatenate(lslots, axis=-1)
        inside = (cnt & 1) == 1
        m = jnp.max(jnp.where(inside, lt, neg_inf), axis=-1)
        score = jnp.where(inside & (lt == m[:, None]), lslot, -1)
        best = jnp.argmax(score, axis=-1)
        any_in = jnp.max(score, axis=-1) >= 0
        ni = ni_cols[best]
        return jnp.where(any_in, ni, jnp.ones_like(ni)), \
            jnp.where(any_in, m, neg_inf)

    n1, m1 = solve(before1)
    n2, m2 = solve(before2)
    if with_entry_t:
        return n1, n2, m1, m2
    return n1, n2


def any_hit_within(t_cand, slot_shadow_mask, dist):
    """Physically-correct shadow test: any casts_shadow intersection with
    0 < t < dist. (Kept for the fast/PBR path; golden parity uses
    shadow_hit_early_exit.)"""
    ok = (t_cand > 0.0) & (t_cand < dist[..., None]) & slot_shadow_mask[None]
    return jnp.any(ok, axis=-1)


def shadow_hit_early_exit(t_cand, slot_rank, slot_shadow_mask, dist):
    """Reference-faithful shadow test (is_shadowed, renderer.c:73-93).

    The reference walks group children in post-divide array order with
    stop_after_first_hit=true: traversal stops at the FIRST leaf (in DFS
    order) yielding any t > 0 intersection (group.c:108-123), and only that
    leaf's hits reach `hit(xs, /*filter_shadow_casters*/true)`. Hence a
    non-blocking positive hit (e.g. a wall beyond the light) can mask a
    real closer blocker. Emulation: per ray, find the minimum shadow-walk
    rank among leaves with a positive hit; shadowed iff that leaf casts
    shadows and its nearest positive t < light distance.

    t_cand: (R,H); slot_rank: (H,) i32; slot_shadow_mask: (H,) bool;
    dist: (R,). Returns (R,) bool.
    """
    min_rank, cast_t = shadow_components(t_cand, slot_rank,
                                         slot_shadow_mask)
    return cast_t < dist


def shadow_components(t_cand, slot_rank, slot_shadow_mask):
    """Per ray: (min shadow-walk rank among positive hits, nearest positive
    *casts_shadow* t within that leaf — inf if the stopping leaf has no
    casting hit). The walk stops on ANY positive hit, but `hit(xs, true)`
    then only considers shadow casters (intersection.c:41-54); for a csg
    leaf with mixed materials those differ."""
    tpos = jnp.where(t_cand > 0.0, t_cand, jnp.inf)
    valid = jnp.isfinite(tpos)
    big = jnp.iinfo(jnp.int32).max
    rank = jnp.where(valid, slot_rank[None], big)
    min_rank = jnp.min(rank, axis=-1)                       # (R,)
    sel = valid & (rank == min_rank[:, None]) & slot_shadow_mask[None]
    cast_t = jnp.min(jnp.where(sel, tpos, jnp.inf), axis=-1)
    return min_rank, cast_t
