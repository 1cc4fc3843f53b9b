"""The Whitted integrator, batched and statically unrolled.

The reference recurses per ray: color_at -> shade_hit -> reflected_color/
refracted_color -> color_at (src/renderer/renderer.c:347-827). Here
color_at evaluates a whole ray batch at once and the recursion is unrolled
`remaining` times at trace time, with whole subtrees pruned statically when
no scene material is reflective/transparent (meta.has_reflective /
has_refractive) — a teapot scene costs one intersection pass per sample,
glass scenes cost the full 2^depth wavefront, every pass masked per lane.

Color bookkeeping matches the ColorTriple design exactly: ambient, diffuse
and specular accumulate in separate channels through the recursion and the
final pixel is (A + D + S) / 3 (renderer.c:226-230, color.h:24-26).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.constants import EPSILON, SQRT3
from fast_ray_tracer_tpu.ops.intersect import (
    Hit, apply_csg_filter, closest_hit, containers_n1_n2,
    csg_static_tables, intersect_candidates, mesh_closest,
    mesh_containers, mesh_shadow_reduce, neutralize_rays,
    shadow_components, shadow_hit_early_exit, slot_tables, triangle_uv_at,
)
from fast_ray_tracer_tpu.ops import compact_pallas
from fast_ray_tracer_tpu.ops.patterns import ShapeCtx, build_shape_ctx, eval_pattern
from fast_ray_tracer_tpu.render.normals import normal_at
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR
from fast_ray_tracer_tpu.scene.model import ConfigDesc


class Triple(NamedTuple):
    """Separate ambient/diffuse/specular accumulators (ColorTriple)."""
    a: jnp.ndarray   # (R,3)
    d: jnp.ndarray
    s: jnp.ndarray

    @staticmethod
    def zeros(r, dtype):
        z = jnp.zeros((r, 3), dtype)
        return Triple(z, z, z)

    def __add__(self, o):
        return Triple(self.a + o.a, self.d + o.d, self.s + o.s)

    def scale(self, f):
        return Triple(self.a * f, self.d * f, self.s * f)

    def mask(self, m):
        m = m[..., None]
        return Triple(jnp.where(m, self.a, 0.0), jnp.where(m, self.d, 0.0),
                      jnp.where(m, self.s, 0.0))


class RenderStatics(NamedTuple):
    """Per-scene derived tables and static flags.

    With use_clusters the slot_* tables cover the analytic block only and
    the tri_* tables drive the streamed cluster queries."""
    slot_prim: np.ndarray        # (H,) static
    prim_mat: jnp.ndarray        # (N_prims,) i32 material per global prim
    slot_shadow: jnp.ndarray     # (H,) bool casts_shadow per slot
    slot_rank: jnp.ndarray       # (H,) i32 shadow-walk rank per slot
    prim_ni: jnp.ndarray         # (N_prims,) refractive index per prim
    tri_rank: Optional[jnp.ndarray]    # (Nt,) i32 (use_clusters only)
    tri_shadow: Optional[jnp.ndarray]  # (Nt,) bool
    tri_ni: Optional[jnp.ndarray]      # (Nt,) Ni (clusters + refraction)
    csg_tables: tuple            # static per-tree (slots, sides, nodes)
    cfg: ConfigDesc
    gi_hook: Optional[object] = None   # photon-map GI term (render.py
                                       # attaches via _replace after the
                                       # photon pass)


def build_statics(ir: SceneIR, cfg: ConfigDesc) -> RenderStatics:
    meta = ir.meta
    slot_prim = slot_tables(meta)
    prim_mat = jnp.concatenate([ir.material_id, ir.tri_material_id])
    slot_shadow = ir.mat_casts_shadow[prim_mat[jnp.asarray(slot_prim)]]
    slot_rank = ir.prim_shadow_rank[jnp.asarray(slot_prim)]
    prim_ni = ir.mat_Ni[prim_mat]
    tri_rank = tri_shadow = tri_ni = None
    if meta.use_clusters:
        tri_rank = ir.prim_shadow_rank[meta.n_analytic:]
        tri_shadow = ir.mat_casts_shadow[ir.tri_material_id]
        if meta.needs_hit_sort:
            tri_ni = ir.mat_Ni[ir.tri_material_id]
    csg_tables = ()
    if meta.has_csg:
        # static Python-int tables (meta) — arbitrary tree sizes, no i32
        # bitmask cap; triangles participate like any other leaf
        csg_tables = tuple(csg_static_tables(
            meta, slot_prim, meta.csg_prim_leaf, meta.csg_prim_anc,
            meta.csg_prim_side))
    return RenderStatics(slot_prim=slot_prim, prim_mat=prim_mat,
                         slot_shadow=slot_shadow, slot_rank=slot_rank,
                         prim_ni=prim_ni, tri_rank=tri_rank,
                         tri_shadow=tri_shadow, tri_ni=tri_ni,
                         csg_tables=csg_tables, cfg=cfg)


def closest_query(ir: SceneIR, rt: RenderStatics, orig, dirs,
                  shadow_filter: bool = False):
    """Nearest positive hit over analytic prims + (clustered) mesh.
    Returns (Hit, t_cand or None for the containers sort).
    shadow_filter=True restricts to casts_shadow materials (`hit(xs,
    true)` — the photon pass uses this, photon_tracer.c:190)."""
    meta = ir.meta
    t_cand = intersect_candidates(ir, orig, dirs)
    if meta.has_csg:
        t_cand = apply_csg_filter(t_cand, rt.csg_tables)
    mask = rt.slot_shadow if shadow_filter else None
    hit = closest_hit(t_cand, rt.slot_prim, mask=mask)
    if not meta.use_clusters:
        return hit, t_cand
    t_m, idx_m = mesh_closest(ir, orig, dirs,
                              keep=rt.tri_shadow if shadow_filter else None)
    use_m = t_m < hit.t
    return Hit(valid=hit.valid | jnp.isfinite(t_m),
               t=jnp.where(use_m, t_m, hit.t),
               prim=jnp.where(use_m, idx_m + meta.n_analytic, hit.prim)), \
        t_cand


class Comps(NamedTuple):
    """prepare_computations outputs (renderer.c:368-495), batched."""
    valid: jnp.ndarray
    t: jnp.ndarray
    prim: jnp.ndarray
    p: jnp.ndarray
    eyev: jnp.ndarray
    normalv: jnp.ndarray
    reflectv: jnp.ndarray
    over_point: jnp.ndarray
    under_point: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    inside: jnp.ndarray
    mat: jnp.ndarray           # (R,) material index
    over_Ka: jnp.ndarray       # (R,3) pattern-sampled or constant
    over_Kd: jnp.ndarray
    over_Ks: jnp.ndarray
    over_refl: jnp.ndarray
    over_Ns: jnp.ndarray       # (R,)
    over_d: jnp.ndarray        # (R,) dissolve = 1 - Tr (or map_d sample)
    tf: jnp.ndarray            # (R,3) mat_Tf[mat] (pre-looked-up)
    tr: jnp.ndarray            # (R,)  mat_Tr[mat]
    refl_flag: jnp.ndarray     # (R,)  mat_reflective[mat]
    ctx: ShapeCtx


_SELECT_MAX = 96    # material tables up to this many rows take the fused
# select-chain lookup; beyond it the per-ray row gather wins again


def _rows_by_index(table, idx):
    """table[idx] for a SMALL table via a static select chain.

    TPU random row-gathers run at a fixed ~0.33G rows/s regardless of row
    width (the per-op profile put the six per-level material gathers at
    ~16 ms/frame on the flagship); a chain of M broadcast-row selects
    fuses into ONE elementwise pass over the batch that streams at
    bandwidth. Exact (pure selects — no arithmetic on the values) and
    differentiable (each where routes cotangents to its row)."""
    M = table.shape[0]
    out = jnp.broadcast_to(table[0][None], (idx.shape[0], table.shape[1]))
    for m in range(1, M):
        out = jnp.where((idx == m)[:, None], table[m][None], out)
    return out


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    # sqrt(clip(sum sq)) instead of norm().clip(): norm's sqrt'(0)=inf
    # poisons gradients of masked zero-vector lanes; the floor must be
    # representable in the working dtype (1e-60 underflows f32 to 0)
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(n2.clip(jnp.finfo(v.dtype).tiny))


def prepare_computations(ir: SceneIR, rt: RenderStatics, orig, dirs,
                         shadow_filter: bool = False) -> Comps:
    meta = ir.meta
    hit, t_cand = closest_query(ir, rt, orig, dirs, shadow_filter)
    t = jnp.where(hit.valid, hit.t, 1.0)
    prim = hit.prim
    p = orig + t[:, None] * dirs
    eyev = -dirs

    ctx = build_shape_ctx(ir, prim)
    mat = rt.prim_mat[prim]

    # ONE packed lookup for every per-material quantity this level needs
    # (constants for the 6 map slots + Tf/Tr/reflective for the specular
    # combine + the pattern ids). Small scenes take the fused select
    # chain; large material tables keep the row gather.
    dt = orig.dtype
    nm = int(ir.mat_Ka.shape[0])
    pid_slots = tuple(meta.pattern_slots) if meta.any_patterns else ()
    if nm <= _SELECT_MAX:
        cols = [ir.mat_Ka, ir.mat_Kd, ir.mat_Ks, ir.mat_refl,
                ir.mat_Ns[:, None], ir.mat_Tr[:, None], ir.mat_Tf,
                ir.mat_reflective[:, None].astype(dt)]
        for s in pid_slots:
            # pattern ids are small ints (>= -1): exact in the working
            # float dtype, recovered with astype below
            cols.append(ir.mat_map[:, s][:, None].astype(dt))
        vals = _rows_by_index(jnp.concatenate(cols, axis=1), mat)
        m_Ka, m_Kd = vals[:, 0:3], vals[:, 3:6]
        m_Ks, m_refl = vals[:, 6:9], vals[:, 9:12]
        m_Ns, m_Tr, m_Tf = vals[:, 12], vals[:, 13], vals[:, 14:17]
        refl_flag = vals[:, 17] > 0.5
        pids = {s: vals[:, 18 + k].astype(jnp.int32)
                for k, s in enumerate(pid_slots)}
    else:
        m_Ka, m_Kd, m_Ks = ir.mat_Ka[mat], ir.mat_Kd[mat], ir.mat_Ks[mat]
        m_refl, m_Ns = ir.mat_refl[mat], ir.mat_Ns[mat]
        m_Tr, m_Tf = ir.mat_Tr[mat], ir.mat_Tf[mat]
        refl_flag = ir.mat_reflective[mat]
        pids = {s: ir.mat_map[mat, s] for s in pid_slots}

    # triangle barycentric uv (for smooth normals / uv maps)
    if meta.n_triangles:
        na = meta.n_analytic
        u, v = triangle_uv_at(ir, jnp.clip(prim - na, 0, meta.n_triangles - 1),
                              orig, dirs)
        is_tri = prim >= na
        u = jnp.where(is_tri, u, 0.0)
        v = jnp.where(is_tri, v, 0.0)
    else:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)

    bump_pid = pids[IR.SLOT_BUMP] if meta.any_bump else None
    normalv = normal_at(ir, ctx, prim, p, u, v, mat_bump_pid=bump_pid)
    inside = _dot(normalv, eyev) < 0.0
    normalv = jnp.where(inside[:, None], -normalv, normalv)
    reflectv = dirs - normalv * (2.0 * _dot(dirs, normalv))[:, None]
    over_point = p + normalv * EPSILON
    under_point = p - normalv * EPSILON

    if meta.needs_hit_sort:
        if not meta.use_clusters:
            n1, n2 = containers_n1_n2(meta, t_cand, hit.t, rt.prim_ni)
        else:
            # merge the dense-table walk with the clustered-mesh fold:
            # the later included entry (larger t) is the containers'
            # last object, so its Ni wins per walk (renderer.c:406-447)
            neg = jnp.full_like(t, -jnp.inf)
            one = jnp.ones_like(t)
            if meta.n_analytic > 0:
                dn1, dn2, dm1, dm2 = containers_n1_n2(
                    meta, t_cand, hit.t, rt.prim_ni, with_entry_t=True)
            else:
                dn1 = dn2 = one
                dm1 = dm2 = neg
            na = meta.n_analytic
            hit_tri = jnp.where(hit.valid & (prim >= na), prim - na, -1)
            mt1, mn1, mt2, mn2 = mesh_containers(
                ir, rt.tri_ni, orig, dirs,
                jnp.where(hit.valid, hit.t, neg), hit_tri)
            n1 = jnp.where(mt1 > dm1, mn1, dn1)
            n2 = jnp.where(mt2 > dm2, mn2, dn2)
    else:
        n1 = jnp.ones_like(t)
        n2 = jnp.ones_like(t)

    # material map sampling at over_point (renderer.c:449-494); slots
    # with no pattern anywhere in the scene (meta.pattern_slots, static)
    # skip the per-lane pattern evaluation entirely
    def slot_color(slot, const):
        if not meta.any_patterns or slot not in meta.pattern_slots:
            return const
        pid = pids[slot]
        patc = eval_pattern(ir, pid, ctx, over_point)
        return jnp.where((pid >= 0)[:, None], patc, const)

    over_Ka = slot_color(IR.SLOT_KA, m_Ka)
    over_Kd = slot_color(IR.SLOT_KD, m_Kd)
    over_Ks = slot_color(IR.SLOT_KS, m_Ks)
    over_refl = slot_color(IR.SLOT_REFL, m_refl)
    over_Ns = slot_color(IR.SLOT_NS, m_Ns[:, None] *
                         jnp.ones((1, 3), t.dtype))[:, 0]
    over_d = slot_color(IR.SLOT_D, (1.0 - m_Tr)[:, None] *
                        jnp.ones((1, 3), t.dtype))[:, 0]

    return Comps(valid=hit.valid, t=hit.t, prim=prim, p=p, eyev=eyev,
                 normalv=normalv, reflectv=reflectv, over_point=over_point,
                 under_point=under_point, n1=n1, n2=n2, inside=inside,
                 mat=mat, over_Ka=over_Ka, over_Kd=over_Kd, over_Ks=over_Ks,
                 over_refl=over_refl, over_Ns=over_Ns, over_d=over_d,
                 tf=m_Tf, tr=m_Tr, refl_flag=refl_flag, ctx=ctx)


# ---------------------------------------------------------------------------
# shadows and direct lighting
# ---------------------------------------------------------------------------

def is_shadowed(ir: SceneIR, rt: RenderStatics, light_pts, p, active=None):
    """Batched is_shadowed (renderer.c:73-93). light_pts: (R,S,3), p: (R,3)
    -> (R,S) bool. `active`: (R,) lanes whose result matters (dead lanes
    are parked outside the scene so cluster blocks skip them)."""
    R, S, _ = light_pts.shape
    v = light_pts - p[:, None, :]
    dist = jnp.linalg.norm(v, axis=-1)
    direction = v / dist[..., None].clip(1e-30)
    o = jnp.broadcast_to(p[:, None, :], (R, S, 3)).reshape(R * S, 3)
    d = direction.reshape(R * S, 3)
    if active is not None and ir.meta.use_clusters:
        o, d = neutralize_rays(
            o, d, jnp.broadcast_to(active[:, None], (R, S)).reshape(R * S))
    df = dist.reshape(R * S)
    t_cand = intersect_candidates(ir, o, d)
    if ir.meta.has_csg:
        # shadow=True: is_shadowed passes stop_after_first_hit, which
        # truncates group walks INSIDE csg trees (renderer.c:73-93)
        t_cand = apply_csg_filter(t_cand, rt.csg_tables, shadow=True)
    if not ir.meta.use_clusters:
        shadowed = shadow_hit_early_exit(t_cand, rt.slot_rank,
                                         rt.slot_shadow, df)
        return shadowed.reshape(R, S)
    # combine analytic + mesh early-exit components: lower rank wins
    a_rank, a_t = shadow_components(t_cand, rt.slot_rank, rt.slot_shadow)
    m_rank, m_t = mesh_shadow_reduce(ir, rt.tri_rank, rt.tri_shadow, o, d)
    use_m = m_rank < a_rank
    t = jnp.where(use_m, m_t, a_t)
    shadowed = t < df
    return shadowed.reshape(R, S)


def _light_sample_points(ir: SceneIR, li: int, R: int, key):
    """Surface sample points for light li: (R, S, 3) + per-sample mask.

    Deterministic lights broadcast the compile-time CMJ cache; jittered
    area/circle lights draw a fresh CMJ table per shading point (the
    reference picks one of 65536 pre-jittered tables per query,
    light.c:193-198 — statistically identical)."""
    typ, usteps, vsteps, jitter, num = ir.meta.light_info[li]
    S = num
    if not jitter or key is None or typ in (IR.LIGHT_POINT, IR.LIGHT_HEMISPHERE):
        pts = ir.light_points[li, :S][None]
        return jnp.broadcast_to(pts, (R, S, 3))
    from fast_ray_tracer_tpu.sampling.cmj import cmj_points_batched
    dtype = ir.light_pos.dtype
    tables = cmj_points_batched(key, R, usteps, vsteps, dtype)
    if typ == IR.LIGHT_AREA:
        u = tables[..., 0] * usteps
        v = tables[..., 1] * vsteps
        return (ir.light_pos[li][None, None]
                + u[..., None] * ir.light_uvec[li][None, None]
                + v[..., None] * ir.light_vvec[li][None, None])
    # circle light: uniform disc in the light frame (sampler.c:116-139)
    theta = 2.0 * jnp.pi * tables[..., 0]
    r = ir.light_radius[li] * jnp.sqrt(tables[..., 1])
    n = ir.light_normal[li]
    nt, nb = _frame(n)
    return (ir.light_pos[li][None, None]
            + (r * jnp.cos(theta))[..., None] * nb[None, None]
            + (r * jnp.sin(theta))[..., None] * nt[None, None])


def _frame(n):
    """create_coordinate_system (sampler.c:66-85) for a single vector."""
    use_x = jnp.abs(n[0]) > jnp.abs(n[1])
    nt_a = jnp.stack([n[2], jnp.zeros_like(n[0]), -n[0]])
    nt_a = nt_a / jnp.sqrt(n[0] ** 2 + n[2] ** 2).clip(1e-30)
    nt_b = jnp.stack([jnp.zeros_like(n[0]), -n[2], n[1]])
    nt_b = nt_b / jnp.sqrt(n[1] ** 2 + n[2] ** 2).clip(1e-30)
    nt = -jnp.where(use_x, nt_a, nt_b)
    nb = jnp.cross(n, nt)
    return nt, nb


def lighting_microfacet(ir: SceneIR, rt: RenderStatics, comps: Comps,
                        li: int, light_pts, shade_intensity) -> Triple:
    """Cook-Torrance-style direct term (renderer.c:894-979)."""
    cfg = rt.cfg
    R = comps.p.shape[0]
    dtype = comps.p.dtype
    I = ir.light_intensity[li][None]            # (1,3)
    _, _, _, _, num_samples = ir.meta.light_info[li]

    ambient = comps.over_Ka * I
    res = Triple.zeros(R, dtype)

    if cfg.include_diffuse or cfg.include_specular_highlight:
        point = comps.over_point
        n = comps.normalv
        eyev = comps.eyev
        ndote = _dot(n, eyev)
        diff_v = light_pts - point[:, None, :]            # (R,S,3)
        lightv = _normalize(diff_v)
        ldotn = _dot(lightv, n[:, None, :])               # (R,S)
        cond = ldotn >= 0.0

        d_acc = jnp.zeros((R, 3), dtype)
        s_acc = jnp.zeros((R, 3), dtype)
        if cfg.include_diffuse:
            contrib = comps.over_Kd[:, None, :] * I[None] \
                * ldotn[..., None]
            d_acc = jnp.sum(jnp.where(cond[..., None], contrib, 0.0), axis=1)
        if cfg.include_specular_highlight:
            h = _normalize(lightv + eyev[:, None, :])
            ndoth = jnp.maximum(0.0, _dot(n[:, None, :], h))
            edoth = _dot(eyev[:, None, :], h)
            # reference: 1/fmax(0, edoth) (renderer.c:953) — inf allowed,
            # saturated away by the fmin below. A raw reciprocal backward
            # overflows (1/x^2) in f32, so saturate explicitly; C fmin
            # ignores NaN (picks 1.0) where jnp.minimum would propagate it,
            # and this formulation reproduces the fmin outcome.
            e_pos = edoth > 1e-8
            edoth_inv = jnp.where(
                e_pos, 1.0 / jnp.where(e_pos, edoth, 1.0), 1e30)
            ldoth = _dot(lightv, h)
            Ns = comps.over_Ns[:, None]
            # pow(0, Ns) = 0 but d/dNs pow(0, Ns) = 0^Ns*log 0 = NaN;
            # guard keeps the forward value bit-identical
            pos = ndoth > 0.0
            pw = jnp.where(pos, jnp.power(jnp.where(pos, ndoth, 1.0), Ns),
                           0.0)
            D = (Ns + 2.0) * pw * (0.5 / jnp.pi)
            gc = 2.0 * ndoth * edoth_inv
            G = jnp.minimum(1.0, jnp.minimum(gc * ndote[:, None],
                                             gc * ldotn))
            fct = jnp.power(1.0 - ldoth, 5.0)
            Ks = comps.over_Ks[:, None, :]
            F = Ks + (1.0 - Ks) * fct[..., None]
            denom = 4.0 * ldotn * ndote[:, None]
            safe = cond & (denom > 1e-30)
            brdf = jnp.where(safe, D * G / jnp.where(safe, denom, 1.0), 0.0)
            s_acc = jnp.sum(jnp.where(safe[..., None],
                                      F * I[None] * brdf[..., None], 0.0),
                            axis=1)
        scaling = (shade_intensity / num_samples)[:, None]
        # equal(shade_intensity, 0) -> ambient only (renderer.c:904-909)
        lit = (jnp.abs(shade_intensity) >= EPSILON)[:, None]
        res = Triple(res.a, res.d + jnp.where(lit, d_acc * scaling, 0.0),
                     res.s + jnp.where(lit, s_acc * scaling, 0.0))

    if cfg.include_ambient:
        res = Triple(res.a + ambient, res.d, res.s)
    return res


def intensity_at(ir: SceneIR, rt: RenderStatics, li: int, p, key,
                 active=None):
    """Fraction of unshadowed light samples (light.c:229-251)."""
    typ, usteps, vsteps, jitter, num = ir.meta.light_info[li]
    R = p.shape[0]
    pts = _light_sample_points(ir, li, R, key)
    shadowed = is_shadowed(ir, rt, pts, p, active)
    return jnp.mean(1.0 - shadowed.astype(p.dtype), axis=-1), pts


# ---------------------------------------------------------------------------
# shade_hit & color_at (mutually recursive, statically unrolled)
# ---------------------------------------------------------------------------

def shade_direct(ir: SceneIR, rt: RenderStatics, comps: Comps, key) -> Triple:
    """The non-recursive part of shade_hit (renderer.c:689-770): direct
    lighting per light + the photon-map GI terms."""
    cfg = rt.cfg
    R = comps.p.shape[0]
    dtype = comps.p.dtype
    surface = Triple.zeros(R, dtype)

    if cfg.include_direct:
        # `anchor` is the shading point routed through each light's
        # optimization barrier: on clustered scenes it sequences the
        # per-light shadow folds — without the barrier XLA overlaps
        # every fold's (blocks x B x Nc) mask/bound temps and the
        # multi-light program blows device memory (spills, then OOM)
        anchor = comps.over_point
        seq = ir.meta.use_clusters and ir.meta.n_lights > 1
        for li in range(ir.meta.n_lights):
            k1 = k2 = None
            if key is not None:
                key, k1, k2 = jax.random.split(key, 3)
            typ = ir.meta.light_info[li][0]
            if typ in (IR.LIGHT_POINT, IR.LIGHT_HEMISPHERE):
                pts = _light_sample_points(ir, li, R, None)
                shadowed = is_shadowed(ir, rt, pts, anchor, comps.valid)
                intensity = 1.0 - shadowed[:, 0].astype(dtype)
                light_pts = pts
            else:
                intensity, _ = intensity_at(ir, rt, li, anchor,
                                            k1, comps.valid)
                light_pts = _light_sample_points(ir, li, R, k2)
            surface = surface + lighting_microfacet(
                ir, rt, comps, li, light_pts, intensity)
            if seq:
                a, d_, s, anchor = jax.lax.optimization_barrier(
                    (surface.a, surface.d, surface.s, anchor))
                surface = Triple(a, d_, s)

    # GI (photon map) terms attach here — see render/photon.py
    gi_hook = rt.gi_hook
    if gi_hook is not None:
        gi_add = gi_hook(ir, rt, comps, key)
        a = surface.a + gi_add
        # L1 clamp of the ambient channel (renderer.c:765-769). The whole
        # GI block — clamp included — is gated on over_Kd > 0
        # (renderer.c:728): black-diffuse lanes keep an unclamped ambient.
        l1 = jnp.sum(a, axis=-1, keepdims=True)
        # double-where: the un-taken branch's a*SQRT3/l1 divides by l1=0
        # on black-ambient lanes (include_ambient off) — fine forward
        # (masked) but the division backward is 0-cotangent * inf = NaN
        over = l1 > SQRT3
        clamped = jnp.where(over, a * SQRT3 / jnp.where(over, l1, 1.0), a)
        gate = jnp.any(comps.over_Kd > 0.0, axis=-1, keepdims=True)
        surface = Triple(jnp.where(gate, clamped, a), surface.d, surface.s)
    return surface


def combine_specular(ir: SceneIR, rt: RenderStatics, comps: Comps,
                     surface: Triple, reflected_raw: Optional[Triple],
                     refracted_raw: Optional[Triple]) -> Triple:
    """The specular tail of shade_hit (renderer.c:772-822): scale the child
    results by over_refl / Tf*over_d, schlick-blend, apply the dissolve
    multiply (which runs even when children are black), and accumulate.

    reflected_raw/refracted_raw are the *child color_at results* (or None at
    the recursion leaf / when statically absent)."""
    cfg = rt.cfg
    R = comps.p.shape[0]
    dtype = comps.p.dtype
    if not cfg.include_specular or not (ir.meta.has_reflective
                                        or ir.meta.has_refractive):
        return surface

    if reflected_raw is None or not ir.meta.has_reflective:
        reflected = Triple.zeros(R, dtype)
    else:
        refl_flag = comps.refl_flag & comps.valid
        c = Triple(reflected_raw.a * comps.over_refl,
                   reflected_raw.d * comps.over_refl,
                   reflected_raw.s * comps.over_refl)
        reflected = c.mask(refl_flag)

    if refracted_raw is None or not ir.meta.has_refractive:
        refracted = Triple.zeros(R, dtype)
    else:
        active = refract_active(comps)
        tf = comps.tf
        f = tf * comps.over_d[:, None]
        c = Triple(refracted_raw.a * f, refracted_raw.d * f,
                   refracted_raw.s * f)
        refracted = c.mask(active)

    both = comps.refl_flag & (comps.over_d < 1.0)
    reflectance = schlick(comps)
    rf = jnp.where(both, reflectance, 1.0)[:, None]
    tf_ = jnp.where(both, 1.0 - reflectance, 1.0)[:, None]
    reflected = Triple(reflected.a * rf, reflected.d * rf, reflected.s * rf)
    refracted = Triple(refracted.a * tf_, refracted.d * tf_,
                       refracted.s * tf_)

    surface = surface + reflected
    dis = (comps.tr > 0.0) & (comps.over_d > 0.0)
    f = jnp.where(dis, 1.0 - comps.over_d, 1.0)[:, None]
    surface = Triple(surface.a * f, surface.d * f, surface.s * f)
    return surface + refracted


def refract_active(comps: Comps):
    """Mask of lanes where refracted_color proceeds (over_d > 0, no TIR)."""
    n_ratio = comps.n1 / comps.n2
    cos_i = _dot(comps.eyev, comps.normalv)
    sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
    return (comps.over_d > 0.0) & comps.valid & (sin2_t <= 1.0)


def refract_direction(comps: Comps):
    """Snell construction (renderer.c:560-572)."""
    n_ratio = comps.n1 / comps.n2
    cos_i = _dot(comps.eyev, comps.normalv)
    sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
    inner = sin2_t < 1.0
    cos_t = jnp.where(
        inner, jnp.sqrt(jnp.where(inner, jnp.maximum(1.0 - sin2_t, 0.0),
                                  1.0)), 0.0)
    return comps.normalv * (n_ratio * cos_i - cos_t)[:, None] \
        - comps.eyev * n_ratio[:, None]


def _make_level_fn(rt: RenderStatics, remat):
    """(ir, o, d, key) -> (Comps, direct Triple), optionally wrapped in
    jax.checkpoint: under grad, each wavefront level's big intermediates
    (candidate t tables, shadow-ray batches, pattern evals) are
    rematerialized instead of stored — activation memory drops from
    O(levels * R * H) to O(levels * R). Forward-only execution is
    unchanged (checkpoint is an identity outside differentiation).

    remat modes (bench_extras sweeps them; render callers pass bools):
      False/"none"   — store everything (cheapest recompute, most memory)
      True/"level"   — one checkpoint per wavefront level
      "nested"       — level checkpoint + inner checkpoints around
                       prepare_computations and shade_direct: the level
                       backward materializes ONE sub-block's internals
                       at a time (peak = max, not sum)
      "dots"         — level checkpoint with dots_saveable policy (keeps
                       matmul outputs - the ray-transform products -
                       saved, recomputes the rest)"""
    if remat is True:
        remat = "level"
    if not remat or remat == "none":
        def _plain(ir, cur_o, cur_d, lkey):
            comps = prepare_computations(ir, rt, cur_o, cur_d)
            direct = shade_direct(ir, rt, comps, lkey)
            return comps, direct
        return _plain
    if remat == "nested":
        prep = jax.checkpoint(
            lambda i, o, d: prepare_computations(i, rt, o, d))
        shade = jax.checkpoint(
            lambda i, c, k: shade_direct(i, rt, c, k))

        def _level_nested(ir, cur_o, cur_d, lkey):
            comps = prep(ir, cur_o, cur_d)
            return comps, shade(ir, comps, lkey)
        return jax.checkpoint(_level_nested)
    policy = None
    if remat == "dots":
        policy = jax.checkpoint_policies.dots_saveable

    def _level(ir, cur_o, cur_d, lkey):
        comps = prepare_computations(ir, rt, cur_o, cur_d)
        direct = shade_direct(ir, rt, comps, lkey)
        return comps, direct
    return (jax.checkpoint(_level, policy=policy) if policy
            else jax.checkpoint(_level))


def trace(ir: SceneIR, rt: RenderStatics, orig, dirs, depth: int,
          key, remat: bool = False) -> Triple:
    """Wavefront Whitted trace: the reference's branching recursion
    (reflect + refract children, depth `remaining`) evaluated one *level*
    at a time over concatenated child batches — a graph linear in depth
    instead of the 2^depth recursion tree, same arithmetic per lane."""
    cfg = rt.cfg
    want_refl = cfg.include_specular and ir.meta.has_reflective and depth > 0
    want_refr = cfg.include_specular and ir.meta.has_refractive and depth > 0
    level_fn = _make_level_fn(rt, remat)

    levels = []
    cur_o, cur_d = orig, dirs
    for lvl in range(depth + 1):
        lkey = None if key is None else jax.random.fold_in(key, lvl)
        comps, direct = level_fn(ir, cur_o, cur_d, lkey)
        levels.append((comps, direct))
        if lvl == depth:
            break
        children_o, children_d = [], []
        neutralize = ir.meta.use_clusters
        if want_refl:
            o_c, d_c = comps.over_point, comps.reflectv
            if neutralize:
                o_c, d_c = neutralize_rays(
                    o_c, d_c, comps.refl_flag & comps.valid)
            children_o.append(o_c)
            children_d.append(d_c)
        if want_refr:
            o_c, d_c = comps.under_point, refract_direction(comps)
            if neutralize:
                o_c, d_c = neutralize_rays(o_c, d_c, refract_active(comps))
            children_o.append(o_c)
            children_d.append(d_c)
        if not children_o:
            break
        cur_o = jnp.concatenate(children_o, axis=0)
        cur_d = jnp.concatenate(children_d, axis=0)
        if ir.meta.use_clusters:
            # sequence levels on clustered scenes (see trace_bucketed)
            da, dd, ds, cur_o, cur_d = jax.lax.optimization_barrier(
                (direct.a, direct.d, direct.s, cur_o, cur_d))
            levels[-1] = (comps, Triple(da, dd, ds))

    # combine upward
    child_total: Optional[Triple] = None
    for lvl in range(len(levels) - 1, -1, -1):
        comps, direct = levels[lvl]
        n = comps.p.shape[0]
        refl_raw = refr_raw = None
        if child_total is not None:
            off = 0
            if want_refl:
                refl_raw = Triple(child_total.a[off:off + n],
                                  child_total.d[off:off + n],
                                  child_total.s[off:off + n])
                off += n
            if want_refr:
                refr_raw = Triple(child_total.a[off:off + n],
                                  child_total.d[off:off + n],
                                  child_total.s[off:off + n])
        total = combine_specular(ir, rt, comps, direct, refl_raw, refr_raw)
        child_total = total.mask(comps.valid)
    return child_total


def trace_bucketed(ir: SceneIR, rt: RenderStatics, orig, dirs, depth: int,
                   key, buckets, remat=False, value_gates: bool = True):
    """Wavefront trace with DEVICE-SIDE static-bucket compaction.

    The statically-unrolled `trace` doubles the lane count every level
    (2^depth growth) whether or not lanes can spawn children; host-driven
    compaction (CompactTracer) fixes that on CPU but its per-level host
    syncs cost ~10-100 ms each through a TPU tunnel. Here compaction runs
    on device with static shapes: each level's child slots are gathered
    with jnp.nonzero(size=B) into a fixed bucket of B lanes (buckets[lvl],
    a compile-time constant), and the upward combine scatters child
    results back through the same index array. No host syncs, one
    compiled program, linear memory.

    Correctness: per-lane arithmetic is identical to `trace` (deterministic
    scenes stay byte-identical); each child occupies exactly one slot. If
    a level's live children exceed its bucket the surplus lanes would be
    dropped, so the returned `overflow` flag (scalar bool) must be checked
    once per chunk — when True the caller re-renders the chunk with the
    exact path (render.py does this automatically).
    """
    cfg = rt.cfg
    want_refl = cfg.include_specular and ir.meta.has_reflective and depth > 0
    want_refr = cfg.include_specular and ir.meta.has_refractive and depth > 0
    level_fn = _make_level_fn(rt, remat)
    if not (want_refl or want_refr):
        comps, direct = level_fn(ir, orig, dirs, key)
        return combine_specular(ir, rt, comps, direct, None,
                                None).mask(comps.valid), jnp.bool_(False)

    dtype = orig.dtype
    levels = []
    overflow = jnp.bool_(False)
    cur_o, cur_d = orig, dirs
    for lvl in range(depth + 1):
        lkey = None if key is None else jax.random.fold_in(key, lvl)
        comps, direct = level_fn(ir, cur_o, cur_d, lkey)
        n = cur_o.shape[0]
        entry = {"comps": comps, "direct": direct, "n": n,
                 "pos": None, "act": None, "bucket": 0}
        levels.append(entry)
        if lvl == depth:
            break
        # child slot layout: [reflect lanes 0..n) | refract lanes n..2n).
        # With value_gates (the default), children whose contribution is
        # provably zero are not spawned: reflect scales by over_refl
        # (combine_specular), refract by Tf * over_d — a zero color
        # kills the whole subtree. Differentiation consequence: since
        # combine_specular only MULTIPLIES by over_refl/Tf, a material
        # whose refl/Tf is EXACTLY zero gets subgradient 0 through its
        # pruned subtree (one-sided derivative at the prune boundary);
        # any nonzero channel gives exact gradients. value_gates=False
        # restores the exact gradient but regrows ~2^depth lanes —
        # refract_active alone admits nearly every opaque hit (over_d=1)
        # — so the gated semantics is the default even for training
        # (test_bucketed_gradients_match_unrolled pins both behaviors).
        acts, os_, ds_ = [], [], []
        if want_refl:
            refl_spawn = comps.refl_flag & comps.valid
            if value_gates:
                refl_spawn &= jnp.any(comps.over_refl != 0.0, axis=-1)
            acts.append(refl_spawn)
            os_.append(comps.over_point)
            ds_.append(comps.reflectv)
        if want_refr:
            refr_spawn = refract_active(comps)
            if value_gates:
                refr_spawn &= jnp.any(comps.tf != 0.0, axis=-1)
            acts.append(refr_spawn)
            os_.append(comps.under_point)
            ds_.append(refract_direction(comps))
        act = jnp.concatenate(acts)
        src_o = jnp.concatenate(os_)
        src_d = jnp.concatenate(ds_)
        B = int(buckets[lvl]) if lvl < len(buckets) else n
        n_live = jnp.sum(act)
        overflow = overflow | (n_live > B)
        entry["act"] = act
        entry["bucket"] = B
        if compact_pallas.enabled(dtype):
            # monotone Pallas compaction: nonzero's scatter-add index
            # build + the packed-row gather were ~58 ms/frame of the
            # flagship program; the kernel streams the same result at
            # bandwidth (ops/compact_pallas.py)
            entry["pos"] = None
            rows = compact_pallas.compact_rows(
                jnp.concatenate([src_o, src_d], axis=-1), act, B,
                (1e30, 1e30, 1e30, 1.0, 1.0, 1.0))
            cur_o = rows[:, :3]
            cur_d = rows[:, 3:6]
        else:
            (idx,) = jnp.nonzero(act, size=B, fill_value=src_o.shape[0])
            # child-slot -> bucket position (shares the cumsum inside
            # nonzero): the upward combine GATHERS child results through
            # this instead of scatter-adding through idx — TPU scatters
            # serialize, gathers don't
            entry["pos"] = jnp.cumsum(act.astype(jnp.int32)) - 1
            # ONE packed-row gather for both ray components:
            # random/compacted gathers cost per ROW regardless of width
            # up to 128 floats
            pad = jnp.concatenate(
                [jnp.concatenate([src_o, src_d], axis=-1),
                 jnp.concatenate([jnp.full((1, 3), 1e30, dtype),
                                  jnp.ones((1, 3), dtype)], axis=-1)])
            cur = pad[idx]
            cur_o = cur[:, :3]
            cur_d = cur[:, 3:6]
        if ir.meta.use_clusters:
            # sequence wavefront levels on clustered scenes (see
            # shade_direct): level L's fold temps must be dead before
            # level L+1's folds start, or buffer lifetimes stack
            da, dd, ds, cur_o, cur_d = jax.lax.optimization_barrier(
                (direct.a, direct.d, direct.s, cur_o, cur_d))
            entry["direct"] = Triple(da, dd, ds)

    child_total: Optional[Triple] = None
    for lvl in range(len(levels) - 1, -1, -1):
        e = levels[lvl]
        n = e["n"]
        refl_raw = refr_raw = None
        if child_total is not None:
            # route each child slot's result back from its bucket position
            # (inverse of the downward compaction); dead slots (act=False)
            # contribute zero. Pallas path: the monotone expand kernel;
            # fallback: one packed (B,9) row gather.
            B = e["bucket"]
            packed_child = jnp.concatenate(
                [child_total.a, child_total.d, child_total.s], axis=-1)
            if e["pos"] is None:
                g = compact_pallas.expand_rows(packed_child, e["act"])
            else:
                posc = jnp.clip(e["pos"], 0, B - 1)
                actm = e["act"][:, None]
                g = jnp.where(actm, packed_child[posc], 0.0)
            ga, gd, gs = g[:, :3], g[:, 3:6], g[:, 6:9]
            off = 0
            if want_refl:
                refl_raw = Triple(ga[off:off + n], gd[off:off + n],
                                  gs[off:off + n])
                off += n
            if want_refr:
                refr_raw = Triple(ga[off:off + n], gd[off:off + n],
                                  gs[off:off + n])
        total = combine_specular(ir, rt, e["comps"], e["direct"],
                                 refl_raw, refr_raw)
        child_total = total.mask(e["comps"].valid)
    return child_total, overflow


def spawn_counts(ir: SceneIR, rt: RenderStatics, orig, dirs, depth: int,
                 key, ceiling: float = 3.0, value_gates: bool = True):
    """Per-level live-children counts for bucket calibration (jit this and
    run it once per chunk at setup; ~one render pass of cost). Uses
    ceiling-sized buckets internally so the counts are exact unless a
    level exceeds `ceiling` x the primary batch."""
    cfg = rt.cfg
    want_refl = cfg.include_specular and ir.meta.has_reflective and depth > 0
    want_refr = cfg.include_specular and ir.meta.has_refractive and depth > 0
    n0 = orig.shape[0]
    dtype = orig.dtype
    counts = []
    cur_o, cur_d = orig, dirs
    for lvl in range(depth):
        lkey = None if key is None else jax.random.fold_in(key, lvl)
        comps = prepare_computations(ir, rt, cur_o, cur_d)
        acts, os_, ds_ = [], [], []
        if want_refl:
            a = comps.refl_flag & comps.valid
            if value_gates:
                a &= jnp.any(comps.over_refl != 0.0, axis=-1)
            acts.append(a)
            os_.append(comps.over_point)
            ds_.append(comps.reflectv)
        if want_refr:
            a = refract_active(comps)
            if value_gates:
                a &= jnp.any(comps.tf != 0.0, axis=-1)
            acts.append(a)
            os_.append(comps.under_point)
            ds_.append(refract_direction(comps))
        if not acts:
            break
        act = jnp.concatenate(acts)
        counts.append(jnp.sum(act))
        B = int(np.ceil(n0 * ceiling / 256.0)) * 256
        (idx,) = jnp.nonzero(act, size=B, fill_value=act.shape[0])
        pad_o = jnp.concatenate([jnp.concatenate(os_),
                                 jnp.full((1, 3), 1e30, dtype)])
        pad_d = jnp.concatenate([jnp.concatenate(ds_),
                                 jnp.ones((1, 3), dtype)])
        cur_o = pad_o[idx]
        cur_d = pad_d[idx]
    return counts


def calibrate_buckets(probe_fn, chunks, depth: int, margin: float = 1.15):
    """Max per-level spawn counts over `chunks` (each a tuple of args for
    `probe_fn`, a jitted spawn_counts closure) -> bucket sizes with
    `margin` headroom, rounded up to 256 lanes."""
    worst = [0] * depth
    for args in chunks:
        counts = probe_fn(*args)
        for i, c in enumerate(counts):
            worst[i] = max(worst[i], int(c))
    return [max(256, int(np.ceil(w * margin / 256.0)) * 256)
            for w in worst]


def default_buckets(n0: int, depth: int, fractions=None):
    """Bucket sizes per spawn level, as multiples of the primary batch.

    Defaults follow measured worst-case spawn fractions on the glass-scene
    family (mirror walls + glass spheres branch up to ~2.0x the primary
    batch by depth 5; mostly-diffuse scenes stay well under 1x): generous
    enough that overflow is rare, small enough to keep the 6-10x lane
    saving over the 2^depth exact path. The overflow flag + caller
    fallback guarantees correctness regardless. `fractions` overrides per
    level (e.g. from a probe frame)."""
    if fractions is None:
        fractions = [min(2.4, 1.4 + 0.25 * lvl) for lvl in range(depth)]
    out = []
    for lvl in range(depth):
        b = int(np.ceil(n0 * fractions[lvl] / 256.0)) * 256
        out.append(max(256, b))
    return out


def schlick(comps: Comps):
    """renderer.c:607-624."""
    co = _dot(comps.eyev, comps.normalv)
    n = comps.n1 / comps.n2
    sin2_t = n * n * (1.0 - co * co)
    # double-where: sqrt'(0) = inf would poison gradients at grazing /
    # TIR-boundary lanes (sin2_t >= 1); forward values are unchanged
    inner = sin2_t < 1.0
    cos_t = jnp.where(
        inner, jnp.sqrt(jnp.where(inner, jnp.maximum(1.0 - sin2_t, 0.0),
                                  1.0)), 0.0)
    co_eff = jnp.where(comps.n1 > comps.n2, cos_t, co)
    r0 = ((comps.n1 - comps.n2) / (comps.n1 + comps.n2)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - co_eff) ** 5
    tir = (comps.n1 > comps.n2) & (sin2_t > 1.0)
    return jnp.where(tir, 1.0, reflectance)


def color_at(ir: SceneIR, rt: RenderStatics, orig, dirs, remaining: int,
             key, remat: bool = False) -> Triple:
    """renderer.c:347-366 for a ray batch (wavefront implementation)."""
    return trace(ir, rt, orig, dirs, remaining, key, remat=remat)
