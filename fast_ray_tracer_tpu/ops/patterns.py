"""Vectorized procedural pattern / UV texture evaluation.

The reference dispatches four function pointers per pattern struct
(src/pattern/pattern.h:119-142). Here every pattern is a row in the
SceneIR pattern table and evaluation computes the formulas for the whole
shading batch, selecting per point by the (traced) pattern type. The
selection is *statically pruned* by meta.pattern_kinds: only the pattern
types, combinator nesting depth and perlin octave counts that actually
occur in the scene appear in the compiled graph.

Semantics matched to src/pattern/pattern.c:
  * world -> object -> pattern space transforms (base_pattern_at_shape:9-28)
  * combinators (blended/nested/perturbed) operate on the *world* point and
    delegate to children, which re-do their own transforms (:30-116); the
    nested combinator overrides its primary's a/b colors (:41-76)
  * uv-map patterns pick a face, then re-map with the face's transform
    applied (:197-217) — YAML can't give faces transforms, so the second
    uv_map call collapses to the first and is skipped here
  * all uv_map projections (:309-488) including the C fmod (truncation
    remainder) and `equal()` epsilon cube-face selection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.constants import EPSILON
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR

SHAPE_TRIANGLE = 6   # shape_type value for triangles in ShapeCtx


class ShapeCtx(NamedTuple):
    """Per-shading-point shape data the pattern system needs."""
    obj_inv: jnp.ndarray     # (R,4,4) world->object (identity for triangles)
    shape_type: jnp.ndarray  # (R,) i32: 0..5 analytic type, 6 triangle
    params: jnp.ndarray      # (R,4) cylinder/cone min,max / toroid r1,r2
    tri_p1: jnp.ndarray      # (R,3)
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_t1: jnp.ndarray      # (R,2)
    tri_t2: jnp.ndarray
    tri_t3: jnp.ndarray
    tri_use_tex: jnp.ndarray  # (R,)


def build_shape_ctx(ir: SceneIR, prim) -> ShapeCtx:
    import numpy as np
    meta = ir.meta
    na = meta.n_analytic
    is_tri = prim >= na
    a_idx = jnp.clip(prim, 0, max(na - 1, 0))
    t_idx = jnp.clip(prim - na, 0, max(meta.n_triangles - 1, 0))

    # static analytic type per prim
    a_types = np.zeros(max(na, 1), dtype=np.int32)
    for typ, start, count in meta.type_ranges:
        a_types[start:start + count] = typ
    eye = jnp.broadcast_to(jnp.eye(4, dtype=ir.inv_tf.dtype),
                           (prim.shape[0], 4, 4))
    if na:
        # one-hot matmul instead of a row gather: the per-ray 4x4 gather is
        # a profiled hot spot on TPU (strided 16-float rows), while a
        # (R,na)x(na,16) matmul with exactly one nonzero per row is both
        # fast on the MXU and bit-exact (x*1 + 0-sums)
        R = prim.shape[0]
        dt = ir.inv_tf.dtype
        onehot = (a_idx[:, None] == jnp.arange(na)[None]).astype(dt)
        hi = jax.lax.Precision.HIGHEST
        inv_rows = jnp.dot(onehot, ir.inv_tf.reshape(na, 16),
                           precision=hi).reshape(R, 4, 4)
        params_rows = jnp.dot(onehot, ir.prim_params, precision=hi)
        obj_inv = jnp.where(is_tri[:, None, None], eye, inv_rows)
        params = jnp.where(is_tri[:, None], 0.0, params_rows)
        stype = jnp.where(is_tri, SHAPE_TRIANGLE,
                          jnp.asarray(a_types)[a_idx])
    else:
        obj_inv = eye
        params = jnp.zeros((prim.shape[0], 4), ir.inv_tf.dtype)
        stype = jnp.full(prim.shape, SHAPE_TRIANGLE, jnp.int32)
    if meta.n_triangles:
        ctx = ShapeCtx(
            obj_inv=obj_inv, shape_type=stype, params=params,
            tri_p1=ir.tri_p1[t_idx], tri_e1=ir.tri_e1[t_idx],
            tri_e2=ir.tri_e2[t_idx],
            tri_t1=ir.tri_t1[t_idx], tri_t2=ir.tri_t2[t_idx],
            tri_t3=ir.tri_t3[t_idx],
            tri_use_tex=ir.tri_use_tex[t_idx])
    else:
        z3 = jnp.zeros((prim.shape[0], 3), obj_inv.dtype)
        z2 = jnp.zeros((prim.shape[0], 2), obj_inv.dtype)
        ctx = ShapeCtx(obj_inv=obj_inv, shape_type=stype, params=params,
                       tri_p1=z3, tri_e1=z3, tri_e2=z3,
                       tri_t1=z2, tri_t2=z2, tri_t3=z2,
                       tri_use_tex=jnp.zeros(prim.shape, bool))
    return ctx


def _xform(m, p):
    """(R,4,4) x (R,3) point."""
    return jnp.einsum("rij,rj->ri", m[:, :3, :3], p) + m[:, :3, 3]


def _fmod(x, y):
    """C fmod: truncation remainder (keeps the sign of x)."""
    return x - y * jnp.trunc(x / y)


def _cmod2(t):
    """C `(int)t % 2 == 0` parity selector: True -> color a."""
    return (t.astype(jnp.int32) % 2) == 0


# ---------------------------------------------------------------------------
# uv maps (face, u, v per point)
# ---------------------------------------------------------------------------

def _uv_map(ir: SceneIR, map_kind, ctx: ShapeCtx, p, kinds):
    """Compute (face, u, v) for the map kinds present, select by map_kind."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zero_i = jnp.zeros_like(x, dtype=jnp.int32)
    zero_f = jnp.zeros_like(x)

    conds_f, us, vs = [], [], []
    conds_face, faces = [], []

    if IR.MAP_SPHERE in kinds:
        theta = jnp.arctan2(x, z)
        radius = jnp.sqrt(jnp.sum(p * p, axis=-1))
        phi = jnp.arccos(jnp.clip(y / jnp.where(radius == 0, 1.0, radius),
                                  -1, 1))
        conds_f.append(map_kind == IR.MAP_SPHERE)
        us.append(1.0 - (theta / (2.0 * jnp.pi) + 0.5))
        vs.append(1.0 - phi / jnp.pi)

    if IR.MAP_PLANE in kinds:
        pl_u = _fmod(x, 1.0)
        pl_u = jnp.where(pl_u < 0, pl_u + 1.0, pl_u)
        pl_v = _fmod(z, 1.0)
        pl_v = jnp.where(pl_v < 0, pl_v + 1.0, pl_v)
        conds_f.append(map_kind == IR.MAP_PLANE)
        us.append(pl_u)
        vs.append(pl_v)

    if IR.MAP_CYLINDER in kinds:
        theta = jnp.arctan2(x, z)
        cyl_min, cyl_max = ctx.params[..., 0], ctx.params[..., 1]
        cyl_face = jnp.where((cyl_max - EPSILON) <= y, 1,
                             jnp.where((cyl_min + EPSILON) >= y, 2, 0))
        cap_u = _fmod(x + 1.0, 2.0) / 2.0
        top_v = _fmod(1.0 - z, 2.0) / 2.0
        bot_v = _fmod(z + 1.0, 2.0) / 2.0
        cyl_u = jnp.where(cyl_face == 0,
                          1.0 - (theta / (2.0 * jnp.pi) + 0.5), cap_u)
        cyl_v = jnp.where(cyl_face == 0, _fmod(y, 1.0),
                          jnp.where(cyl_face == 1, top_v, bot_v))
        conds_f.append(map_kind == IR.MAP_CYLINDER)
        us.append(cyl_u)
        vs.append(cyl_v)
        conds_face.append(map_kind == IR.MAP_CYLINDER)
        faces.append(cyl_face.astype(jnp.int32))

    if IR.MAP_CUBE in kinds:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        coord = jnp.maximum(jnp.maximum(ax, ay), az)
        eq = lambda a, b: jnp.abs(a - b) < EPSILON
        cube_face = jnp.where(eq(coord, x), 0,
                     jnp.where(eq(coord, -x), 1,
                      jnp.where(eq(coord, y), 2,
                       jnp.where(eq(coord, -y), 3,
                        jnp.where(eq(coord, z), 4, 5)))))
        u_right = _fmod(1.0 - z, 2.0) / 2.0
        u_left = _fmod(z + 1.0, 2.0) / 2.0
        u_x = _fmod(x + 1.0, 2.0) / 2.0
        u_back = _fmod(1.0 - x, 2.0) / 2.0
        v_y = _fmod(y + 1.0, 2.0) / 2.0
        v_up = _fmod(1.0 - z, 2.0) / 2.0
        v_down = _fmod(z + 1.0, 2.0) / 2.0
        cube_u = jnp.select(
            [cube_face == 0, cube_face == 1, cube_face == 2, cube_face == 3,
             cube_face == 4],
            [u_right, u_left, u_x, u_x, u_x], u_back)
        cube_v = jnp.select(
            [cube_face == 2, cube_face == 3], [v_up, v_down], v_y)
        conds_f.append(map_kind == IR.MAP_CUBE)
        us.append(cube_u)
        vs.append(cube_v)
        conds_face.append(map_kind == IR.MAP_CUBE)
        faces.append(cube_face.astype(jnp.int32))

    if IR.MAP_TOROID in kinds:
        tor_r1 = ctx.params[..., 0]
        tor_u = 1.0 - (jnp.arctan2(z, x) + jnp.pi) / (2.0 * jnp.pi)
        tlen = jnp.sqrt(x * x + z * z)
        tor_v = (jnp.arctan2(y, tlen - tor_r1) + jnp.pi) / (2.0 * jnp.pi)
        conds_f.append(map_kind == IR.MAP_TOROID)
        us.append(tor_u)
        vs.append(tor_v)

    if IR.MAP_TRIANGLE in kinds:
        e1, e2 = ctx.tri_e1, ctx.tri_e2
        v2 = p - ctx.tri_p1
        d00 = jnp.sum(e1 * e1, -1)
        d01 = jnp.sum(e1 * e2, -1)
        d11 = jnp.sum(e2 * e2, -1)
        d20 = jnp.sum(v2 * e1, -1)
        d21 = jnp.sum(v2 * e2, -1)
        denom = d00 * d11 - d01 * d01
        inv_den = 1.0 / jnp.where(denom == 0, 1.0, denom)
        bv = _fmod((d11 * d20 - d01 * d21) * inv_den, 1.0)
        bw = _fmod((d00 * d21 - d01 * d20) * inv_den, 1.0)
        bu = 1.0 - bv - bw
        t_interp = (bu[..., None] * ctx.tri_t1 + bv[..., None] * ctx.tri_t2
                    + (1.0 - bu - bv)[..., None] * ctx.tri_t3)
        tri_u = jnp.where(ctx.tri_use_tex, _fmod(t_interp[..., 0], 1.0), bu)
        tri_v = jnp.where(ctx.tri_use_tex, _fmod(t_interp[..., 1], 1.0), bv)
        tri_u = jnp.where(tri_u < 0, tri_u + 1.0, tri_u)
        tri_v = jnp.where(tri_v < 0, tri_v + 1.0, tri_v)
        conds_f.append(map_kind == IR.MAP_TRIANGLE)
        us.append(tri_u)
        vs.append(tri_v)

    face = (jnp.select(conds_face, faces, zero_i) if conds_face else zero_i)
    u = jnp.select(conds_f[:-1], us[:-1], us[-1]) if len(us) > 1 else us[0]
    v = jnp.select(conds_f[:-1], vs[:-1], vs[-1]) if len(vs) > 1 else vs[0]
    return face, u, v


# ---------------------------------------------------------------------------
# uv patterns
# ---------------------------------------------------------------------------

def _eval_uv(ir: SceneIR, pid, u, v, kinds):
    """Evaluate a uv-type pattern row at (u, v). pid: (R,) i32 (>=0)."""
    pid = jnp.clip(pid, 0, max(ir.meta.n_patterns - 1, 0))
    ptype = ir.pat_type[pid]
    colors = ir.pat_colors[pid]          # (R,5,3)
    params = ir.pat_params[pid]
    conds, outs = [], []

    if IR.PAT_UV_CHECKER in kinds:
        # uv_check_uv_pattern_at (pattern.c:251-265)
        u2 = jnp.floor(u * params[..., 0]).astype(jnp.int32)
        v2 = jnp.floor(v * params[..., 1]).astype(jnp.int32)
        checker = jnp.where((((u2 + v2) % 2) == 0)[..., None],
                            colors[:, 0], colors[:, 1])
        conds.append((ptype == IR.PAT_UV_CHECKER)[..., None])
        outs.append(checker)

    if IR.PAT_UV_ALIGN_CHECK in kinds:
        # (pattern.c:228-249): colors = main,ul,ur,bl,br
        main, ul, ur, bl, br = (colors[:, i] for i in range(5))
        top = jnp.where((u < 0.2)[..., None], ul,
                        jnp.where((u > 0.8)[..., None], ur, main))
        bottom = jnp.where((u < 0.2)[..., None], bl,
                           jnp.where((u > 0.8)[..., None], br, main))
        align = jnp.where((v > 0.8)[..., None], top,
                          jnp.where((v < 0.2)[..., None], bottom, main))
        conds.append((ptype == IR.PAT_UV_ALIGN_CHECK)[..., None])
        outs.append(align)

    if IR.PAT_UV_TEXTURE in kinds:
        # (pattern.c:285-297): v flip, x/y swap, nearest-round
        tex_id = jnp.clip(ir.pat_tex[pid], 0, ir.tex_offset.shape[0] - 1)
        tw = ir.tex_width[tex_id]
        th = ir.tex_height[tex_id]
        vv = 1.0 - v
        col = jnp.floor(u * (tw - 1).astype(u.dtype) + 0.5).astype(jnp.int32)
        row = jnp.floor(vv * (th - 1).astype(u.dtype) + 0.5).astype(jnp.int32)
        idx = ir.tex_offset[tex_id] + row * tw + col
        texel = ir.tex_data[jnp.clip(idx, 0, ir.tex_data.shape[0] - 1)]
        conds.append((ptype == IR.PAT_UV_TEXTURE)[..., None])
        outs.append(texel)

    if IR.PAT_UV_GRADIENT in kinds:
        a, b = colors[:, 0], colors[:, 1]
        frac_g = (u - jnp.floor(u))[..., None]
        conds.append((ptype == IR.PAT_UV_GRADIENT)[..., None])
        outs.append(a + (b - a) * frac_g)

    if IR.PAT_UV_RADIAL_GRADIENT in kinds:
        a, b = colors[:, 0], colors[:, 1]
        mag = jnp.sqrt(u * u)
        frac_r = (mag - jnp.floor(mag))[..., None]
        conds.append((ptype == IR.PAT_UV_RADIAL_GRADIENT)[..., None])
        outs.append(a + (b - a) * frac_r)

    if not outs:
        return jnp.zeros(u.shape + (3,), u.dtype)
    if len(outs) == 1:
        return outs[0]
    out = outs[-1]
    for c, o in zip(conds[:-1][::-1], outs[:-1][::-1]):
        out = jnp.where(c, o, out)
    return out


# ---------------------------------------------------------------------------
# main evaluator
# ---------------------------------------------------------------------------

def eval_pattern(ir: SceneIR, pid, ctx: ShapeCtx, world_pt,
                 ov_a=None, ov_b=None, depth=None):
    """pattern_at_shape for a batch: pid (R,), world_pt (R,3) -> (R,3).

    Rows with pid < 0 return black (callers select the material constant).
    """
    meta = ir.meta
    if meta.n_patterns == 0:
        return jnp.zeros_like(world_pt)
    kinds = set(meta.pattern_kinds)
    if depth is None:
        depth = meta.pattern_depth
    valid = pid >= 0
    pid_c = jnp.clip(pid, 0, meta.n_patterns - 1)
    ptype = ir.pat_type[pid_c]
    colors = ir.pat_colors[pid_c]
    a = colors[:, 0] if ov_a is None else ov_a
    b = colors[:, 1] if ov_b is None else ov_b

    concrete = kinds & {IR.PAT_CHECKER, IR.PAT_GRADIENT,
                        IR.PAT_RADIAL_GRADIENT, IR.PAT_RING, IR.PAT_STRIPE}
    conds, outs = [], []

    if concrete or IR.PAT_MAP in kinds:
        obj_pt = _xform(ctx.obj_inv, world_pt)
        pat_pt = _xform(ir.pat_inv_tf[pid_c], obj_pt)
        x, y, z = pat_pt[..., 0], pat_pt[..., 1], pat_pt[..., 2]

    if IR.PAT_CHECKER in kinds:
        sel = _cmod2(jnp.floor(x) + jnp.floor(y) + jnp.floor(z))
        conds.append((ptype == IR.PAT_CHECKER)[..., None])
        outs.append(jnp.where(sel[..., None], a, b))
    if IR.PAT_GRADIENT in kinds:
        frac = (x - jnp.floor(x))[..., None]
        conds.append((ptype == IR.PAT_GRADIENT)[..., None])
        outs.append(a + (b - a) * frac)
    if IR.PAT_RADIAL_GRADIENT in kinds:
        mag = jnp.sqrt(x * x + z * z)
        rfrac = (mag - jnp.floor(mag))[..., None]
        conds.append((ptype == IR.PAT_RADIAL_GRADIENT)[..., None])
        outs.append(a + (b - a) * rfrac)
    if IR.PAT_RING in kinds:
        mag = jnp.sqrt(x * x + z * z)
        conds.append((ptype == IR.PAT_RING)[..., None])
        outs.append(jnp.where(_cmod2(jnp.floor(mag))[..., None], a, b))
    if IR.PAT_STRIPE in kinds:
        conds.append((ptype == IR.PAT_STRIPE)[..., None])
        outs.append(jnp.where(_cmod2(jnp.floor(x))[..., None], a, b))

    if IR.PAT_MAP in kinds:
        map_kind = ir.pat_map_kind[pid_c]
        face, u, v = _uv_map(ir, map_kind, ctx, pat_pt,
                             kinds=set(meta.map_kinds))
        face_pid = jnp.take_along_axis(ir.pat_children[pid_c],
                                       face[..., None], axis=-1)[..., 0]
        uv_result = _eval_uv(ir, face_pid, u, v, kinds)
        conds.append((ptype == IR.PAT_MAP)[..., None])
        outs.append(uv_result)

    if depth > 0 and kinds & {IR.PAT_BLENDED, IR.PAT_NESTED,
                              IR.PAT_PERTURBED}:
        kids = ir.pat_children[pid_c]                     # (R,6)
        if IR.PAT_BLENDED in kinds:
            isb = ptype == IR.PAT_BLENDED
            c1 = eval_pattern(ir, jnp.where(isb, kids[:, 0], -1),
                              ctx, world_pt, depth=depth - 1)
            c2 = eval_pattern(ir, jnp.where(isb, kids[:, 1], -1),
                              ctx, world_pt, depth=depth - 1)
            conds.append(isb[..., None])
            outs.append((c1 + c2) / 2.0)

        if IR.PAT_NESTED in kinds:
            # child2/child3 colors override child1's a/b (pattern.c:41-76)
            isn = ptype == IR.PAT_NESTED
            n2 = eval_pattern(ir, jnp.where(isn, kids[:, 1], -1),
                              ctx, world_pt, depth=depth - 1)
            n3 = eval_pattern(ir, jnp.where(isn, kids[:, 2], -1),
                              ctx, world_pt, depth=depth - 1)
            n1 = eval_pattern(ir, jnp.where(isn, kids[:, 0], -1),
                              ctx, world_pt, ov_a=n2, ov_b=n3,
                              depth=depth - 1)
            conds.append(isn[..., None])
            outs.append(n1)

        if IR.PAT_PERTURBED in kinds:
            # 3x noise domain warp of the world point (pattern.c:78-116)
            from fast_ray_tracer_tpu.ops.perlin import _smooth3d
            params = ir.pat_params[pid_c]
            freq, scale, persist = params[:, 0], params[:, 1], params[:, 2]
            seed = params[:, 4]
            px, py, pz = (world_pt[..., 0], world_pt[..., 1],
                          world_pt[..., 2])
            zz = pz
            nx = px + scale * _pnoise(ir, px, py, zz, persist, freq, seed,
                                      params[:, 3])
            zz = jnp.where(zz < 0, zz - 1.0, zz + 1.0)
            ny = py + scale * _pnoise(ir, px, py, zz, persist, freq, seed,
                                      params[:, 3])
            zz = jnp.where(zz < 0, zz - 1.0, zz + 1.0)
            nz = pz + scale * _pnoise(ir, px, py, zz, persist, freq, seed,
                                      params[:, 3])
            warped = jnp.stack([nx, ny, nz], axis=-1)
            is_pert = ptype == IR.PAT_PERTURBED
            wpt = jnp.where(is_pert[..., None], warped, world_pt)
            pc = eval_pattern(ir, jnp.where(is_pert, kids[:, 0], -1),
                              ctx, wpt, depth=depth - 1)
            conds.append(is_pert[..., None])
            outs.append(pc)

    # uv types reached directly (only via faces in practice) -> black
    if not outs:
        return jnp.zeros_like(world_pt)
    out = outs[-1]
    for c, o in zip(conds[:-1][::-1], outs[:-1][::-1]):
        out = jnp.where(c, o, out)
    return jnp.where(valid[..., None], out, 0.0)


def _pnoise(ir, x, y, z, persistence, frequency, seed, octaves_f):
    """pnoise3d with traced octave count, statically capped by the largest
    octave count in the scene (masked unroll)."""
    from fast_ray_tracer_tpu.ops.perlin import _smooth3d
    total = jnp.zeros_like(x)
    amplitude = jnp.ones_like(x)
    freq = frequency
    seed_i = seed.astype(jnp.int32)
    for i in range(max(1, ir.meta.max_perlin_octaves)):
        active = i < octaves_f
        total = total + jnp.where(
            active, _smooth3d(x * freq, y * freq, z * freq,
                              jnp.int32(i), seed_i) * amplitude, 0.0)
        freq = freq / 2.0
        amplitude = amplitude * persistence
    return total
