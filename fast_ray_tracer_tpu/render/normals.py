"""Surface normals for every primitive type, batched.

Matches local_normal_at per type (src/shapes/*.c) followed by
normal_to_world (src/shapes/shapes.c:91-113). Parent chains are
pre-composed at compile, and normalize() between parent levels collapses
into one final normalize (linear maps commute with positive scaling), so
the world normal is normalize(inv_tf^T[:3,:3] @ local_normal). Smooth
triangles interpolate *pre-transformed unnormalized* vertex normals —
identical to transforming the object-space interpolation.

Bump mapping (shape_normal_at, shapes.c:62-89): world_normal +=
2*map_bump(world_point) - 1, then normalize.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fast_ray_tracer_tpu.constants import EPSILON
from fast_ray_tracer_tpu.ops.patterns import ShapeCtx, eval_pattern
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR


def _local_normal(stype, params, p):
    """Object-space normal for analytic types; p: (R,3)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    sphere = p

    plane = jnp.stack([jnp.zeros_like(x), jnp.ones_like(x),
                       jnp.zeros_like(x)], -1)

    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    maxc = jnp.maximum(jnp.maximum(ax, ay), az)
    eq = lambda a, b: jnp.abs(a - b) < EPSILON
    zero = jnp.zeros_like(x)
    cube = jnp.where(eq(maxc, ax)[..., None],
                     jnp.stack([x, zero, zero], -1),
                     jnp.where(eq(maxc, ay)[..., None],
                               jnp.stack([zero, y, zero], -1),
                               jnp.stack([zero, zero, z], -1)))

    mn, mx = params[..., 0], params[..., 1]
    dist = x * x + z * z
    cyl_side = jnp.stack([x, zero, z], -1)
    up = jnp.stack([zero, jnp.ones_like(x), zero], -1)
    down = -up
    cyl = jnp.where(((dist < 1) & (y >= mx - EPSILON))[..., None], up,
                    jnp.where(((dist < 1) & (y <= mn + EPSILON))[..., None],
                              down, cyl_side))

    cone_y = jnp.sqrt(jnp.where(dist > 0.0, dist, 1.0))
    cone_y = jnp.where(dist > 0.0, cone_y, 0.0)
    cone_y = jnp.where(y > 0, -cone_y, cone_y)
    cone_side = jnp.stack([x, cone_y, z], -1)
    cone = jnp.where(((dist < 1) & (y >= mx - EPSILON))[..., None], up,
                     jnp.where(((dist < 1) & (y <= mn + EPSILON))[..., None],
                               down, cone_side))

    r1, r2 = params[..., 0], params[..., 1]
    p_sq = r1 * r1 + r2 * r2
    mag = x * x + y * y + z * z
    tor = jnp.stack([
        4.0 * x * (mag - p_sq),
        4.0 * y * (mag - p_sq + 2.0 * r1 * r1),
        4.0 * z * (mag - p_sq),
    ], -1)
    tor = tor / jnp.sqrt(jnp.sum(tor * tor, axis=-1, keepdims=True).clip(jnp.finfo(tor.dtype).tiny))

    return jnp.select(
        [(stype == IR.SPHERE)[..., None], (stype == IR.PLANE)[..., None],
         (stype == IR.CUBE)[..., None], (stype == IR.CYLINDER)[..., None],
         (stype == IR.CONE)[..., None]],
        [sphere, plane, cube, cyl, cone], tor)


def normal_at(ir: SceneIR, ctx: ShapeCtx, prim, world_pt, tri_u, tri_v,
              mat_bump_pid=None):
    """World-space unit normal at the hit (pre bump already included when
    mat_bump_pid given)."""
    meta = ir.meta
    obj_pt = jnp.einsum("rij,rj->ri", ctx.obj_inv[:, :3, :3], world_pt) \
        + ctx.obj_inv[:, :3, 3]
    local = _local_normal(ctx.shape_type, ctx.params, obj_pt)
    # normal_to_world: inv^T on the linear part, then normalize
    world = jnp.einsum("rji,rj->ri", ctx.obj_inv[:, :3, :3], local)

    if meta.n_triangles:
        na = meta.n_analytic
        t_idx = jnp.clip(prim - na, 0, meta.n_triangles - 1)
        w = (1.0 - tri_u - tri_v)[..., None]
        tri_n = (w * ir.tri_n1[t_idx] + tri_u[..., None] * ir.tri_n2[t_idx]
                 + tri_v[..., None] * ir.tri_n3[t_idx])
        world = jnp.where((prim >= na)[..., None], tri_n, world)

    world = world / jnp.sqrt(jnp.sum(world * world, axis=-1,
                                     keepdims=True)
                             .clip(jnp.finfo(world.dtype).tiny))

    if mat_bump_pid is not None and meta.any_bump:
        bump = eval_pattern(ir, mat_bump_pid, ctx, world_pt)
        perturbed = 2.0 * bump - 1.0
        has = (mat_bump_pid >= 0)[..., None]
        world = jnp.where(has, world + perturbed, world)
        world = world / jnp.sqrt(jnp.sum(world * world, axis=-1,
                                         keepdims=True)
                                 .clip(jnp.finfo(world.dtype).tiny))
    return world
