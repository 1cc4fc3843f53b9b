"""Ray-primitive intersection unit tests against the book's closed-form
oracle values (the reference has no test suite; these are the canonical
Ray-Tracer-Challenge cases its shapes implement — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_ray_tracer_tpu.ops import intersect as I
from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene.model import SceneDesc, ShapeDesc


def _ir_of(*shapes):
    return compile_scene(SceneDesc(world=list(shapes)), dtype=jnp.float64)


def _ts(ir, origin, direction):
    o = jnp.asarray([origin], jnp.float64)
    d = jnp.asarray([direction], jnp.float64)
    t = np.asarray(I.intersect_candidates(ir, o, d))[0]
    return np.sort(t[np.isfinite(t)])


def test_sphere_hits():
    ir = _ir_of(ShapeDesc(kind="sphere"))
    assert np.allclose(_ts(ir, [0, 0, -5], [0, 0, 1]), [4.0, 6.0])
    assert np.allclose(_ts(ir, [0, 1, -5], [0, 0, 1]), [5.0, 5.0])
    assert _ts(ir, [0, 2, -5], [0, 0, 1]).size == 0
    assert np.allclose(_ts(ir, [0, 0, 0], [0, 0, 1]), [-1.0, 1.0])
    assert np.allclose(_ts(ir, [0, 0, 5], [0, 0, 1]), [-6.0, -4.0])


def test_sphere_transformed():
    ir = _ir_of(ShapeDesc(kind="sphere", transform=[["scale", 2, 2, 2]]))
    assert np.allclose(_ts(ir, [0, 0, -5], [0, 0, 1]), [3.0, 7.0])
    ir = _ir_of(ShapeDesc(kind="sphere", transform=[["translate", 5, 0, 0]]))
    assert _ts(ir, [0, 0, -5], [0, 0, 1]).size == 0


def test_plane():
    ir = _ir_of(ShapeDesc(kind="plane"))
    assert _ts(ir, [0, 10, 0], [0, 0, 1]).size == 0   # parallel
    assert np.allclose(_ts(ir, [0, 1, 0], [0, -1, 0]), [1.0])
    assert np.allclose(_ts(ir, [0, -1, 0], [0, 1, 0]), [1.0])


def test_cube():
    ir = _ir_of(ShapeDesc(kind="cube"))
    cases = [
        ([5, 0.5, 0], [-1, 0, 0], 4, 6),
        ([-5, 0.5, 0], [1, 0, 0], 4, 6),
        ([0.5, 5, 0], [0, -1, 0], 4, 6),
        ([0.5, -5, 0], [0, 1, 0], 4, 6),
        ([0.5, 0, 5], [0, 0, -1], 4, 6),
        ([0.5, 0, -5], [0, 0, 1], 4, 6),
        ([0, 0.5, 0], [0, 0, 1], -1, 1),
    ]
    for o, d, t1, t2 in cases:
        assert np.allclose(_ts(ir, o, d), [t1, t2]), (o, d)
    for o, d in [([-2, 0, 0], [0.2673, 0.5345, 0.8018]),
                 ([2, 2, 0], [-1, 0, 0])]:
        assert _ts(ir, o, d).size == 0


def test_cylinder():
    ir = _ir_of(ShapeDesc(kind="cylinder"))
    assert _ts(ir, [1, 0, 0], [0, 1, 0]).size == 0
    assert np.allclose(_ts(ir, [1, 0, -5], [0, 0, 1]), [5.0, 5.0])
    assert np.allclose(_ts(ir, [0, 0, -5], [0, 0, 1]), [4.0, 6.0])
    ts = _ts(ir, [0.5, 0, -5],
             np.asarray([0.1, 1, 1]) / np.linalg.norm([0.1, 1, 1]))
    assert np.allclose(ts, [6.80798, 7.08872], atol=1e-4)


def test_cylinder_truncated_closed():
    ir = _ir_of(ShapeDesc(kind="cylinder", minimum=1.0, maximum=2.0))
    d = np.asarray([0.1, 1, 0]) / np.linalg.norm([0.1, 1, 0])
    assert _ts(ir, [0, 1.5, 0], d).size == 0
    assert _ts(ir, [0, 3, -5], [0, 0, 1]).size == 0
    assert _ts(ir, [0, 1.5, -2], [0, 0, 1]).size == 2
    irc = _ir_of(ShapeDesc(kind="cylinder", minimum=1.0, maximum=2.0,
                           closed=True))
    assert _ts(irc, [0, 3, 0], [0, -1, 0]).size == 2
    assert _ts(irc, [0, 0, -2], np.asarray([0, 1, 2]) / np.sqrt(5)).size == 2


def test_cone():
    ir = _ir_of(ShapeDesc(kind="cone"))
    assert np.allclose(_ts(ir, [0, 0, -5], [0, 0, 1]), [5.0, 5.0])
    d = np.asarray([1.0, 1, 1]) / np.sqrt(3)
    assert np.allclose(_ts(ir, [0, 0, -5], d), [8.66025], atol=1e-4)
    d = np.asarray([-0.5, -1, 1]) / np.linalg.norm([-0.5, -1, 1])
    assert np.allclose(_ts(ir, [1, 1, -5], d), [4.55006, 49.44994], atol=1e-4)
    # parallel to one half: single hit
    d = np.asarray([0.0, 1, 1]) / np.sqrt(2)
    assert np.allclose(_ts(ir, [0, 0, -1], d), [0.35355], atol=1e-4)


def test_cone_capped():
    ir = _ir_of(ShapeDesc(kind="cone", minimum=-0.5, maximum=0.5,
                          closed=True))
    assert _ts(ir, [0, 0, -5], [0, 1, 0]).size == 0
    d = np.asarray([0.0, 1, 1]) / np.sqrt(2)
    assert _ts(ir, [0, 0, -0.25], d).size == 2
    assert _ts(ir, [0, 0, -0.25], [0, 1, 0]).size == 4


def test_toroid():
    ir = _ir_of(ShapeDesc(kind="toroid", r1=1.0, r2=0.25))
    ts = _ts(ir, [0, 0, -5], [0, 0, 1])
    # ring torus centered at origin in xz: hits at z = -1.25,-0.75,0.75,1.25
    assert np.allclose(ts, [3.75, 4.25, 5.75, 6.25], atol=1e-6)
    assert _ts(ir, [0, 5, 0], [0, 1, 0]).size == 0


def test_triangle():
    tri = ShapeDesc(kind="triangle", p1=(0, 1, 0), p2=(-1, 0, 0),
                    p3=(1, 0, 0))
    ir = _ir_of(tri)
    assert np.allclose(_ts(ir, [0, 0.5, -2], [0, 0, 1]), [2.0])
    assert _ts(ir, [0, -1, -2], [0, 1, 0]).size == 0   # parallel
    assert _ts(ir, [1, 1, -2], [0, 0, 1]).size == 0    # misses p1-p3 edge
    assert _ts(ir, [-1, 1, -2], [0, 0, 1]).size == 0
    assert _ts(ir, [0, -1, -2], [0, 0, 1]).size == 0


def test_group_transform_composition():
    # book ch.14 "Intersecting a transformed group":
    # group(scale(2)) > sphere(translate(5,0,0)), ray(10,0,-10)+z -> 2 hits
    inner = ShapeDesc(kind="sphere", transform=[["translate", 5, 0, 0]])
    g = ShapeDesc(kind="group", transform=[["scale", 2, 2, 2]],
                  children=[inner])
    ir = _ir_of(g)
    ts = _ts(ir, [10, 0, -10], [0, 0, 1])
    assert ts.size == 2


def test_nested_group_world_to_object_equivalent():
    # book: g1(ry(pi/2)) > g2(scale(2)) > sphere(translate(5,0,0));
    # world point (-2, 0, -10) maps to object point (4, 0, -1) — i.e. the
    # sphere surface is reachable along the composed chain. Check via a ray
    # aimed at the transformed sphere center Ry(pi/2)@S(2)@(5,0,0)=(0,0,-10).
    inner = ShapeDesc(kind="sphere", transform=[["translate", 5, 0, 0]])
    g2 = ShapeDesc(kind="group", transform=[["scale", 2, 2, 2]],
                   children=[inner])
    g1 = ShapeDesc(kind="group", transform=[["rotate-y", np.pi / 2]],
                   children=[g2])
    ir = _ir_of(g1)
    ts = _ts(ir, [0, 0, -20], [0, 0, 1])   # center (0,0,-10), radius 2
    assert ts.size == 2
    assert np.allclose(ts, [8.0, 12.0], atol=1e-9)


def refraction_indices(t_sorted, prim_sorted, t_hit, prim_ni):
    """Test oracle: the straightforward top_k-based "containers" walk
    (renderer.c:406-447) the production sort-free containers_n1_n2
    replaced. For the hit at t_hit: an object is inside-the-containers
    iff it has an odd number of intersections strictly before the hit in
    sorted order; n1 is the Ni of the inside object with the *latest*
    pre-hit intersection; n2 repeats with the hit included. The walk
    covers ALL intersections (negative t included)."""
    import jax.numpy as jnp
    R, K = t_sorted.shape
    valid = jnp.isfinite(t_sorted)
    is_hit = valid & (t_sorted == t_hit[:, None])
    hit_k = jnp.argmax(is_hit, axis=-1)
    jj = jnp.arange(K)[:, None]                          # j (other entry)
    kk = jnp.arange(K)[None, :]                          # k (query entry)
    same = (prim_sorted[:, :, None] == prim_sorted[:, None, :]) \
        & valid[:, :, None] & valid[:, None, :]          # (R,K,K) [j,k]
    occ_before = jnp.sum(same & (jj < kk)[None], axis=1)          # (R,K)
    nxt = jnp.min(jnp.where(same & (jj > kk)[None],
                            jnp.broadcast_to(jj[None], same.shape), K),
                  axis=1)                                          # (R,K)
    even_before = (occ_before % 2) == 0
    k_idx = jnp.arange(K)[None, :]

    def last_inside_ni(limit_excl):
        in_walk = k_idx < limit_excl[:, None]            # (R,K): k < L
        active = valid & in_walk & even_before \
            & (nxt >= limit_excl[:, None])
        best = jnp.max(jnp.where(active, k_idx, -1), axis=-1)
        any_active = best >= 0
        prim_at = jnp.take_along_axis(prim_sorted,
                                      jnp.maximum(best, 0)[:, None], 1)[:, 0]
        ni = prim_ni[jnp.clip(prim_at, 0, prim_ni.shape[0] - 1)]
        return jnp.where(any_active, ni, 1.0)

    n1 = last_inside_ni(hit_k)
    n2 = last_inside_ni(hit_k + 1)
    return n1, n2


def test_containers_walk_equivalence():
    """containers_n1_n2 (sort-free, per-prim parity) must reproduce the
    top_k-based refraction_indices walk on randomized candidate lists."""
    import numpy as np
    import jax.numpy as jnp
    from fast_ray_tracer_tpu.ops.intersect import (
        containers_n1_n2, slot_tables, sorted_hits,
    )
    from fast_ray_tracer_tpu.scene import ir as IR

    class Meta:
        # 3 spheres, 1 cylinder, 2 triangles: mixed k, contiguous blocks
        type_ranges = ((IR.SPHERE, 0, 3), (IR.CYLINDER, 3, 1))
        n_triangles = 2
        n_analytic = 4
        use_clusters = False

    slot_prim = slot_tables(Meta)
    H = len(slot_prim)
    rng = np.random.default_rng(7)
    R = 512
    prim_ni = jnp.asarray(rng.uniform(1.0, 2.5, 6))
    # candidate ts: mix of misses, negatives, duplicates-of-the-hit
    t = rng.uniform(-3.0, 9.0, (R, H))
    t[rng.random((R, H)) < 0.35] = np.inf
    t_cand = jnp.asarray(t)
    tpos = np.where(t > 0, t, np.inf)
    t_hit = jnp.asarray(tpos.min(axis=1))     # first positive hit (or inf)

    ts, ps = sorted_hits(t_cand, slot_prim, H)
    n1_old, n2_old = refraction_indices(ts, ps, t_hit, prim_ni)
    n1_new, n2_new = containers_n1_n2(Meta, t_cand, t_hit, prim_ni)
    hitv = np.isfinite(np.asarray(t_hit))     # garbage allowed on misses
    np.testing.assert_allclose(np.asarray(n1_new)[hitv],
                               np.asarray(n1_old)[hitv], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(n2_new)[hitv],
                               np.asarray(n2_old)[hitv], rtol=0, atol=0)


def test_csg_pairwise_matches_sorted_path():
    """apply_csg_filter's sort-free pairwise path (K <= _CSG_PAIRWISE_MAX)
    must agree EXACTLY with the argsort walk on identical inputs,
    including t-ties and shadow group truncation."""
    import numpy as np
    import jax.numpy as jnp
    from fast_ray_tracer_tpu.ops import intersect as I

    rng = np.random.default_rng(11)
    K = 6
    R = 512
    # candidate ts with misses and deliberate duplicates (tie-break!)
    ts = rng.uniform(0.1, 3.0, (R, K))
    ts[rng.random((R, K)) < 0.3] = np.inf
    ts[:, 3] = ts[:, 1]                       # guaranteed ties
    t_cand = jnp.asarray(ts)
    slots = np.arange(K, dtype=np.int32)
    in_node0 = np.asarray([1, 1, 1, 1, 0, 0], bool)
    lhit0 = np.asarray([1, 1, 0, 0, 0, 0], bool)
    in_node1 = np.ones(K, bool)
    lhit1 = np.asarray([1, 1, 1, 1, 0, 0], bool)
    branch = np.asarray([0, 0, 1, 1, 2, 2], np.int32)
    for shadow in (False, True):
        for op0 in (0, 1, 2):
            prog = (("g", 3, branch),
                    ("c", in_node0, lhit0, op0),
                    ("c", in_node1, lhit1, 2))
            tables = [(slots, prog)]
            old = I._CSG_PAIRWISE_MAX
            try:
                I._CSG_PAIRWISE_MAX = 16
                got = np.asarray(I.apply_csg_filter(t_cand, tables,
                                                    shadow=shadow))
                I._CSG_PAIRWISE_MAX = 0
                ref = np.asarray(I.apply_csg_filter(t_cand, tables,
                                                    shadow=shadow))
            finally:
                I._CSG_PAIRWISE_MAX = old
            np.testing.assert_array_equal(got, ref), (shadow, op0)
