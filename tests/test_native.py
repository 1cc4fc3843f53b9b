"""Native C++ host-runtime parity vs the pure-Python fallbacks.

The native paths (fast_ray_tracer_tpu/native/) must be bit-identical to
the Python implementations they replace: same OBJ parse records, same
divide-sim shadow ranks.
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE

from fast_ray_tracer_tpu import native
from fast_ray_tracer_tpu.scene import divide as div


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


@needs_native
def test_obj_parse_matches_python_scanner():
    """Native parse of the teapot OBJ returns the same vertices, fan
    triangles, groups, and flags as the Python line scanner."""
    path = str(REFERENCE / "scenes/teapot/teapot_low.obj")
    g = native.parse_obj(path)

    verts, texs, norms = [], [], []
    tris = []  # ((v),(t),(n),use_n,use_t,group)
    group_order = ["##default_group"]
    current = "##default_group"

    from fast_ray_tracer_tpu.scene.obj_loader import _face_token
    with open(path) as f:
        for raw in f:
            if raw.startswith("v "):
                p = raw.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif raw.startswith("vt "):
                p = raw.split()
                texs.append((float(p[1]), float(p[2]),
                             float(p[3]) if len(p) > 3 else 0.0))
            elif raw.startswith("vn "):
                p = raw.split()
                norms.append((float(p[1]), float(p[2]), float(p[3])))
            elif raw.startswith("f "):
                toks = raw.split()[1:]
                if len(toks) < 3:
                    continue
                v0, t0, n0 = _face_token(toks[0])
                for i in range(1, len(toks) - 1):
                    v1, t1, n1 = _face_token(toks[i])
                    v2, t2, n2 = _face_token(toks[i + 1])
                    tris.append(((v0, v1, v2), (t0, t1, t2), (n0, n1, n2),
                                 n0 > 0, t0 > 0, current))
            elif raw.startswith("g "):
                name = raw.split()[1] if len(raw.split()) > 1 else ""
                if name not in group_order:
                    group_order.append(name)
                current = name

    np.testing.assert_array_equal(g.v, np.asarray(verts))
    np.testing.assert_array_equal(g.vt, np.asarray(texs))
    np.testing.assert_array_equal(g.vn, np.asarray(norms))
    assert g.group_names == group_order
    assert g.tri.shape[0] == len(tris)
    for i, (vi, ti, ni, use_n, use_t, gname) in enumerate(tris):
        got = g.tri[i]
        assert tuple(got[:, 0]) == vi
        assert tuple(got[:, 1]) == ti
        assert tuple(got[:, 2]) == ni
        assert bool(g.use_n[i]) == use_n
        assert bool(g.use_t[i]) == use_t
        assert g.group_names[g.group[i]] == gname


def _random_tree(rng, n_leaves=200):
    """A group tree with random transforms, nested groups, and a CSG."""
    leaves = []
    for i in range(n_leaves):
        t = list(div.IDENTITY)
        t[3] = float(rng.uniform(-10, 10))    # tx
        t[7] = float(rng.uniform(-10, 10))    # ty
        t[11] = float(rng.uniform(-10, 10))   # tz
        t[0] = t[5] = t[10] = float(rng.uniform(0.1, 2.0))
        kind = ["sphere", "cube", "cylinder"][i % 3]
        leaves.append(div.Node(
            kind=kind, transform=t, leaf_id=i,
            obj_box=div.leaf_box(kind, minimum=-1.0, maximum=1.0)))
    # nest: a couple of subgroups + a csg over two leaves
    g1 = div.Node(kind="group", transform=list(div.IDENTITY),
                  children=leaves[: n_leaves // 3])
    csg = div.Node(kind="csg", transform=list(div.IDENTITY),
                   left=leaves[n_leaves // 3],
                   right=leaves[n_leaves // 3 + 1],
                   leaf_id=leaves[n_leaves // 3].leaf_id)
    rest = leaves[n_leaves // 3 + 2:]
    root = div.Node(kind="group", transform=list(div.IDENTITY),
                    children=[g1, csg] + rest)
    return root


@needs_native
@pytest.mark.parametrize("threshold", [1, 4, 64])
def test_shadow_ranks_native_matches_python(threshold):
    rng = np.random.default_rng(threshold)
    root_py = _random_tree(rng)
    rng = np.random.default_rng(threshold)
    root_nat = _random_tree(rng)

    # CSG children share the left leaf's id; count distinct leaf documents
    ids = []
    div.collect_leaf_order(root_py, ids)
    n_leaves = len(ids)
    # renumber so ids are a permutation of range(n)
    remap = {lid: i for i, lid in enumerate(sorted(set(ids)))}
    assert len(remap) == n_leaves

    def renumber(node):
        if node.kind == "group":
            for c in node.children:
                renumber(c)
        else:
            node.leaf_id = remap[node.leaf_id]
    renumber(root_py)
    renumber(root_nat)

    ranks_native = native.shadow_ranks(root_nat, threshold, n_leaves)
    assert ranks_native is not None

    div.divide(root_py, threshold)
    order = []
    div.collect_leaf_order(root_py, order)
    ranks_py = [0] * n_leaves
    for pos, lid in enumerate(order):
        ranks_py[lid] = pos

    assert ranks_native == ranks_py


@needs_native
def test_shadow_ranks_infinite_boxes():
    """Plane leaves produce infinite boxes -> NaN split planes; native and
    Python must agree that such groups never reorder."""
    leaves = []
    for i in range(8):
        kind = "plane" if i % 2 == 0 else "sphere"
        t = list(div.IDENTITY)
        t[3] = float(i)
        leaves.append(div.Node(kind=kind, transform=t, leaf_id=i,
                               obj_box=div.leaf_box(kind)))

    def mk():
        import copy
        return div.Node(kind="group", transform=list(div.IDENTITY),
                        children=copy.deepcopy(leaves))

    ranks_native = native.shadow_ranks(mk(), 1, 8)
    root = mk()
    div.divide(root, 1)
    order = []
    div.collect_leaf_order(root, order)
    ranks_py = [0] * 8
    for pos, lid in enumerate(order):
        ranks_py[lid] = pos
    assert ranks_native == ranks_py
