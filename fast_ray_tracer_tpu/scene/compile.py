"""Scene compiler: SceneDesc (YAML-shaped objects) -> SceneIR tensors.

Replaces the reference's Python->C codegen (yaml_parser/*.py c_repr) plus the
C constructors: transform chains are composed and inverted here, group
hierarchies are dissolved by pre-composing parent transforms into leaves,
triangle meshes are pre-transformed to world space (barycentric coordinates
and Möller-Trumbore t values are affine-invariant, so intersection results
are unchanged), and materials/patterns/textures/lights flatten into tables.

Color handling matches the generated code: the YAML `color-space` decode
function is applied to material base colors and pattern colors on input
(yaml_parser/material.py:82-87, pattern.py:33-43), then Ka/Kd/Ks are the
decoded base color scaled by ambient/diffuse/specular.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from fast_ray_tracer_tpu import colors as colorlib
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static
from fast_ray_tracer_tpu.scene import divide as div
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR, SceneMeta
from fast_ray_tracer_tpu.scene.model import (
    LightDesc, MaterialDesc, PatternDesc, SceneDesc, ShapeDesc,
)

_KIND_TO_TYPE = {
    "sphere": IR.SPHERE, "plane": IR.PLANE, "cube": IR.CUBE,
    "cylinder": IR.CYLINDER, "cone": IR.CONE, "toroid": IR.TOROID,
}

_PAT_KIND = {
    "checker": IR.PAT_CHECKER, "gradient": IR.PAT_GRADIENT,
    "radial_gradient": IR.PAT_RADIAL_GRADIENT, "ring": IR.PAT_RING,
    "stripe": IR.PAT_STRIPE, "blended": IR.PAT_BLENDED,
    "nested": IR.PAT_NESTED, "perturbed": IR.PAT_PERTURBED,
    "map": IR.PAT_MAP, "uv_checker": IR.PAT_UV_CHECKER,
    "uv_align_check": IR.PAT_UV_ALIGN_CHECK, "uv_image": IR.PAT_UV_TEXTURE,
    "uv_gradient": IR.PAT_UV_GRADIENT,
    "uv_radial_gradient": IR.PAT_UV_RADIAL_GRADIENT,
}

_MAP_KIND = {
    "cube": IR.MAP_CUBE, "cylinder": IR.MAP_CYLINDER, "plane": IR.MAP_PLANE,
    "sphere": IR.MAP_SPHERE, "toroid": IR.MAP_TOROID,
    "triangle": IR.MAP_TRIANGLE,
}

_LIGHT_KIND = {
    "point": IR.LIGHT_POINT, "area": IR.LIGHT_AREA,
    "circle": IR.LIGHT_CIRCLE, "hemisphere": IR.LIGHT_HEMISPHERE,
}


def transform_matrix(item) -> np.ndarray:
    """One YAML transform entry -> 4x4 (host float64)."""
    op = item[0]
    m = np.eye(4)
    if op == "translate":
        m[:3, 3] = item[1:4]
    elif op == "scale":
        m[0, 0], m[1, 1], m[2, 2] = item[1:4]
    elif op == "rotate-x":
        c, s = math.cos(item[1]), math.sin(item[1])
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    elif op == "rotate-y":
        c, s = math.cos(item[1]), math.sin(item[1])
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    elif op == "rotate-z":
        c, s = math.cos(item[1]), math.sin(item[1])
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    elif op == "shear":
        (m[0, 1], m[0, 2], m[1, 0], m[1, 2], m[2, 0], m[2, 1]) = item[1:7]
    else:
        raise ValueError(f"Unknown transform: {op}")
    return m


def compose_chain(chain) -> np.ndarray:
    """YAML transform list -> matrix; later entries apply last
    (reference transform_chain semantics, yaml_parser/transform.py:26-40)."""
    m = np.eye(4)
    for item in chain or []:
        m = transform_matrix(item) @ m
    return m


class _Tables:
    """Mutable accumulators during the compile walk."""

    def __init__(self, decode, root_dir):
        self.decode = decode           # input color decode fn (numpy)
        self.root_dir = root_dir
        # analytic prims
        self.a_type: List[int] = []
        self.a_inv: List[np.ndarray] = []
        self.a_params: List[List[float]] = []
        self.a_mat: List[int] = []
        self.a_csg: List[Tuple[int, int]] = []
        self.a_doc: List[int] = []        # document-order leaf id per prim
        # triangles: per-triangle rows (yaml `triangle` adds) + bulk
        # blocks of column arrays (OBJ meshes, scene/obj_loader.py)
        self.t_rows: List[Tuple] = []     # (p1,p2,p3,n1,n2,n3,t1,t2,t3,use_tex,mat,csg,side)
        self.t_doc: List[int] = []
        self.t_blocks: List[Dict] = []
        self.next_leaf = 0                # shared doc-order leaf counter
        # csg trees: per tree, postorder filter program (see _csg_prog)
        self.csg_trees: List[Tuple] = []
        self.csg_div_roots: List[div.Node] = []   # pre-divide sim subtree
        self.csg_node_ops: List[Dict[int, int]] = []  # per tree nid -> op
        # materials
        self.m_rows: List[Dict] = []
        # patterns
        self.p_rows: List[Dict] = []
        # textures
        self.tex_imgs: List[np.ndarray] = []
        self.tex_by_file: Dict[str, int] = {}

    # ---------------- textures ----------------

    def texture_id(self, file: str, decode_to_linear: bool) -> int:
        """Load a texture once per path; like the reference's resource dedup,
        the first use's decode choice sticks (yaml_parser/pattern.py:262-282)."""
        if file in self.tex_by_file:
            return self.tex_by_file[file]
        from fast_ray_tracer_tpu.io.ppm import read_png, read_ppm
        from fast_ray_tracer_tpu.scene.obj_loader import _resolve
        # non-png/ppm files: the reference converts to and reads a sibling
        # .png (yaml_parser/pattern.py:255-261)
        lookup = file
        if not (file.endswith(".png") or file.endswith(".ppm")):
            lookup = file[:-3] + "png"
        path = _resolve(lookup, self.root_dir)
        if path is None and lookup != file:
            src = _resolve(file, self.root_dir)
            if src is not None:
                from PIL import Image
                path = src[:-3] + "png"
                try:
                    Image.open(src).save(path)
                except OSError:
                    # source dir read-only: convert into a tmp cache
                    import hashlib
                    import tempfile
                    h = hashlib.sha1(src.encode()).hexdigest()[:16]
                    path = os.path.join(tempfile.gettempdir(),
                                        f"frt_tex_{h}.png")
                    if not os.path.exists(path):
                        Image.open(src).save(path)
        if path is None:
            raise FileNotFoundError(f"texture not found: {file}")
        decode = self.decode if decode_to_linear else None
        if path.endswith(".ppm"):
            img = read_ppm(path, decode=decode)
        else:
            img = read_png(path, decode=decode)
        tid = len(self.tex_imgs)
        self.tex_imgs.append(np.asarray(img, dtype=np.float64))
        self.tex_by_file[file] = tid
        return tid

    # ---------------- patterns ----------------

    def add_pattern(self, p: Optional[PatternDesc]) -> int:
        if p is None:
            return -1
        row = {
            "type": _PAT_KIND[p.kind],
            "inv": np.linalg.inv(compose_chain(p.transform)),
            "colors": np.zeros((5, 3)),
            "params": np.zeros(6),
            "children": -np.ones(6, dtype=np.int64),
            "map_kind": 0,
            "tex": -1,
        }
        if p.kind in ("checker", "gradient", "radial_gradient", "ring",
                      "stripe", "uv_checker", "uv_align_check",
                      "uv_gradient", "uv_radial_gradient"):
            cs = np.asarray(self.decode(np.asarray(p.colors, dtype=np.float64)))
            row["colors"][: len(p.colors)] = cs
            if p.kind == "uv_checker":
                row["params"][0] = p.width
                row["params"][1] = p.height
        elif p.kind == "uv_image":
            row["tex"] = self.texture_id(p.file, p.decode_to_linear)
        elif p.kind in ("blended", "nested", "perturbed"):
            kids = [self.add_pattern(c) for c in p.children]
            row["children"][: len(kids)] = kids
            if p.kind == "perturbed":
                row["params"][:5] = [p.frequency, p.scale_factor,
                                     p.persistence, p.octaves, p.seed]
        elif p.kind == "map":
            row["map_kind"] = _MAP_KIND[p.mapping]
            faces = [self.add_pattern(f) for f in p.faces]
            row["children"][: len(faces)] = faces
        self.p_rows.append(row)
        return len(self.p_rows) - 1

    # ---------------- materials ----------------

    def add_material(self, m: Optional[MaterialDesc]) -> int:
        if m is None:
            m = MaterialDesc()
        base = np.asarray(self.decode(np.asarray(m.color, dtype=np.float64)))
        row = {
            # explicit MTL-style overrides (OBJ loader) win over legacy fields
            "Ka": np.asarray(m.Ka) if m.Ka is not None else base * m.ambient,
            "Kd": np.asarray(m.Kd) if m.Kd is not None else base * m.diffuse,
            "Ks": np.asarray(m.Ks) if m.Ks is not None else base * m.specular,
            "Tf": (np.asarray(m.Tf) if m.Tf is not None
                   else np.full(3, m.transparency)),
            "refl": (np.asarray(m.refl_color) if m.refl_color is not None
                     else np.full(3, m.reflective)),
            "Ns": m.shininess,
            "Ni": m.refractive_index,
            "Tr": m.transparency,
            "casts_shadow": bool(m.casts_shadow),
            "map": [-1] * 8,
        }
        row["reflective"] = bool((row["refl"] > 0.0).any())
        for i, slot in enumerate(IR.MAP_SLOTS):
            if slot in m.patterns:
                row["map"][i] = self.add_pattern(m.patterns[slot])
        self.m_rows.append(row)
        return len(self.m_rows) - 1


def _walk(shape: ShapeDesc, parent_m: np.ndarray, tables: _Tables,
          csg_id: int, csg_side: int, inherited_mat: Optional[int],
          nodes: List[div.Node]) -> None:
    """Dissolve the shape tree into flat leaf rows. `nodes` is the parent's
    children list in the divide-simulation tree (local transforms only),
    used to recover the post-divide shadow-walk leaf ordering."""
    m_local = compose_chain(shape.transform)
    m_world = parent_m @ m_local
    m_flat = m_local.ravel().tolist()

    if shape.kind == "group":
        node = div.Node(kind="group", transform=m_flat)
        nodes.append(node)
        for child in shape.children:
            _walk(child, m_world, tables, csg_id, csg_side, inherited_mat,
                  node.children)
        return
    if shape.kind == "csg":
        # one csg tree = ONE shadow-walk leaf; leaf prims carry the tree id
        # and their root-to-leaf path bits (bit d set = right child at
        # depth d) for the vectorized truth-table filter
        tree_id = len(tables.csg_trees)
        tree_nodes: List[Tuple[int, int, int]] = []
        doc = tables.next_leaf
        tables.next_leaf += 1
        node = _walk_csg_child(shape, parent_m, tables, tree_id, 0, 0,
                               [0], 0, inherited_mat, tree_nodes, doc)
        nodes.append(node)
        tables.csg_trees.append(tuple(tree_nodes))
        tables.csg_div_roots.append(node)
        tables.csg_node_ops.append({nid: op for nid, _, op in tree_nodes})
        return
    if shape.kind == "obj":
        from fast_ray_tracer_tpu.scene.obj_loader import load_obj_into
        load_obj_into(shape, m_world, tables, csg_id, csg_side, nodes, m_flat)
        return

    mat_id = (tables.add_material(shape.material)
              if shape.material is not None else
              (inherited_mat if inherited_mat is not None
               else tables.add_material(None)))

    if shape.kind in ("triangle", "smooth_triangle"):
        lin = m_world[:3, :3]
        nrm_m = np.linalg.inv(m_world)[:3, :3].T
        p1 = lin @ shape.p1 + m_world[:3, 3]
        p2 = lin @ shape.p2 + m_world[:3, 3]
        p3 = lin @ shape.p3 + m_world[:3, 3]
        if shape.kind == "triangle":
            # flat normal = normalize(cross(e2, e1)) in object space
            # (src/shapes/triangle.c:84-91), mapped through inv^T
            e1o = np.asarray(shape.p2) - np.asarray(shape.p1)
            e2o = np.asarray(shape.p3) - np.asarray(shape.p1)
            n_obj = np.cross(e2o, e1o)
            n_obj = n_obj / np.linalg.norm(n_obj)
            n = nrm_m @ n_obj
            n1 = n2 = n3 = n
        else:
            n1 = nrm_m @ shape.n1
            n2 = nrm_m @ shape.n2
            n3 = nrm_m @ shape.n3
        use_tex = shape.t1 is not None
        t1 = shape.t1[:2] if use_tex else (0.0, 0.0)
        t2 = shape.t2[:2] if use_tex else (0.0, 0.0)
        t3 = shape.t3[:2] if use_tex else (0.0, 0.0)
        tables.t_rows.append((p1, p2 - p1, p3 - p1, n1, n2, n3,
                              t1, t2, t3, use_tex, mat_id, csg_id, csg_side,
                              0))
        tables.t_doc.append(tables.next_leaf)
        nodes.append(div.Node(
            kind="triangle", transform=m_flat, leaf_id=tables.next_leaf,
            obj_box=div.leaf_box("triangle",
                                 points=[shape.p1, shape.p2, shape.p3])))
        tables.next_leaf += 1
        return

    typ = _KIND_TO_TYPE[shape.kind]
    params = [0.0, 0.0, 0.0, 0.0]
    if shape.kind in ("cylinder", "cone"):
        params = [shape.minimum, shape.maximum, 1.0 if shape.closed else 0.0, 0.0]
    elif shape.kind == "toroid":
        params = [shape.r1, shape.r2, 0.0, 0.0]
    tables.a_type.append(typ)
    tables.a_inv.append(np.linalg.inv(m_world))
    tables.a_params.append(params)
    tables.a_mat.append(mat_id)
    tables.a_csg.append((csg_id, 0, csg_side))
    tables.a_doc.append(tables.next_leaf)
    nodes.append(div.Node(
        kind=shape.kind, transform=m_flat, leaf_id=tables.next_leaf,
        obj_box=div.leaf_box(shape.kind, minimum=shape.minimum,
                             maximum=shape.maximum, r1=shape.r1, r2=shape.r2)))
    tables.next_leaf += 1


_CSG_OPS = {"union": 0, "intersection": 1, "difference": 2}


def _walk_csg_child(sub: ShapeDesc, parent_m: np.ndarray, tables: _Tables,
                    tree_id: int, anc: int, side: int, nid_alloc: List[int],
                    depth: int, inherited_mat: Optional[int],
                    tree_nodes: List, doc: int) -> div.Node:
    """Walk a node of a csg tree. Internal csg nodes get unique ids from
    `nid_alloc`; leaves are tagged (tree_id, ancestor-bitmask,
    side-bitmask) so SIBLING subtrees under a group child stay distinct
    (the reference filters each nested csg's own hits before the group
    merge — csg_local_intersect, src/shapes/csg.c:73-125). All leaves
    share ONE document leaf id `doc` (the whole tree is a single
    shadow-walk leaf)."""
    m_local = compose_chain(sub.transform)
    m_world = parent_m @ m_local
    m_flat = m_local.ravel().tolist()

    if sub.kind == "csg":
        # node ids are unbounded: ancestor/side masks are Python ints end
        # to end (csg_static_tables resolves them to static bool tables),
        # so trees of any internal-node count work
        nid = nid_alloc[0]
        nid_alloc[0] += 1
        tree_nodes.append((nid, depth, _CSG_OPS[sub.op]))
        mat = (tables.add_material(sub.material)
               if sub.material is not None else inherited_mat)
        node = div.Node(kind="csg", transform=m_flat, leaf_id=doc, tag=nid)
        node.left = _walk_csg_child(sub.left, m_world, tables, tree_id,
                                    anc | (1 << nid), side, nid_alloc,
                                    depth + 1, mat, tree_nodes, doc)
        node.right = _walk_csg_child(sub.right, m_world, tables, tree_id,
                                     anc | (1 << nid), side | (1 << nid),
                                     nid_alloc, depth + 1, mat, tree_nodes,
                                     doc)
        return node

    if sub.kind == "group":
        node = div.Node(kind="group", transform=m_flat, leaf_id=doc)
        for child in sub.children:
            node.children.append(_walk_csg_child(
                child, m_world, tables, tree_id, anc, side, nid_alloc,
                depth, inherited_mat, tree_nodes, doc))
        return node

    if sub.kind == "obj":
        # the reference's csg() accepts any shape, including OBJ groups
        # (src/shapes/csg.c:166-206; yaml_parser/shapes.py:330-367): the
        # mesh's triangles become ordinary leaves of this tree. Dense
        # candidate slots are required (cluster streaming bypasses the
        # csg filter), so compile_scene keeps csg meshes unclustered.
        from fast_ray_tracer_tpu.scene.obj_loader import load_obj_into
        tmp: List[div.Node] = []
        load_obj_into(sub, m_world, tables, tree_id, side, tmp, m_flat,
                      csg_anc=anc, csg_doc=doc,
                      inherited_mat=inherited_mat)
        node = tmp[0]
        node.leaf_id = doc
        return node

    mat_id = (tables.add_material(sub.material)
              if sub.material is not None else
              (inherited_mat if inherited_mat is not None
               else tables.add_material(None)))

    if sub.kind in ("triangle", "smooth_triangle"):
        lin = m_world[:3, :3]
        nrm_m = np.linalg.inv(m_world)[:3, :3].T
        p1 = lin @ sub.p1 + m_world[:3, 3]
        p2 = lin @ sub.p2 + m_world[:3, 3]
        p3 = lin @ sub.p3 + m_world[:3, 3]
        if sub.kind == "triangle":
            e1o = np.asarray(sub.p2) - np.asarray(sub.p1)
            e2o = np.asarray(sub.p3) - np.asarray(sub.p1)
            n_obj = np.cross(e2o, e1o)
            n_obj = n_obj / np.linalg.norm(n_obj)
            n = nrm_m @ n_obj
            n1 = n2 = n3 = n
        else:
            n1 = nrm_m @ sub.n1
            n2 = nrm_m @ sub.n2
            n3 = nrm_m @ sub.n3
        use_tex = sub.t1 is not None
        t1 = sub.t1[:2] if use_tex else (0.0, 0.0)
        t2 = sub.t2[:2] if use_tex else (0.0, 0.0)
        t3 = sub.t3[:2] if use_tex else (0.0, 0.0)
        tables.t_rows.append((p1, p2 - p1, p3 - p1, n1, n2, n3,
                              t1, t2, t3, use_tex, mat_id, tree_id, side,
                              anc))
        tables.t_doc.append(doc)
        return div.Node(
            kind="triangle", transform=m_flat, leaf_id=doc,
            tag=("t", len(tables.t_rows) - 1),
            obj_box=div.leaf_box("triangle",
                                 points=[sub.p1, sub.p2, sub.p3]))

    typ = _KIND_TO_TYPE[sub.kind]
    params = [0.0, 0.0, 0.0, 0.0]
    if sub.kind in ("cylinder", "cone"):
        params = [sub.minimum, sub.maximum, 1.0 if sub.closed else 0.0, 0.0]
    elif sub.kind == "toroid":
        params = [sub.r1, sub.r2, 0.0, 0.0]
    tables.a_type.append(typ)
    tables.a_inv.append(np.linalg.inv(m_world))
    tables.a_params.append(params)
    tables.a_mat.append(mat_id)
    tables.a_csg.append((tree_id, anc, side))
    tables.a_doc.append(doc)
    return div.Node(kind=sub.kind, transform=m_flat, leaf_id=doc,
                    tag=("a", len(tables.a_csg) - 1),
                    obj_box=div.leaf_box(sub.kind, minimum=sub.minimum,
                                         maximum=sub.maximum, r1=sub.r1,
                                         r2=sub.r2))


def _leaf_tags(node: div.Node, out: List) -> None:
    """Collect leaf tags: ('a', analytic-row), ('t', triangle-row) or
    ('b', block, local) — resolved to final global prim ids at the end of
    compile_scene (analytic rows are type-sorted; triangle/block rows get
    offset by the analytic count)."""
    if node.kind == "csg":
        _leaf_tags(node.left, out)
        _leaf_tags(node.right, out)
    elif node.kind == "group":
        for c in node.children:
            _leaf_tags(c, out)
    elif node.kind == "leafblock":
        out.extend(node.block_tags)
    else:
        out.append(node.tag)


def _csg_prog(root: div.Node, nid_ops: Dict[int, int], threshold: int):
    """Post-divide filter program for one csg tree: POSTORDER entries

      ("c", nid, op)   - truth-table filter at csg node `nid`
      ("g", branches)  - shadow-ray truncation point: `branches` is a
                         tuple of per-child-subtree leaf-row tuples in
                         post-divide child order. With stop_after_first_hit
                         the reference's group walk stops after the first
                         child subtree that returned a t > 0 hit
                         (src/shapes/group.c:104-123), so later branches
                         contribute NOTHING to the csg filter on shadow
                         rays (and everything on primary rays).

    The divide pass reorders and nests groups inside the tree exactly
    like the reference (csg_divide recurses into children,
    src/shapes/csg.c:141-146), so truncation points match its post-divide
    tree."""
    import copy
    node = copy.deepcopy(root)
    div.expand_leafblocks(node)     # csg obj meshes: per-triangle leaves
    div.divide(node, threshold)
    prog: List[Tuple] = []

    def walk(n: div.Node):
        if n.kind == "csg":
            walk(n.left)
            walk(n.right)
            prog.append(("c", n.tag, nid_ops[n.tag]))
        elif n.kind == "group":
            branches = []
            for c in n.children:
                walk(c)
                tags: List[int] = []
                _leaf_tags(c, tags)
                branches.append(tuple(tags))
            prog.append(("g", tuple(branches)))

    walk(node)
    return tuple(prog)


def compile_scene(scene: SceneDesc, dtype=jnp.float32) -> SceneIR:
    decode = _np_decode(scene.config.color_space)
    tables = _Tables(decode, scene.root_dir)

    root = div.Node(kind="group", transform=list(div.IDENTITY))
    for shape in scene.world:
        _walk(shape, np.eye(4), tables, csg_id=-1, csg_side=0,
              inherited_mat=None, nodes=root.children)

    # csg filter programs from the PRE-divide tree copies (the Python
    # shadow_ranks fallback below mutates `root` in place)
    csg_progs = [
        _csg_prog(r, ops, scene.config.divide_threshold)
        for r, ops in zip(tables.csg_div_roots, tables.csg_node_ops)
    ]

    # post-divide DFS leaf order -> shadow-walk rank per document leaf
    doc_rank = np.asarray(
        div.shadow_ranks(root, scene.config.divide_threshold,
                         tables.next_leaf),
        dtype=np.int64) if tables.next_leaf else np.zeros(0, np.int64)

    # ---- analytic block, grouped by type ----
    order = np.argsort(np.asarray(tables.a_type, dtype=np.int64), kind="stable") \
        if tables.a_type else np.zeros(0, dtype=np.int64)
    a_type = np.asarray(tables.a_type, dtype=np.int64)[order] if len(order) else np.zeros(0, np.int64)
    inv = (np.stack(tables.a_inv)[order] if len(order)
           else np.zeros((0, 4, 4)))
    params = (np.asarray(tables.a_params)[order] if len(order)
              else np.zeros((0, 4)))
    a_mat = (np.asarray(tables.a_mat, dtype=np.int64)[order] if len(order)
             else np.zeros(0, np.int64))
    # csg tags stay PYTHON ints (arbitrary-precision masks; no node cap)
    a_csg_l = [tables.a_csg[int(i)][0] for i in order]
    a_anc_l = [tables.a_csg[int(i)][1] for i in order]
    a_side_l = [tables.a_csg[int(i)][2] for i in order]
    a_rank = (doc_rank[np.asarray(tables.a_doc, dtype=np.int64)][order]
              if len(order) else np.zeros(0, np.int64))

    type_ranges = []
    for t in range(6):
        idx = np.nonzero(a_type == t)[0]
        if len(idx):
            type_ranges.append((t, int(idx[0]), int(len(idx))))

    # ---- triangles (per-row entries + OBJ bulk blocks) ----
    nr = len(tables.t_rows)
    def tcol(i, width=3):
        if nr == 0:
            return np.zeros((0, width))
        return np.asarray([np.asarray(r[i], dtype=np.float64) for r in tables.t_rows])

    def cat(rows, key, blk_default=None):
        parts = [rows] + [b[key] for b in tables.t_blocks]
        return np.concatenate(parts) if parts else rows

    tri_p1 = cat(tcol(0), "p1")
    tri_e1 = cat(tcol(1), "e1")
    tri_e2 = cat(tcol(2), "e2")
    tri_n1 = cat(tcol(3), "n1")
    tri_n2 = cat(tcol(4), "n2")
    tri_n3 = cat(tcol(5), "n3")
    tri_t1 = cat(tcol(6, 2), "t1")
    tri_t2 = cat(tcol(7, 2), "t2")
    tri_t3 = cat(tcol(8, 2), "t3")
    tri_use_tex = cat(np.asarray([r[9] for r in tables.t_rows], dtype=bool)
                      if nr else np.zeros(0, bool), "use_tex")
    tri_mat = cat(np.asarray([r[10] for r in tables.t_rows], dtype=np.int64)
                  if nr else np.zeros(0, np.int64), "mat")
    # per-triangle csg tags as Python int lists (blocks share one tag set)
    tri_csg_l = [r[11] for r in tables.t_rows]
    tri_side_l = [r[12] for r in tables.t_rows]
    tri_anc_l = [r[13] for r in tables.t_rows]
    block_base = [nr]                  # final row offset of each t_block
    for b in tables.t_blocks:
        bn = len(b["p1"])
        block_base.append(block_base[-1] + bn)
        tri_csg_l.extend([b["csg"]] * bn)
        tri_side_l.extend([b["side"]] * bn)
        tri_anc_l.extend([b["anc"]] * bn)
    tri_doc = cat(np.asarray(tables.t_doc, dtype=np.int64)
                  if nr else np.zeros(0, np.int64), "doc")
    nt = len(tri_p1)
    tri_rank = doc_rank[tri_doc] if nt else np.zeros(0, np.int64)

    n_analytic = len(order)
    # resolve csg-program leaf tags to final global prim ids: analytic
    # rows went through the type sort; triangle rows sit after the
    # analytic block (t_rows first, then each obj block)
    if csg_progs:
        inv_order = np.empty(len(order), np.int64)
        inv_order[order] = np.arange(len(order))

        def _resolve_tag(tag):
            if tag[0] == "a":
                return int(inv_order[tag[1]])
            if tag[0] == "t":
                return n_analytic + tag[1]
            return n_analytic + block_base[tag[1]] + tag[2]   # ("b", bi, i)

        csg_progs = [
            tuple(e if e[0] == "c" else
                  ("g", tuple(tuple(_resolve_tag(t) for t in br)
                              for br in e[1]))
                  for e in prog)
            for prog in csg_progs
        ]

    # ---- triangle clustering (large meshes) ----
    # Morton-order triangles by centroid and group into fixed-size clusters
    # with AABBs; the intersector then streams clusters with whole-chunk
    # AABB culling instead of materializing a (rays x Nt) matrix. The
    # reference gets the same effect from its per-ray BVH walk
    # (group_divide + bounding_box test, src/shapes/group.c:91-147).
    CLUSTER_SIZE = 64
    # csg triangle leaves need dense candidate slots (the csg filter and
    # containers walk run over the dense table), so meshes inside csg
    # trees stay unclustered regardless of size
    use_clusters = nt >= 2048 and all(c < 0 for c in tri_csg_l)
    if nt >= 8192 and not use_clusters:
        # an OBJ mesh inside a CSG tree disables clustering for ALL scene
        # triangles: the dense (rays x hits) candidate table plus the
        # per-group shadow filter scale O(R*Nt) in memory and compile
        # time — fine for the few-thousand-triangle CSG meshes the
        # reference ships, pathological beyond that
        print(f"warning: {nt} triangles stay UNCLUSTERED because an OBJ "
              "mesh is a CSG child; dense candidate tables scale "
              "O(rays*triangles) — expect high memory/compile cost",
              flush=True)
    if use_clusters:
        centroid = tri_p1 + (tri_e1 + tri_e2) / 3.0
        order_t = _morton_order(centroid)
        (tri_p1, tri_e1, tri_e2, tri_n1, tri_n2, tri_n3,
         tri_t1, tri_t2, tri_t3) = (a[order_t] for a in (
             tri_p1, tri_e1, tri_e2, tri_n1, tri_n2, tri_n3,
             tri_t1, tri_t2, tri_t3))
        tri_use_tex = tri_use_tex[order_t]
        tri_mat = tri_mat[order_t]
        tri_rank = tri_rank[order_t]
        pad = (-nt) % CLUSTER_SIZE
        if pad:
            inf3 = np.full((pad, 3), np.inf)
            z3 = np.zeros((pad, 3))
            z2 = np.zeros((pad, 2))
            tri_p1 = np.concatenate([tri_p1, inf3])
            tri_e1 = np.concatenate([tri_e1, z3])
            tri_e2 = np.concatenate([tri_e2, z3])
            tri_n1 = np.concatenate([tri_n1, z3])
            tri_n2 = np.concatenate([tri_n2, z3])
            tri_n3 = np.concatenate([tri_n3, z3])
            tri_t1 = np.concatenate([tri_t1, z2])
            tri_t2 = np.concatenate([tri_t2, z2])
            tri_t3 = np.concatenate([tri_t3, z2])
            tri_use_tex = np.concatenate([tri_use_tex, np.zeros(pad, bool)])
            tri_mat = np.concatenate([tri_mat, np.zeros(pad, np.int64)])
            tri_rank = np.concatenate(
                [tri_rank, np.full(pad, 1 << 30, np.int64)])
        nt_padded = nt + pad
        n_clusters = nt_padded // CLUSTER_SIZE
        verts = np.stack([tri_p1, tri_p1 + tri_e1, tri_p1 + tri_e2], 1)
        with np.errstate(invalid="ignore"):
            vc = verts.reshape(n_clusters, CLUSTER_SIZE * 3, 3)
            finite = np.isfinite(vc).all(-1, keepdims=True)
            cluster_min = np.where(finite, vc, np.inf).min(axis=1)
            cluster_max = np.where(finite, vc, -np.inf).max(axis=1)
        nt = nt_padded
    else:
        n_clusters = 0
        cluster_min = np.zeros((1, 3))
        cluster_max = np.zeros((1, 3))

    # ---- materials ----
    if not tables.m_rows:
        tables.add_material(None)
    M = len(tables.m_rows)
    mat = {k: np.stack([np.asarray(r[k], dtype=np.float64) for r in tables.m_rows])
           for k in ("Ka", "Kd", "Ks", "Tf", "refl")}
    mat_Ns = np.asarray([r["Ns"] for r in tables.m_rows])
    mat_Ni = np.asarray([r["Ni"] for r in tables.m_rows])
    mat_Tr = np.asarray([r["Tr"] for r in tables.m_rows])
    mat_reflective = np.asarray([r["reflective"] for r in tables.m_rows], bool)
    mat_shadow = np.asarray([r["casts_shadow"] for r in tables.m_rows], bool)
    mat_map = np.asarray([r["map"] for r in tables.m_rows], dtype=np.int64)

    # ---- patterns ----
    P = len(tables.p_rows)
    if P:
        pat_type = np.asarray([r["type"] for r in tables.p_rows], np.int64)
        pat_inv = np.stack([r["inv"] for r in tables.p_rows])
        pat_colors = np.stack([r["colors"] for r in tables.p_rows])
        pat_params = np.stack([r["params"] for r in tables.p_rows])
        pat_children = np.stack([r["children"] for r in tables.p_rows])
        pat_map_kind = np.asarray([r["map_kind"] for r in tables.p_rows], np.int64)
        pat_tex = np.asarray([r["tex"] for r in tables.p_rows], np.int64)
    else:
        pat_type = np.zeros(0, np.int64)
        pat_inv = np.zeros((0, 4, 4))
        pat_colors = np.zeros((0, 5, 3))
        pat_params = np.zeros((0, 6))
        pat_children = np.zeros((0, 6), np.int64)
        pat_map_kind = np.zeros(0, np.int64)
        pat_tex = np.zeros(0, np.int64)

    # ---- texture atlas ----
    if tables.tex_imgs:
        offsets, flat = [], []
        off = 0
        for img in tables.tex_imgs:
            offsets.append(off)
            flat.append(img.reshape(-1, 3))
            off += img.shape[0] * img.shape[1]
        tex_data = np.concatenate(flat, axis=0)
        tex_offset = np.asarray(offsets, np.int64)
        tex_width = np.asarray([i.shape[1] for i in tables.tex_imgs], np.int64)
        tex_height = np.asarray([i.shape[0] for i in tables.tex_imgs], np.int64)
    else:
        tex_data = np.zeros((1, 3))
        tex_offset = np.zeros(1, np.int64)
        tex_width = np.ones(1, np.int64)
        tex_height = np.ones(1, np.int64)

    # ---- lights ----
    L = len(scene.lights)
    light_info = []
    li_int = np.zeros((L, 3))
    li_pos = np.zeros((L, 3))
    li_uvec = np.zeros((L, 3))
    li_vvec = np.zeros((L, 3))
    li_normal = np.zeros((L, 3))
    li_radius = np.zeros(L)
    pts_list, mask_list = [], []
    for i, ld in enumerate(scene.lights):
        t = _LIGHT_KIND[ld.kind]
        num = ld.usteps * ld.vsteps if ld.kind in ("area", "circle") else 1
        light_info.append((t, ld.usteps, ld.vsteps, bool(ld.jitter), num))
        li_int[i] = ld.intensity
        if ld.kind == "point":
            li_pos[i] = ld.at
            pts_list.append(np.asarray(ld.at, dtype=np.float64)[None])
        elif ld.kind == "hemisphere":
            li_pos[i] = ld.at
            n = np.asarray(ld.to) - np.asarray(ld.at)
            li_normal[i] = n / np.linalg.norm(n)
            pts_list.append(np.asarray(ld.at, dtype=np.float64)[None])
        elif ld.kind == "area":
            # stored uvec/vvec are the full edge / steps (light.c:303-309)
            li_pos[i] = ld.corner
            li_uvec[i] = np.asarray(ld.uvec) / ld.usteps
            li_vvec[i] = np.asarray(ld.vvec) / ld.vsteps
            pts_list.append(_area_light_points(
                np.asarray(ld.corner), li_uvec[i], li_vvec[i],
                ld.usteps, ld.vsteps))
        elif ld.kind == "circle":
            li_pos[i] = ld.at
            n = np.asarray(ld.to) - np.asarray(ld.at)
            li_normal[i] = n / np.linalg.norm(n)
            li_radius[i] = ld.radius
            pts_list.append(_circle_light_points(
                np.asarray(ld.at), li_normal[i], ld.radius,
                ld.usteps, ld.vsteps))
        mask_list.append(np.ones(len(pts_list[-1]), bool))
    s_max = max([len(p) for p in pts_list], default=1)
    li_points = np.zeros((L, s_max, 3))
    li_mask = np.zeros((L, s_max), bool)
    for i, (p, m) in enumerate(zip(pts_list, mask_list)):
        li_points[i, : len(p)] = p
        li_mask[i, : len(p)] = m

    cfg = scene.config
    has_refl = bool(mat_reflective.any()) and cfg.include_specular
    has_refr = bool((mat_Tr > 0).any() or (mat_map[:, IR.SLOT_D] >= 0).any()) \
        and cfg.include_specular
    # the containers walk only matters when some Ni != 1; with all indices
    # 1.0 the walk provably yields n1 = n2 = 1 (renderer.c:406-447), so the
    # expensive all-hits sort is skipped (e.g. bounding_boxes' Ni=1 boxes)
    needs_sort = has_refr and bool((np.abs(mat_Ni - 1.0) > 1e-12).any())
    n_hit_slots = int(sum(IR.TYPE_MAX_HITS[t] * c for t, _, c in type_ranges)) + nt

    # static pattern structure for evaluator pruning
    pattern_kinds = tuple(sorted({int(t) for t in pat_type}))
    combinators = {IR.PAT_BLENDED, IR.PAT_NESTED, IR.PAT_PERTURBED}

    def _depth(pid):
        row = tables.p_rows[pid]
        if row["type"] not in combinators:
            return 0
        kids = [k for k in row["children"] if k >= 0]
        return 1 + max((_depth(int(k)) for k in kids), default=0)

    pattern_depth = max((_depth(i) for i in range(P)
                         if tables.p_rows[i]["type"] in combinators),
                        default=0)
    max_octaves = int(max((r["params"][3] for r in tables.p_rows
                           if r["type"] == IR.PAT_PERTURBED), default=0))

    meta = SceneMeta(
        n_analytic=len(a_type), n_triangles=nt, n_materials=M, n_patterns=P,
        n_lights=L, type_ranges=tuple(type_ranges),
        light_info=tuple(light_info), max_light_samples=s_max,
        has_reflective=has_refl, has_refractive=has_refr,
        needs_hit_sort=needs_sort,
        use_clusters=use_clusters, n_clusters=n_clusters,
        cluster_size=CLUSTER_SIZE,
        # the containers walk needs every intersection (negative t included);
        # truncation silently corrupts n1/n2, so only cap for huge scenes
        max_hits=min(64, max(2, n_hit_slots)),
        any_patterns=bool((mat_map >= 0).any()),
        any_bump=bool((mat_map[:, IR.SLOT_BUMP] >= 0).any()),
        pattern_slots=tuple(int(s) for s in range(mat_map.shape[1])
                            if bool((mat_map[:, s] >= 0).any())),
        pattern_kinds=pattern_kinds,
        map_kinds=tuple(sorted({int(r["map_kind"]) for r in tables.p_rows
                                if r["type"] == IR.PAT_MAP})),
        pattern_depth=pattern_depth,
        max_perlin_octaves=max_octaves,
        csg_trees=tuple(csg_progs),
        has_csg=bool(tables.csg_trees),
        csg_prim_leaf=tuple(a_csg_l) + tuple(tri_csg_l)
        + (-1,) * (nt - len(tri_csg_l)),
        csg_prim_anc=tuple(a_anc_l) + tuple(tri_anc_l)
        + (0,) * (nt - len(tri_anc_l)),
        csg_prim_side=tuple(a_side_l) + tuple(tri_side_l)
        + (0,) * (nt - len(tri_side_l)),
    )

    f = lambda x: jnp.asarray(x, dtype=dtype)
    i32 = lambda x: jnp.asarray(x, dtype=jnp.int32)
    return SceneIR(
        meta=meta,
        inv_tf=f(inv), prim_params=f(params), material_id=i32(a_mat),
        prim_shadow_rank=i32(np.concatenate([a_rank, tri_rank])),
        tri_p1=f(tri_p1), tri_e1=f(tri_e1), tri_e2=f(tri_e2),
        tri_n1=f(tri_n1), tri_n2=f(tri_n2), tri_n3=f(tri_n3),
        tri_t1=f(tri_t1), tri_t2=f(tri_t2), tri_t3=f(tri_t3),
        tri_use_tex=jnp.asarray(tri_use_tex), tri_material_id=i32(tri_mat),
        cluster_min=f(cluster_min), cluster_max=f(cluster_max),
        mat_Ka=f(mat["Ka"]), mat_Kd=f(mat["Kd"]), mat_Ks=f(mat["Ks"]),
        mat_Tf=f(mat["Tf"]), mat_refl=f(mat["refl"]),
        mat_Ns=f(mat_Ns), mat_Ni=f(mat_Ni), mat_Tr=f(mat_Tr),
        mat_reflective=jnp.asarray(mat_reflective),
        mat_casts_shadow=jnp.asarray(mat_shadow), mat_map=i32(mat_map),
        pat_type=i32(pat_type), pat_inv_tf=f(pat_inv),
        pat_colors=f(pat_colors), pat_params=f(pat_params),
        pat_children=i32(pat_children), pat_map_kind=i32(pat_map_kind),
        pat_tex=i32(pat_tex),
        tex_data=f(tex_data), tex_offset=i32(tex_offset),
        tex_width=i32(tex_width), tex_height=i32(tex_height),
        light_intensity=f(li_int), light_pos=f(li_pos),
        light_uvec=f(li_uvec), light_vvec=f(li_vvec),
        light_normal=f(li_normal), light_radius=f(li_radius),
        light_points=f(li_points), light_mask=jnp.asarray(li_mask),
    )


def _morton_order(centroid: np.ndarray) -> np.ndarray:
    """Sort order by 30-bit Morton code of quantized centroids — spatially
    coherent clusters for AABB culling."""
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    q = ((centroid - lo) / np.where(hi - lo > 0, hi - lo, 1.0)
         * 1023.0).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def _np_decode(color_space: str):
    """Input color decode on host numpy (matches colors.INPUT_DECODE)."""
    if color_space == "SRGB":
        return lambda c: np.where(np.asarray(c) <= 0.04045,
                                  np.asarray(c) / 12.92,
                                  np.power((np.asarray(c) + 0.055) / 1.055, 2.4))
    if color_space == "XYZ":
        return lambda c: np.asarray(c) @ np.asarray(colorlib.XYZ_TO_RGB).T
    if color_space == "LAB":
        import jax.numpy as _j
        return lambda c: np.asarray(colorlib.lab_to_rgb(np.asarray(c, np.float64)))
    return lambda c: np.asarray(c, dtype=np.float64)


def _area_light_points(corner, uvec, vvec, usteps, vsteps):
    """Deterministic area-light sample cache (light.c:154-191, jitter=false):
    CMJ point scaled by (usteps, vsteps), then corner + u*uvec + v*vvec."""
    pts = cmj_points_static(usteps, vsteps)   # (S,2), get_point order
    u = pts[:, 0] * usteps
    v = pts[:, 1] * vsteps
    return corner[None] + u[:, None] * uvec[None] + v[:, None] * vvec[None]


def _circle_light_points(origin, normal, radius, usteps, vsteps):
    """Deterministic circle-light cache (light.c:100-135): CMJ point ->
    uniform disc sample in the plane perpendicular to `normal`."""
    pts = cmj_points_static(usteps, vsteps)
    return origin[None] + _points_on_circle(pts, normal, radius)


def _points_on_circle(pts, normal, radius):
    """sampler_circle: uniform disc sample (theta = 2*pi*r1, r = sqrt(r2)*R ->
    (r cos, 0, r sin)) mapped as x*nb + z*nt (sampler.c:8-20, 116-139)."""
    theta = 2.0 * math.pi * pts[:, 0]
    r = radius * np.sqrt(pts[:, 1])
    sx = r * np.cos(theta)
    sz = r * np.sin(theta)
    nt, nb = _coordinate_system(normal)
    return sx[:, None] * nb[None] + sz[:, None] * nt[None]


def _coordinate_system(n):
    """Tangent frame (create_coordinate_system, sampler.c:66-85): the C code
    *multiplies* by the sqrt factor then normalizes (the scale cancels) and
    negates nt; nb = cross(n, nt)."""
    if abs(n[0]) > abs(n[1]):
        nt = -np.asarray([n[2], 0.0, -n[0]]) / math.sqrt(n[0] ** 2 + n[2] ** 2)
    else:
        nt = -np.asarray([0.0, -n[2], n[1]]) / math.sqrt(n[1] ** 2 + n[2] ** 2)
    nb = np.cross(n, nt)
    return nt, nb
