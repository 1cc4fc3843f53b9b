"""Wavefront OBJ/MTL loader -> flat triangle rows + divide-sim nodes.

Semantics mirror the reference loader (src/libs/obj_loader/obj_loader.c):
  * faces fan-triangulate; the FIRST vertex token of a face decides whether
    the face uses normals/texcoords (obj_loader.c:237-259)
  * `vn` present on the first token -> smooth triangles (interpolated
    normals); else flat triangles with a precomputed cross-product normal
  * `g NAME` switches to (or creates) a named group; triangles before any
    `g` land in a default group; the result group's children are
    [default group (if non-empty), named groups in first-use order]
    (obj_loader.c:445-546)
  * `mtllib`/`usemtl`: MTL materials with Ka/Kd decoded through the scene
    color space, Ks raw, Tf stored as 1-Tf, `d` stored as Tr=1-d,
    Tr<->Tf linking and the reflective flag via set_material_flags
    (obj_loader.c:39-53,139-213)
  * a YAML material on the obj entry overrides every triangle's material
    afterwards (shape_set_material_recursive in the generated main,
    yaml_parser/obj_parser.py:46-48)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from fast_ray_tracer_tpu.scene import divide as div
from fast_ray_tracer_tpu.scene.model import MaterialDesc, PatternDesc


def _resolve(file_name: str, root_dir: str) -> Optional[str]:
    """Reference paths are relative to the repo root the binary runs from
    (README.md usage); ours is the scene file's dir — walk up a few levels."""
    if os.path.exists(file_name):
        return file_name
    d = root_dir
    for _ in range(4):
        p = os.path.join(d, file_name)
        if os.path.exists(p):
            return p
        d = os.path.dirname(d) or "/"
    return None


def _mtl_path(file_name: str, root_dir: str) -> Optional[str]:
    return _resolve(file_name, root_dir)


def parse_mtl(path: str, decode, root_dir: str) -> Dict[str, MaterialDesc]:
    """MTL file -> name -> MaterialDesc (obj_loader.c:139-213)."""
    mats: Dict[str, MaterialDesc] = {}
    cur: Optional[dict] = None

    def finish(c):
        """set_material_flags (obj_loader.c:39-53): reflective flag +
        Tr<->Tf linking."""
        if c is None:
            return
        Tf = np.asarray(c["Tf"])
        if c["Tr"] > 0 and np.all(np.abs(Tf) < 1e-5):
            c["Tf"] = (c["Tr"],) * 3
        elif abs(c["Tr"]) < 1e-5 and np.any(Tf > 0):
            c["Tr"] = float(Tf.sum() / 3.0)
        patterns = {}
        for slot in ("map_Ka", "map_Kd", "map_bump"):
            if c[slot] is not None:
                patterns[slot] = PatternDesc(
                    kind="map", mapping="triangle",
                    faces=[PatternDesc(kind="uv_image", file=c[slot],
                                       decode_to_linear=(slot != "map_bump"))])
        mats[c["name"]] = MaterialDesc(
            Ka=tuple(c["Ka"]), Kd=tuple(c["Kd"]), Ks=tuple(c["Ks"]),
            Tf=tuple(c["Tf"]), refl_color=(0.0, 0.0, 0.0),
            shininess=c["Ns"], refractive_index=c["Ni"],
            transparency=c["Tr"], casts_shadow=c["casts_shadow"],
            patterns=patterns)

    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "newmtl":
                finish(cur)
                cur = {"name": parts[1], "Ka": (1.0,) * 3, "Kd": (1.0,) * 3,
                       "Ks": (1.0,) * 3, "Tf": (0.0,) * 3, "Ns": 200.0,
                       "Ni": 1.0, "Tr": 0.0, "casts_shadow": True,
                       "map_Ka": None, "map_Kd": None, "map_bump": None}
            elif cur is None:
                continue
            elif key == "illum":
                pass                          # parsed but unused (material.h)
            elif key == "Tr":
                cur["Tr"] = float(parts[1])
            elif key == "d":
                cur["Tr"] = 1.0 - float(parts[1])
            elif key == "Ni":
                cur["Ni"] = float(parts[1])
            elif key == "Ns":
                cur["Ns"] = float(parts[1])
            elif key == "Ka":
                cur["Ka"] = tuple(np.atleast_1d(
                    decode(np.asarray([float(x) for x in parts[1:4]]))))
            elif key == "Kd":
                cur["Kd"] = tuple(np.atleast_1d(
                    decode(np.asarray([float(x) for x in parts[1:4]]))))
            elif key == "Ks":
                cur["Ks"] = tuple(float(x) for x in parts[1:4])  # raw
            elif key == "Tf":
                cur["Tf"] = tuple(1.0 - float(x) for x in parts[1:4])
            elif key == "Ke":
                pass                          # Ke parsed, unused in shading
            elif key == "noshadow":
                cur["casts_shadow"] = False
            elif key in ("map_Ka", "map_Kd", "map_bump"):
                fn = parts[-1]
                p = _mtl_path(fn, root_dir)
                if p is not None:
                    cur[key] = p
    finish(cur)
    return mats


def _face_token(tok: str) -> Tuple[int, int, int]:
    """'v', 'v/t', 'v//n', 'v/t/n' -> (v, t, n), 0 = absent."""
    if "/" not in tok:
        return int(tok), 0, 0
    ps = tok.split("/")
    v = int(ps[0])
    t = int(ps[1]) if len(ps) > 1 and ps[1] else 0
    n = int(ps[2]) if len(ps) > 2 and ps[2] else 0
    return v, t, n


def load_obj_into(shape, m_world: np.ndarray, tables, csg_id: int,
                  csg_side: int, nodes: List, m_flat: List[float]) -> None:
    """Parse shape.file and append triangle rows + divide-sim nodes."""
    path = _resolve(shape.file, tables.root_dir)
    if path is None:
        raise FileNotFoundError(f"obj not found: {shape.file}")

    verts: List[Tuple[float, float, float]] = []
    texs: List[Tuple[float, float, float]] = []
    norms: List[Tuple[float, float, float]] = []
    # groups: name -> list of face-triangle records
    group_order: List[str] = ["##default_group"]
    groups: Dict[str, List] = {"##default_group": []}
    current = "##default_group"
    mtl_mats: Dict[str, MaterialDesc] = {}
    cur_mat: Optional[MaterialDesc] = None

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
                use_n = n0 > 0
                use_t = t0 > 0
                for i in range(1, len(toks) - 1):
                    v1, t1, n1 = _face_token(toks[i])
                    v2, t2, n2 = _face_token(toks[i + 1])
                    groups[current].append(
                        ((v0, v1, v2), (t0, t1, t2), (n0, n1, n2),
                         use_n, use_t, cur_mat))
            elif raw.startswith("g "):
                name = raw.split()[1] if len(raw.split()) > 1 else ""
                if name not in groups:
                    groups[name] = []
                    group_order.append(name)
                current = name
            elif raw.startswith("usemtl"):
                name = raw.split()[1]
                if name in mtl_mats:
                    cur_mat = mtl_mats[name]
            elif raw.startswith("mtllib"):
                mp = _mtl_path(raw.split()[1], tables.root_dir)
                if mp is not None:
                    mtl_mats.update(parse_mtl(mp, tables.decode,
                                              tables.root_dir))

    yaml_mat_id = (tables.add_material(shape.material)
                   if shape.material is not None else None)
    # raw-C default material (material.c:6-31): Ka=Kd=Ks=white, Ns=200
    default_mat_id: Optional[int] = None
    mtl_ids: Dict[int, int] = {}

    def mat_id_for(m: Optional[MaterialDesc]) -> int:
        nonlocal default_mat_id
        if yaml_mat_id is not None:
            return yaml_mat_id           # YAML override wins (recursive set)
        if m is None:
            if default_mat_id is None:
                default_mat_id = tables.add_material(MaterialDesc(
                    Ka=(1.0,) * 3, Kd=(1.0,) * 3, Ks=(1.0,) * 3,
                    Tf=(0.0,) * 3, refl_color=(0.0,) * 3))
            return default_mat_id
        if id(m) not in mtl_ids:
            mtl_ids[id(m)] = tables.add_material(m)
        return mtl_ids[id(m)]

    lin = m_world[:3, :3]
    trans = m_world[:3, 3]
    nrm_m = np.linalg.inv(m_world)[:3, :3].T
    va = np.asarray(verts, dtype=np.float64) if verts else np.zeros((0, 3))
    na = np.asarray(norms, dtype=np.float64) if norms else np.zeros((0, 3))
    ta = np.asarray(texs, dtype=np.float64) if texs else np.zeros((0, 3))

    result_node = div.Node(kind="group", transform=list(m_flat))
    nodes.append(result_node)

    for gname in group_order:
        tris = groups[gname]
        if not tris:
            continue
        gnode = div.Node(kind="group", transform=list(div.IDENTITY))
        result_node.children.append(gnode)
        for (vi, ti, ni, use_n, use_t, m) in tris:
            p1o, p2o, p3o = va[vi[0] - 1], va[vi[1] - 1], va[vi[2] - 1]
            p1 = lin @ p1o + trans
            p2 = lin @ p2o + trans
            p3 = lin @ p3o + trans
            if use_n:
                n1 = nrm_m @ na[ni[0] - 1]
                n2 = nrm_m @ na[ni[1] - 1]
                n3 = nrm_m @ na[ni[2] - 1]
            else:
                # flat normal = normalize(cross(e2, e1)) in object space
                # (triangle.c:84-91), transformed as a normal
                n_obj = np.cross(p3o - p1o, p2o - p1o)
                ln = np.linalg.norm(n_obj)
                n_obj = n_obj / (ln if ln > 0 else 1.0)
                n1 = n2 = n3 = nrm_m @ n_obj
            if use_t:
                t1 = tuple(ta[ti[0] - 1][:2])
                t2 = tuple(ta[ti[1] - 1][:2])
                t3 = tuple(ta[ti[2] - 1][:2])
            else:
                t1 = t2 = t3 = (0.0, 0.0)
            mid = mat_id_for(m)
            tables.t_rows.append((p1, p2 - p1, p3 - p1, n1, n2, n3,
                                  t1, t2, t3, use_t, mid, csg_id, csg_side))
            tables.t_doc.append(tables.next_leaf)
            gnode.children.append(div.Node(
                kind="triangle", transform=list(div.IDENTITY),
                leaf_id=tables.next_leaf,
                obj_box=div.leaf_box("triangle", points=[p1o, p2o, p3o])))
            tables.next_leaf += 1
