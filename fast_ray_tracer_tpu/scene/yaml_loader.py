"""YAML scene loader, schema-compatible with the reference frontend.

Reproduces the observable behavior of yaml_parser/yaml_parser.py:
  * `define` blocks collected first; `extend` merges parent dict values
    (yaml_parser.py:26-46)
  * define references expanded inside value/material/transform lists and
    `add:`-by-name shapes, recursing into group children and csg left/right
    (yaml_parser.py:68-135)
  * `add: camera/light/config` and shape entries map to dataclasses with the
    reference defaults.
"""

from __future__ import annotations

import copy
import math
import os
from typing import Any, Dict, List

import yaml

from fast_ray_tracer_tpu.scene.model import (
    ApertureDesc, CameraDesc, ConfigDesc, LightDesc, MaterialDesc,
    PatternDesc, SceneDesc, ShapeDesc,
)

try:
    from yaml import CLoader as _Loader
except ImportError:          # pragma: no cover
    from yaml import SafeLoader as _Loader


# ---------------------------------------------------------------------------
# define / extend expansion (behavioral match of yaml_parser.py:26-135)
# ---------------------------------------------------------------------------

def _collect_defines(tree):
    defines, extends_map = {}, {}
    for obj in tree:
        if isinstance(obj, dict) and "define" in obj:
            defines[obj["define"]] = obj.get("value")
            if obj.get("extend") is not None:
                extends_map[obj["define"]] = obj["extend"]
    for child_name, parent_name in extends_map.items():
        parent_value = defines[parent_name]
        child_value = defines[child_name]
        merged = copy.deepcopy(parent_value)
        if isinstance(merged, dict):
            for k in child_value:
                merged[k] = child_value[k]
            defines[child_name] = merged
    return defines


def _expand(tree: List[dict], defines: Dict[str, Any]) -> None:
    for obj in tree:
        if not isinstance(obj, dict):
            continue
        for k in defines:
            if "value" in obj and isinstance(obj["value"], list) and k in obj["value"]:
                i = obj["value"].index(k)
                del obj["value"][i]
                for item in copy.deepcopy(defines[k]):
                    obj["value"].insert(i, item)
                    i += 1
            if "material" in obj and k in obj["material"]:
                if isinstance(obj["material"], str):
                    obj["material"] = copy.deepcopy(defines[k])
                elif isinstance(obj["material"], dict):
                    tmp = obj["material"]
                    obj["material"] = copy.deepcopy(defines[k])
                    for j in tmp:
                        obj["material"][j] = tmp[j]
            if "transform" in obj and k in obj["transform"]:
                i = obj["transform"].index(k)
                del obj["transform"][i]
                for item in copy.deepcopy(defines[k]):
                    obj["transform"].insert(i, item)
                    i += 1
            if "add" in obj:
                if k == obj["add"]:
                    nd = copy.deepcopy(defines[k])
                    if isinstance(nd, dict) and nd.get("add") == "group" and "children" in nd:
                        _expand(nd["children"], defines)
                    if isinstance(nd, dict) and nd.get("add") == "csg":
                        if "left" in nd:
                            _expand([nd["left"]], defines)
                        if "right" in nd:
                            _expand([nd["right"]], defines)
                    for l in nd:
                        if l not in ("material", "transform"):
                            obj[l] = nd[l]
                        if l == "material" and "material" not in obj:
                            obj[l] = nd[l]
                        if l == "transform":
                            if "transform" not in obj:
                                obj[l] = nd[l]
                            else:
                                i = 0
                                for xform in nd[l]:
                                    obj[l].insert(i, xform)
                                    i += 1
                # child recursion sits inside the defines loop in the
                # reference (yaml_parser.py:131-135), so nested define
                # references expand through repetition — match that.
                if obj["add"] == "group" and "children" in obj:
                    _expand(obj["children"], defines)
                if obj["add"] == "csg" and "left" in obj and "right" in obj:
                    _expand([obj["left"]], defines)
                    _expand([obj["right"]], defines)


# ---------------------------------------------------------------------------
# object construction
# ---------------------------------------------------------------------------

_MAP_TYPES = ["Ka", "Kd", "Ks", "Ns", "bump", "disp", "refl", "d"]
_SLOT_NAME = {"Ka": "map_Ka", "Kd": "map_Kd", "Ks": "map_Ks", "Ns": "map_Ns",
              "bump": "map_bump", "disp": "map_disp", "refl": "map_refl",
              "d": "map_d"}


def _uv_pattern(obj: dict, slot: str) -> PatternDesc:
    typ = obj["type"]
    if typ in ("checkers", "check"):
        return PatternDesc(kind="uv_checker",
                           colors=[tuple(obj["colors"][0]), tuple(obj["colors"][1])],
                           width=int(obj["width"]), height=int(obj["height"]))
    if typ in ("align_check", "align-check"):
        c = obj["colors"]
        return PatternDesc(kind="uv_align_check",
                           colors=[tuple(c["main"]), tuple(c["ul"]), tuple(c["ur"]),
                                   tuple(c["bl"]), tuple(c["br"])])
    if typ == "image":
        # sRGB-decode only for Ka/Kd slots (yaml_parser/pattern.py:264-266)
        return PatternDesc(kind="uv_image", file=obj["file"],
                           decode_to_linear=slot in ("Ka", "Kd"))
    if typ in ("gradient", "radial-gradient", "radial_gradient"):
        # C-library uv patterns (pattern.c:269-283) that the reference's own
        # YAML frontend never exposed; we surface them so the full C pattern
        # surface is reachable.
        kind = "uv_gradient" if typ == "gradient" else "uv_radial_gradient"
        return PatternDesc(kind=kind,
                           colors=[tuple(obj["colors"][0]),
                                   tuple(obj["colors"][1])])
    raise ValueError(f"Unable to parse uv pattern type: {typ}")


def _pattern(obj: dict, slot: str) -> PatternDesc:
    typ = obj["type"]
    transform = obj.get("transform", []) or []
    if typ in ("checker", "checkers", "gradient", "radial-gradient",
               "rings", "ring", "stripe", "stripes"):
        kind = {"checkers": "checker", "rings": "ring", "stripes": "stripe",
                "radial-gradient": "radial_gradient"}.get(typ, typ)
        return PatternDesc(kind=kind, transform=transform,
                           colors=[tuple(obj["colors"][0]), tuple(obj["colors"][1])])
    if typ == "blended":
        return PatternDesc(kind="blended", transform=transform,
                           children=[_pattern(obj["left"], slot),
                                     _pattern(obj["right"], slot)])
    if typ == "nested":
        # NOTE: the reference's generator emits the *primary* pattern again in
        # the third slot instead of `right` (yaml_parser/pattern.py:54-63) —
        # reproduced here for output parity.
        return PatternDesc(kind="nested", transform=transform,
                           children=[_pattern(obj["primary"], slot),
                                     _pattern(obj["left"], slot),
                                     _pattern(obj["primary"], slot)])
    if typ == "perturbed":
        return PatternDesc(
            kind="perturbed", transform=transform,
            children=[_pattern(obj["primary"], slot)],
            frequency=float(obj.get("frequency", 1.0)),
            scale_factor=float(obj.get("scale-factor", 0.01)),
            persistence=float(obj.get("persistence", 0.7)),
            octaves=int(obj.get("octaves", 1)),
            seed=int(obj.get("seed", 0)))
    if typ == "map":
        mapping = obj["mapping"]
        if mapping in ("cube", "cubic"):
            # C face index order: right, left, up, down, front, back
            faces = [_uv_pattern(obj[f], slot)
                     for f in ("right", "left", "up", "down", "front", "back")]
            return PatternDesc(kind="map", mapping="cube", transform=transform,
                               faces=faces)
        if mapping in ("cylindrical", "cylinder"):
            if "uv_pattern" in obj:
                body = _uv_pattern(obj["uv_pattern"], slot)
                faces = [body, body, body]
            else:
                faces = [_uv_pattern(obj["front"], slot),
                         _uv_pattern(obj["top"], slot),
                         _uv_pattern(obj["bottom"], slot)]
            return PatternDesc(kind="map", mapping="cylinder",
                               transform=transform, faces=faces)
        canonical = {"triangular": "triangle", "triangle": "triangle",
                     "planar": "plane", "plane": "plane",
                     "spherical": "sphere", "sphere": "sphere",
                     "toroidal": "toroid", "toroid": "toroid",
                     "torus": "toroid"}[mapping]
        return PatternDesc(kind="map", mapping=canonical, transform=transform,
                           faces=[_uv_pattern(obj["uv_pattern"], slot)])
    raise ValueError(f"Unable to parse pattern type: {typ}")


def _material(obj) -> MaterialDesc:
    obj = dict(obj) if obj else {}
    m = MaterialDesc(
        color=tuple(obj.get("color", (1.0, 1.0, 1.0))),
        ambient=float(obj.get("ambient", 0.1)),
        diffuse=float(obj.get("diffuse", 0.9)),
        specular=float(obj.get("specular", 0.9)),
        shininess=float(obj.get("shininess", 200.0)),
        reflective=float(obj.get("reflective", 0.0)),
        transparency=float(obj.get("transparency", 0.0)),
        refractive_index=float(obj.get("refractive-index", 1.0)),
        casts_shadow=bool(obj.get("shadow", True)),
    )
    if "pattern" in obj:
        p = _pattern(obj["pattern"], "Ka")
        m.patterns = {"map_Ka": p, "map_Kd": _pattern(obj["pattern"], "Kd")}
    elif "patterns" in obj:
        m.patterns = {
            _SLOT_NAME[k]: _pattern(obj["patterns"][k], k)
            for k in _MAP_TYPES if k in obj["patterns"]
        }
    return m


def _shape(obj: dict) -> ShapeDesc:
    kind = obj["add"]
    transform = obj.get("transform", []) or []
    material = _material(obj["material"]) if "material" in obj else None

    if kind in ("sphere", "plane", "cube"):
        return ShapeDesc(kind=kind, transform=transform, material=material)
    if kind in ("cone", "cylinder"):
        return ShapeDesc(
            kind=kind, transform=transform, material=material,
            minimum=float(obj.get("min", float("-inf"))),
            maximum=float(obj.get("max", float("inf"))),
            closed=bool(obj.get("closed", False)))
    if kind in ("toroid", "torus"):
        return ShapeDesc(kind="toroid", transform=transform, material=material,
                         r1=float(obj.get("r1", 0.75)),
                         r2=float(obj.get("r2", 0.25)))
    if kind == "triangle":
        return ShapeDesc(kind="triangle", transform=transform, material=material,
                         p1=tuple(obj["p1"]), p2=tuple(obj["p2"]),
                         p3=tuple(obj["p3"]))
    if kind == "smooth-triangle":
        return ShapeDesc(kind="smooth_triangle", transform=transform,
                         material=material,
                         p1=tuple(obj["p1"]), p2=tuple(obj["p2"]),
                         p3=tuple(obj["p3"]),
                         n1=tuple(obj["n1"]), n2=tuple(obj["n2"]),
                         n3=tuple(obj["n3"]))
    if kind == "group":
        # group-level material is pushed to children lacking one
        # (yaml_parser/shapes.py:35-38)
        children_yaml = obj.get("children", [])
        if "material" in obj:
            for child in children_yaml:
                if "material" not in child:
                    child["material"] = copy.deepcopy(obj["material"])
        return ShapeDesc(kind="group", transform=transform,
                         children=[_shape(c) for c in children_yaml])
    if kind == "csg":
        if "material" in obj:
            for side in ("left", "right"):
                if "material" not in obj[side]:
                    obj[side]["material"] = copy.deepcopy(obj["material"])
        op = obj.get("op", obj.get("operation"))
        if op not in ("union", "intersection", "difference"):
            raise ValueError(f"Unknown CSG operation: {op}")
        return ShapeDesc(kind="csg", transform=transform, op=op,
                         left=_shape(obj["left"]), right=_shape(obj["right"]))
    if kind == "obj":
        return ShapeDesc(kind="obj", transform=transform, material=material,
                         file=obj["file"])
    raise ValueError(f"unsupported shape: {kind}")


def _light(obj: dict) -> LightDesc:
    cache_size = int(obj.get("cache-size", 65536))
    intensity = tuple(obj["intensity"])
    if "at" in obj:
        if "to" in obj:
            if "radius" in obj:
                return LightDesc(kind="circle", intensity=intensity,
                                 at=tuple(obj["at"]), to=tuple(obj["to"]),
                                 radius=float(obj["radius"]),
                                 usteps=int(obj["usteps"]),
                                 vsteps=int(obj["vsteps"]),
                                 jitter=bool(obj.get("jitter", False)),
                                 cache_size=cache_size)
            return LightDesc(kind="hemisphere", intensity=intensity,
                             at=tuple(obj["at"]), to=tuple(obj["to"]))
        return LightDesc(kind="point", intensity=intensity, at=tuple(obj["at"]))
    if "corner" in obj:
        return LightDesc(kind="area", intensity=intensity,
                         corner=tuple(obj["corner"]),
                         uvec=tuple(obj["uvec"]), vvec=tuple(obj["vvec"]),
                         usteps=int(obj["usteps"]), vsteps=int(obj["vsteps"]),
                         jitter=bool(obj.get("jitter", False)),
                         cache_size=cache_size)
    raise ValueError("unrecognized light")


def _camera(obj: dict) -> CameraDesc:
    ap_yaml = dict(obj.get("aperture", {}) or {})
    usteps = int(obj.get("usteps", 1))
    vsteps = int(obj.get("vsteps", 1))
    typ = ap_yaml.get("type", ["POINT_APERTURE"])
    aperture = ApertureDesc(
        kind=typ[0], size=float(ap_yaml.get("size", 0.0)),
        jitter=bool(ap_yaml.get("jitter", False)),
        params=tuple(float(x) for x in typ[1:]))
    return CameraDesc(
        width=int(obj["width"]), height=int(obj["height"]),
        field_of_view=float(obj["field-of-view"]),
        frm=tuple(obj["from"]), to=tuple(obj["to"]), up=tuple(obj["up"]),
        focal_length=float(obj.get("focal-length", 1.0)),
        usteps=usteps, vsteps=vsteps, aperture=aperture)


def _config(obj: dict) -> ConfigDesc:
    illum = obj.get("illumination", {}) or {}
    di = illum.get("direct-illumination", {}) or {}
    gi = illum.get("global-illumination", {}) or {}
    threading = obj.get("threading", {}) or {}
    scene = obj.get("scene", {}) or {}
    output = obj.get("output", {}) or {}
    return ConfigDesc(
        include_direct=bool(illum.get("include-direct", True)),
        include_global=bool(illum.get("include-global", False)),
        visualize_photon_map=bool(illum.get("visualize-photon-map", False)),
        visualize_soft_indirect=bool(illum.get("visualize-soft-indirect", False)),
        include_ambient=bool(di.get("include-ambient", True)),
        include_diffuse=bool(di.get("include-diffuse", True)),
        include_specular_highlight=bool(di.get("include-specular-highlight", True)),
        include_specular=bool(di.get("include-specular", True)),
        di_path_length=int(di.get("path-length", 5)),
        include_caustics=bool(gi.get("include-caustics", False)),
        include_final_gather=bool(gi.get("include-final-gather", False)),
        gi_usteps=int(gi.get("usteps", 1)),
        gi_vsteps=int(gi.get("vsteps", 1)),
        irradiance_estimate_num=int(gi.get("irradiance-estimate-num", 200)),
        irradiance_estimate_radius=float(gi.get("irradiance-estimate-radius", 0.1)),
        irradiance_estimate_cone_filter_k=float(
            gi.get("irradiance-estimate-cone-filter-k", 1.0)),
        photon_count=int(gi.get("photon-count", 0)),
        gi_path_length=int(gi.get("path-length", 5)),
        thread_count=int(threading.get("thread-count", 4)),
        divide_threshold=int(scene.get("divide-threshold", 1)),
        output_file=str(output.get("file", "/tmp/ray_tracer_out")),
        color_space=str(output.get("color-space", "SRGB")),
    )


def load_scene(path: str) -> SceneDesc:
    """Load a reference-schema YAML scene file into a SceneDesc."""
    with open(path) as f:
        tree = yaml.load(f, Loader=_Loader)
    scene = SceneDesc(root_dir=os.path.dirname(os.path.abspath(path)) or ".")
    if tree is None:
        return scene
    defines = _collect_defines(tree)
    _expand(tree, defines)
    for obj in tree:
        if not isinstance(obj, dict) or "add" not in obj:
            continue
        add = obj["add"]
        if add == "camera":
            scene.camera = _camera(obj)
        elif add == "light":
            scene.lights.append(_light(obj))
        elif add == "config":
            scene.config = _config(obj)
        else:
            scene.world.append(_shape(obj))
    return scene
