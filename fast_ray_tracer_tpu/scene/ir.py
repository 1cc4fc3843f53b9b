"""SceneIR — the flat, SoA, device-resident scene representation.

The reference walks a pointer-based shape tree with per-shape function
pointers and per-thread deep copies (src/shapes/shapes.h:85-118,
src/renderer/world.c:35-111). Here the whole scene is a pytree of dense
arrays: one block of analytic primitives grouped by type, one triangle-mesh
block with world-space pre-transformed vertices, plus materials / patterns /
textures / lights tables. Group transform chains are pre-composed into each
leaf's world->object inverse at compile time (valid because world_to_object
is just the product of the parent chain, src/shapes/shapes.c:116-131), so
no tree remains to traverse — intersection is a flat batched computation.

All float leaves are differentiable parameters: pixel gradients flow to
material tables, light intensities and the (inverse) transforms themselves.

Static (non-leaf) metadata lives in `SceneMeta` as the pytree aux data.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

# analytic primitive type ids (block-contiguous in the tables)
SPHERE, PLANE, CUBE, CYLINDER, CONE, TOROID = range(6)
ANALYTIC_TYPE_NAMES = ["sphere", "plane", "cube", "cylinder", "cone", "toroid"]
# per-type max intersection count (src/shapes/*: xs scratch sizes)
TYPE_MAX_HITS = {SPHERE: 2, PLANE: 1, CUBE: 2, CYLINDER: 4, CONE: 4, TOROID: 4}

# pattern type ids
(PAT_CHECKER, PAT_GRADIENT, PAT_RADIAL_GRADIENT, PAT_RING, PAT_STRIPE,
 PAT_BLENDED, PAT_NESTED, PAT_PERTURBED, PAT_MAP,
 PAT_UV_CHECKER, PAT_UV_ALIGN_CHECK, PAT_UV_TEXTURE,
 PAT_UV_GRADIENT, PAT_UV_RADIAL_GRADIENT) = range(14)

# uv map kinds (reference: enum uv_map_type usage in pattern.c:309-488)
(MAP_CUBE, MAP_CYLINDER, MAP_PLANE, MAP_SPHERE, MAP_TOROID, MAP_TRIANGLE) = range(6)

# light type ids
LIGHT_POINT, LIGHT_AREA, LIGHT_CIRCLE, LIGHT_HEMISPHERE = range(4)

# material map slots (order of mat_map columns)
MAP_SLOTS = ["map_Ka", "map_Kd", "map_Ks", "map_Ns", "map_d",
             "map_bump", "map_disp", "map_refl"]
SLOT_KA, SLOT_KD, SLOT_KS, SLOT_NS, SLOT_D, SLOT_BUMP, SLOT_DISP, SLOT_REFL = range(8)


@dataclass(frozen=True)
class SceneMeta:
    """Static scene structure (hashable; becomes jit-static aux data)."""
    n_analytic: int = 0
    n_triangles: int = 0
    n_materials: int = 0
    n_patterns: int = 0
    n_lights: int = 0
    # per-type (start, count) into the analytic block
    type_ranges: Tuple[Tuple[int, int, int], ...] = ()   # (type_id, start, count)
    # per-light static info: (type_id, usteps, vsteps, jitter, num_samples)
    light_info: Tuple[Tuple[int, int, int, bool, int], ...] = ()
    max_light_samples: int = 1
    # shading flags (from config + material scan)
    has_reflective: bool = False
    has_refractive: bool = False
    needs_hit_sort: bool = False      # refraction containers need sorted hits
    max_hits: int = 8                 # K for the sorted hit list
    # triangle clustering (large meshes): Morton-ordered fixed-size
    # clusters streamed with AABB culling instead of dense (rays x Nt)
    use_clusters: bool = False
    n_clusters: int = 0
    cluster_size: int = 64
    # pattern slots present anywhere (skip pattern machinery when unused)
    any_patterns: bool = False
    any_bump: bool = False
    # material-map columns with ANY pattern bound (static): slot_color
    # evaluates patterns only for these columns — a scene whose materials
    # pattern only Ka/Kd skips the 6 other per-lane pattern evals
    pattern_slots: Tuple[int, ...] = ()
    # pattern type ids present in the scene: lets the evaluator prune whole
    # sub-graphs (combinator recursion, perlin unrolls, texture gathers)
    pattern_kinds: Tuple[int, ...] = ()
    map_kinds: Tuple[int, ...] = ()  # uv-map projections present
    pattern_depth: int = 0          # max combinator nesting depth present
    max_perlin_octaves: int = 0
    # csg: per tree, internal nodes as (nid, depth, op) — op 0=union,
    # 1=intersection, 2=difference. A leaf prim belongs to node nid iff
    # bit nid of its csg_anc mask is set; bit nid of csg_side says which
    # side (0=left subtree, 1=right). Bitmasks (not path prefixes) so that
    # SIBLING subtrees under a group child stay distinct (the orrery gear
    # is csg(cyl, group{20 notch CSGs}) — src/shapes/csg.c filters each
    # notch's own hits before the group merge).
    csg_trees: Tuple[Tuple[Tuple[int, int, int], ...], ...] = ()
    has_csg: bool = False
    # per-global-prim (analytic block order, then triangles) csg tags as
    # PYTHON ints — arbitrary-precision masks, so trees of any node count
    # work (the reference accepts any shape/size as a csg child,
    # src/shapes/csg.c:166-206)
    csg_prim_leaf: Tuple[int, ...] = ()
    csg_prim_anc: Tuple[int, ...] = ()
    csg_prim_side: Tuple[int, ...] = ()


@jax.tree_util.register_pytree_node_class
@dataclass
class SceneIR:
    meta: SceneMeta

    # --- analytic primitives (Na) ---
    inv_tf: Any = None          # (Na,4,4) world->object
    prim_params: Any = None     # (Na,4): cyl/cone [min,max,closed,_], toroid [r1,r2,_,_]
    material_id: Any = None     # (Na,) i32
    prim_shadow_rank: Any = None  # (Na+Nt,) i32 post-divide DFS walk order
                                  # (shadow early-exit semantics, divide.py)

    # --- triangles (Nt), world space ---
    tri_p1: Any = None          # (Nt,3)
    tri_e1: Any = None
    tri_e2: Any = None
    tri_n1: Any = None          # unnormalized world-space vertex normals
    tri_n2: Any = None
    tri_n3: Any = None
    tri_t1: Any = None          # (Nt,2) texture coords
    tri_t2: Any = None
    tri_t3: Any = None
    tri_use_tex: Any = None     # (Nt,) bool
    tri_material_id: Any = None # (Nt,) i32
    # cluster AABBs (Nc,3) — acceleration structure, not trainable
    # (culling is discrete; parallel/train.py excludes these from params)
    cluster_min: Any = None
    cluster_max: Any = None

    # --- materials (M) ---
    mat_Ka: Any = None          # (M,3) linear
    mat_Kd: Any = None
    mat_Ks: Any = None
    mat_Tf: Any = None
    mat_refl: Any = None
    mat_Ns: Any = None          # (M,)
    mat_Ni: Any = None
    mat_Tr: Any = None
    mat_reflective: Any = None  # (M,) bool
    mat_casts_shadow: Any = None
    mat_map: Any = None         # (M,8) i32 pattern ids, -1 = none

    # --- patterns (P) ---
    pat_type: Any = None        # (P,) i32
    pat_inv_tf: Any = None      # (P,4,4)
    pat_colors: Any = None      # (P,5,3)
    pat_params: Any = None      # (P,6)
    pat_children: Any = None    # (P,6) i32 children / map faces
    pat_map_kind: Any = None    # (P,) i32
    pat_tex: Any = None         # (P,) i32

    # --- texture atlas ---
    tex_data: Any = None        # (sum(w*h), 3)
    tex_offset: Any = None      # (T,) i32
    tex_width: Any = None
    tex_height: Any = None

    # --- lights (L) ---
    light_intensity: Any = None  # (L,3)
    light_pos: Any = None        # (L,3)
    light_uvec: Any = None       # (L,3) per-step u vector
    light_vvec: Any = None
    light_normal: Any = None     # (L,3)
    light_radius: Any = None     # (L,)
    light_points: Any = None     # (L,S_max,3) deterministic surface point cache
    light_mask: Any = None       # (L,S_max)

    def tree_flatten(self):
        leaves = tuple(getattr(self, f.name) for f in fields(self)
                       if f.name != "meta")
        return leaves, self.meta

    @classmethod
    def tree_unflatten(cls, meta, leaves):
        names = [f.name for f in fields(cls) if f.name != "meta"]
        return cls(meta, **dict(zip(names, leaves)))

    # convenience
    @property
    def n_prims(self):
        return self.meta.n_analytic + self.meta.n_triangles
