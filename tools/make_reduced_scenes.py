"""Generate the reduced golden-test scene YAMLs from the reference scenes.

The slow graded scenes (cornell_box GI, shadow_glamour_shot,
bounding_boxes) are rendered at reduced resolution/photon counts for the
test suite. This script derives those reduced YAMLs from the reference
originals (/root/reference/scenes/...) by editing only resolution and
sampling knobs, so the scene content stays identical to the reference.

Usage: python3 tools/make_reduced_scenes.py <out_dir>
"""

import copy
import os
import shutil
import sys

import yaml

REF = "/root/reference"


def load(rel):
    with open(os.path.join(REF, rel)) as f:
        return yaml.safe_load(f)


def adds(tree, what):
    return [n for n in tree if isinstance(n, dict) and n.get("add") == what]


def set_camera(tree, **kw):
    cam = adds(tree, "camera")[0]
    cam.update(kw)


def config(tree):
    cfgs = adds(tree, "config")
    if not cfgs:
        cfg = {"add": "config"}
        tree.insert(0, cfg)
        return cfg
    return cfgs[0]


def set_output(tree, path):
    config(tree).setdefault("output", {})["file"] = path


ASSETS_ROOT = REF   # set from out_dir in main(): the writable ref copy


def absolutize_files(tree):
    """Make every relative asset `file:` path absolute into the writable
    reference copy (.baseline/ref). The reference binary resolves paths
    relative to its cwd and *writes* converted .png siblings next to JPG
    textures (yaml_parser/pattern.py:255-261), so paths must point into
    the writable copy — and our loader resolves the same absolute paths
    when the reduced yml is loaded from .baseline/golden."""
    def walk(node):
        if isinstance(node, dict):
            f = node.get("file")
            if isinstance(f, str) and not os.path.isabs(f):
                p = os.path.join(ASSETS_ROOT, f)
                if os.path.exists(p) or os.path.exists(
                        os.path.splitext(p)[0] + ".png"):
                    node["file"] = p
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(tree)


def substitute_files(tree, mapping):
    """Replace asset paths (e.g. assets the reference credits but never
    checked in)."""
    def walk(node):
        if isinstance(node, dict):
            f = node.get("file")
            if isinstance(f, str) and f in mapping:
                node["file"] = mapping[f]
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(tree)


def dump(tree, out_dir, name):
    with open(os.path.join(out_dir, name), "w") as f:
        yaml.safe_dump(tree, f, default_flow_style=None, sort_keys=False)


def main(out_dir):
    global ASSETS_ROOT
    os.makedirs(out_dir, exist_ok=True)
    # asset paths resolve into the writable reference copy (.baseline/ref)
    ASSETS_ROOT = os.path.dirname(os.path.abspath(out_dir))

    # glamour_small: shadow_glamour_shot at 300x120 (jittered 10x10 area
    # light -> statistical parity).
    t = load("scenes/shadow_glamour_shot/shadow_glamour_shot.yml")
    set_camera(t, width=300, height=120)
    # the original has a bare `add: config` with thread-count only
    cfg = config(t)
    cfg.setdefault("output", {})["file"] = "/tmp/golden_out"
    dump(t, out_dir, "glamour_small.yml")

    # cornell_small: cornell_box GI at 120x120, 100k photons, 3x3 final
    # gather, 1x1 camera supersampling.
    t = load("scenes/cornell_box/cornell_box.yml")
    set_camera(t, width=120, height=120, usteps=1, vsteps=1)
    cfg = config(t)
    gi = cfg["illumination"]["global-illumination"]
    gi["photon-count"] = 100000
    gi["usteps"] = 3
    gi["vsteps"] = 3
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "cornell_small.yml")

    # cornell_direct: identical but direct illumination only.
    t = copy.deepcopy(t)
    cfg = config(t)
    cfg["illumination"]["include-global"] = False
    cfg["illumination"]["global-illumination"]["photon-count"] = 0
    dump(t, out_dir, "cornell_direct.yml")

    # water_small: cornell_box_water — 7.1k-triangle clustered OBJ mesh
    # with refractive water/glass materials (Ni 1.5/2.5 -> the containers
    # n1/n2 walk must run over clustered-mesh hits). Deterministic
    # variant: GI off, 1x1 sampling -> bitwise.
    t = load("scenes/cornell_box/cornell_box_water.yml")
    set_camera(t, width=150, height=120, usteps=1, vsteps=1)
    absolutize_files(t)
    cfg = config(t)
    cfg["illumination"]["include-global"] = False
    cfg["illumination"]["global-illumination"]["photon-count"] = 0
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "water_small.yml")

    # water_caustic_small: same scene with the caustic photon map on
    # (10k photons through the water surface) -> statistical.
    t = load("scenes/cornell_box/cornell_box_water.yml")
    set_camera(t, width=100, height=80, usteps=1, vsteps=1)
    absolutize_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "water_caustic_small.yml")

    # bbox_tiny: bounding_boxes (141k-triangle dragons) at 150x60.
    t = load("scenes/bounding_boxes/bounding_boxes.yml")
    set_camera(t, width=150, height=60)
    absolutize_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "bbox_tiny.yml")

    # lens_small: CSG lenses, deterministic (1x1, no jitter) -> bitwise.
    t = load("scenes/lens_test/lens_test.yml")
    set_camera(t, width=300, height=150)
    absolutize_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "lens_small.yml")

    # skybox_small: cube-map sky sphere, deterministic -> bitwise.
    t = load("scenes/skybox/skybox.yml")
    set_camera(t, width=200, height=100, usteps=2, vsteps=2)
    absolutize_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "skybox_small.yml")

    # orrery_small: image textures + reflective metals, deterministic.
    t = load("scenes/orrery/orrery.yml")
    set_camera(t, width=512, height=256)
    # the artist_workshop env map is credited in the scene comments but
    # never checked into the reference repo; substitute a texture that
    # exists so both renderers sample identical texels
    substitute_files(t, {"scenes/orrery/artist_workshop_16k.png":
                         "scenes/orrery/earthmap-small.jpg",
                         "scenes/orrery/artist_workshop_2k_normal.png":
                         "scenes/orrery/wood.jpg"})
    absolutize_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "orrery_small.yml")

    # NOTE: the reference's sibenik scene is unrenderable as checked in —
    # scenes/sibenik/sibenik.obj was never committed (only the .mtl and
    # textures). mtl_test (hand-authored) covers the same OBJ+MTL loader
    # path using the sibenik textures.
    here = os.path.dirname(os.path.abspath(__file__))

    def template(name, subs):
        with open(os.path.join(here, "golden_scenes", name)) as f:
            s = f.read()
        for k, v in subs.items():
            s = s.replace(k, v)
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(s)

    sib = os.path.join(ASSETS_ROOT, "scenes", "sibenik")
    template("mtl_test.yml", {"{ROOT}": ASSETS_ROOT})
    template("mtl_test.obj", {"mtllib mtl_test.mtl":
                              f"mtllib {out_dir}/mtl_test.mtl"})
    template("mtl_test.mtl", {"kamen.png": os.path.join(sib, "kamen.png"),
                              "kamen-bump.png":
                                  os.path.join(sib, "kamen-bump.png"),
                              "mramor6x6.png":
                                  os.path.join(sib, "mramor6x6.png"),
                              "mramor6x6-bump.png":
                                  os.path.join(sib, "mramor6x6-bump.png")})

    # dof_small: depth-of-field with jittered subpixels -> statistical.
    t = load("scenes/dof_test/dof.yml")
    set_camera(t, width=300, height=150, usteps=2, vsteps=2)
    absolutize_files(t)
    cfg = config(t)
    cfg.setdefault("output", {})["file"] = "/tmp/golden_out"
    dump(t, out_dir, "dof_small.yml")

    # cover_small: the book-cover scene, jittered subpixels -> statistical.
    t = load("scenes/cover/cover.yml")
    set_camera(t, width=200, height=200)
    absolutize_files(t)
    cfg = config(t)
    cfg.setdefault("output", {})["file"] = "/tmp/golden_out"
    dump(t, out_dir, "cover_small.yml")

    # csg_test: hand-authored (tools/golden_scenes/csg_test.yml).
    here = os.path.dirname(os.path.abspath(__file__))
    shutil.copy(os.path.join(here, "golden_scenes", "csg_test.yml"),
                os.path.join(out_dir, "csg_test.yml"))

    # csg_obj_test: CSG with an OBJ mesh child (hand-authored template —
    # the obj path is absolutized to the reference checkout).
    template("csg_obj_test.yml", {"{ROOT}": ASSETS_ROOT})


if __name__ == "__main__":
    main(sys.argv[1])
