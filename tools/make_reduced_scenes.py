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
    return adds(tree, "config")[0]


def set_output(tree, path):
    config(tree).setdefault("output", {})["file"] = path


def absolutize_obj_files(tree):
    """Make `add: obj` file paths absolute (reference resolves them
    relative to the cwd; the reduced ymls live elsewhere)."""
    def walk(node):
        if isinstance(node, dict):
            if node.get("add") == "obj" and "file" in node:
                if not os.path.isabs(node["file"]):
                    node["file"] = os.path.join(REF, node["file"])
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
    os.makedirs(out_dir, exist_ok=True)

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

    # bbox_tiny: bounding_boxes (141k-triangle dragons) at 150x60.
    t = load("scenes/bounding_boxes/bounding_boxes.yml")
    set_camera(t, width=150, height=60)
    absolutize_obj_files(t)
    set_output(t, "/tmp/golden_out")
    dump(t, out_dir, "bbox_tiny.yml")

    # csg_test: hand-authored (tools/golden_scenes/csg_test.yml).
    here = os.path.dirname(os.path.abspath(__file__))
    shutil.copy(os.path.join(here, "golden_scenes", "csg_test.yml"),
                os.path.join(out_dir, "csg_test.yml"))


if __name__ == "__main__":
    main(sys.argv[1])
