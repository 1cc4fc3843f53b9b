#!/bin/bash
# Build the reference C ray tracer and render the golden PPMs the test
# suite compares against (tests/test_golden.py). Goldens land in
# .baseline/golden/ (gitignored; regenerate with this script after a
# wipe). Idempotent: existing goldens are kept.
#
# Usage: tools/make_goldens.sh [scene ...]   (default: all)
set -euo pipefail

REPO=$(cd "$(dirname "$0")/.." && pwd)
REF=/root/reference
BASE="$REPO/.baseline"
REFB="$BASE/ref"
GOLD="$BASE/golden"
mkdir -p "$GOLD"
# PIL-based `convert` shim for JPG->PNG texture conversion (tools/convert_shim)
export PATH="$REPO/tools/convert_shim:$PATH"
chmod +x "$REPO/tools/convert_shim/convert"

# ---- 1. copy the reference sources (it is mounted read-only) ----------
if [ ! -d "$REFB/src" ]; then
  mkdir -p "$REFB"
  cp -r "$REF/src" "$REF/yaml_parser" "$REF/scenes" "$REFB/"
fi
cd "$REFB"

# CornellBox-Water.obj ships with CRLF line endings; the reference's
# fan_triangulation (obj_loader.c:262-316) tokenizes the trailing "\r\n"
# of "f v/t/n ... \r\n" lines as a vertex, sscanf fails, index 0-1 = -1
# reads out of bounds -> segfault. Normalize the writable copy so the
# reference binary can render its own scene (our loader tolerates CRLF).
if grep -q $'\r' "$REFB/scenes/cornell_box/CornellBox-Water.obj" 2>/dev/null; then
  sed -i 's/\r$//' "$REFB/scenes/cornell_box/CornellBox-Water.obj" \
                   "$REFB/scenes/cornell_box/CornellBox-Water.mtl" || true
fi
# Second reference bug: its parse_mtl opens `mtllib` paths relative to the
# binary's CWD (obj_loader.c:139-213), but the scene references the obj as
# scenes/cornell_box/CornellBox-Water.obj whose mtllib is the bare file
# name — no CWD satisfies both, so the reference silently renders every
# surface with the default white material (and then the caustic photon
# loop never stores -> infinite loop). Absolutize the mtllib line in the
# writable copy so the reference loads the real water/glass materials.
if grep -q "^mtllib CornellBox-Water.mtl" \
     "$REFB/scenes/cornell_box/CornellBox-Water.obj" 2>/dev/null; then
  sed -i "s|^mtllib CornellBox-Water.mtl|mtllib $REFB/scenes/cornell_box/CornellBox-Water.mtl|" \
    "$REFB/scenes/cornell_box/CornellBox-Water.obj"
fi

# ---- 2. compile the C library once ------------------------------------
# core_select.c is macOS-only dead code (SURVEY.md: core_select); skip it.
if [ ! -f libray.a ]; then
  echo "Building reference library..."
  objs=()
  for c in $(find src -name '*.c' ! -name 'core_select.c'); do
    o="${c%.c}.o"
    cc -std=gnu11 -D_GNU_SOURCE -O2 -march=native -c -o "$o" "$c"
    objs+=("$o")
  done
  ar rcs libray.a "${objs[@]}"
fi

# ---- 3. reduced scenes -------------------------------------------------
python3 "$REPO/tools/make_reduced_scenes.py" "$REFB/scenes_reduced"
cp "$REFB"/scenes_reduced/*.yml "$GOLD/"

# ---- 4. render one scene ----------------------------------------------
# The binary writes <output.file>.ppm; output.file defaults to
# /tmp/ray_tracer_out and is /tmp/out_file or /tmp/golden_out in scenes
# that set it (SURVEY.md: write_ppm_file canvas.c:303).
render() {
  local name=$1 yml=$2
  if [ -f "$GOLD/$name.ppm" ]; then
    echo "golden $name.ppm exists, skipping"
    return 0
  fi
  echo "=== rendering golden: $name ($yml)"
  rm -f /tmp/ray_tracer_out.ppm /tmp/out_file.ppm /tmp/golden_out.ppm
  python3 yaml_parser/yaml_parser.py "$yml" > main_gen.c
  cc -std=gnu11 -D_GNU_SOURCE -O2 -march=native -o rt_gen main_gen.c \
     libray.a -lz -lpng16 -lm -lpthread
  local t0=$SECONDS
  ./rt_gen > /dev/null
  echo "$name $((SECONDS - t0))s" >> "$GOLD/timings.txt"
  local out
  out=$(ls -t /tmp/ray_tracer_out.ppm /tmp/out_file.ppm /tmp/golden_out.ppm \
        2>/dev/null | head -1 || true)
  [ -n "$out" ] || { echo "no output produced for $name"; exit 1; }
  mv "$out" "$GOLD/$name.ppm"
}

declare -A SCENES=(
  [checkered_sphere]=scenes/checkered_sphere/checkered_sphere.yml
  [reflect_refract]=scenes/reflect_refract/reflect_refract.yml
  [area_light_test]=scenes/area_light_test/area_light_test.yml
  [teapot]=scenes/teapot/teapot.yml
  [checkered_cube]=scenes/checkered_cube/checkered_cube.yml
  [checkered_cylinder]=scenes/checkered_cylinder/checkered_cylinder.yml
  [checkered_torus]=scenes/checkered_torus/checkered_torus.yml
  [align_check_plane]=scenes/align_check_plane/align_check_plane.yml
  [group_test]=scenes/group_test/group.yml
  [reflect_refract_test]=scenes/reflect_refract_test/test.yml
  [test]=scenes/test/test.yml
  [texture_map_test]=scenes/texture_map_test/texture_map_test.yml
  [spec_map_test]=scenes/spec_map_test/spec_map_test.yml
  [bump_map_test]=scenes/bump_map_test/bump_map_test.yml
  [csg_test]=scenes_reduced/csg_test.yml
  [csg_obj_test]=scenes_reduced/csg_obj_test.yml
  [glamour_small]=scenes_reduced/glamour_small.yml
  [bbox_tiny]=scenes_reduced/bbox_tiny.yml
  [water_small]=scenes_reduced/water_small.yml
  [water_caustic_small]=scenes_reduced/water_caustic_small.yml
  [cornell_small]=scenes_reduced/cornell_small.yml
  [cornell_direct]=scenes_reduced/cornell_direct.yml
  [lens_small]=scenes_reduced/lens_small.yml
  [skybox_small]=scenes_reduced/skybox_small.yml
  [orrery_small]=scenes_reduced/orrery_small.yml
  [sibenik_small]=scenes_reduced/sibenik_small.yml
  [dof_small]=scenes_reduced/dof_small.yml
  [cover_small]=scenes_reduced/cover_small.yml
  [mtl_test]=scenes_reduced/mtl_test.yml
)

if [ $# -gt 0 ]; then
  names=("$@")
else
  names=(checkered_sphere checkered_cube checkered_cylinder checkered_torus
         align_check_plane group_test reflect_refract_test test
         texture_map_test spec_map_test bump_map_test csg_test csg_obj_test
         reflect_refract area_light_test teapot glamour_small bbox_tiny
         water_small water_caustic_small
         cornell_direct cornell_small lens_small skybox_small
         orrery_small mtl_test dof_small cover_small)
fi

for n in "${names[@]}"; do
  render "$n" "${SCENES[$n]}"
done
echo "All goldens done: $(ls "$GOLD" | wc -l) files in $GOLD"
