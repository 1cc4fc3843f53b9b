"""Golden-image parity tests vs the reference binary's PPM output.

Goldens are produced by .baseline/make_goldens.sh from the reference
build (gitignored; tests skip when absent). Deterministic configs must be
byte-identical; stochastic ones compare statistically."""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import GOLDEN, REFERENCE

from fast_ray_tracer_tpu.io.ppm import construct_ppm
from fast_ray_tracer_tpu.render.render import render_scene
from fast_ray_tracer_tpu.scene.yaml_loader import load_scene


def _render_ppm(scene_yml, **kw):
    sc = load_scene(str(scene_yml))
    canvas = render_scene(sc, dtype=jnp.float64, **kw)
    return construct_ppm(canvas, use_scaling=True)


def _golden(name):
    p = GOLDEN / f"{name}.ppm"
    if not p.exists():
        pytest.skip(f"golden {name}.ppm not generated")
    return p.read_bytes()


def _decode(ppm_bytes):
    i = ppm_bytes.index(b"65535") + 6
    header = ppm_bytes[:i].split()
    w, h = int(header[1]), int(header[2])
    return np.frombuffer(ppm_bytes[i:i + w * h * 6],
                         dtype=">u2").astype(np.int64).reshape(h, w, 3)


def test_checkered_sphere_bitwise():
    golden = _golden("checkered_sphere")
    ours = _render_ppm(
        REFERENCE / "scenes/checkered_sphere/checkered_sphere.yml",
        chunk_pixels=40000)
    assert ours == golden


@pytest.mark.slow
def test_reflect_refract_bitwise():
    golden = _golden("reflect_refract")
    ours = _render_ppm(
        REFERENCE / "scenes/reflect_refract/reflect_refract.yml",
        chunk_pixels=20000)
    assert ours == golden


@pytest.mark.slow
def test_area_light_test_bitwise():
    golden = _golden("area_light_test")
    ours = _render_ppm(
        REFERENCE / "scenes/area_light_test/area_light_test.yml",
        chunk_pixels=20000)
    assert ours == golden


@pytest.mark.slow
def test_teapot_bitwise():
    golden = _golden("teapot")
    ours = _render_ppm(REFERENCE / "scenes/teapot/teapot.yml",
                       chunk_pixels=20000)
    assert ours == golden


FEATURE_SCENES = [
    # (golden name, scene path rel to REFERENCE, max differing pixels)
    ("checkered_cube", "scenes/checkered_cube/checkered_cube.yml", 0),
    ("checkered_cylinder", "scenes/checkered_cylinder/checkered_cylinder.yml", 0),
    ("checkered_torus", "scenes/checkered_torus/checkered_torus.yml", 0),
    ("align_check_plane", "scenes/align_check_plane/align_check_plane.yml", 0),
    # one cone/cylinder silhouette pixel flips on FP ties
    ("group_test", "scenes/group_test/group.yml", 4),
    ("reflect_refract_test", "scenes/reflect_refract_test/test.yml", 0),
    ("test", "scenes/test/test.yml", 0),
    ("texture_map_test", "scenes/texture_map_test/texture_map_test.yml", 0),
    ("spec_map_test", "scenes/spec_map_test/spec_map_test.yml", 0),
    # the cube's front face lies exactly on the plane-map v discontinuity
    # (obj z = -1.0): +-1 ulp flips texel row 255<->0, so pixels whose FP
    # error sign differs from the reference's flip texels (62 of 160000)
    ("bump_map_test", "scenes/bump_map_test/bump_map_test.yml", 200),
]


@pytest.mark.parametrize("name,rel,max_diff",
                         FEATURE_SCENES, ids=[s[0] for s in FEATURE_SCENES])
def test_feature_scene(name, rel, max_diff):
    golden = _golden(name)
    ours = _render_ppm(REFERENCE / rel, chunk_pixels=20000)
    if ours == golden:
        return
    assert max_diff > 0, f"{name} differs but should be byte-identical"
    a, g = _decode(ours), _decode(golden)
    d = np.abs(a - g).max(axis=-1)
    assert int((d > 0).sum()) <= max_diff, (int((d > 0).sum()), int(d.max()))


def test_csg_bitwise():
    """Difference, intersection, and a nested difference(union(...), ...)
    tree (the structure of cornell_box's right wall)."""
    golden = _golden("csg_test")
    yml = GOLDEN / "csg_test.yml"
    if not yml.exists():
        pytest.skip("csg_test.yml not generated")
    ours = _render_ppm(yml, chunk_pixels=15000)
    assert ours == golden


REDUCED_BITWISE = [
    # deterministic reduced scenes (no jitter, point aperture) -> bitwise
    ("lens_small", 0),       # CSG lens stack, refraction, 1200x600 scene
    # skybox: the mirror sphere reflects some rays exactly onto cube-map
    # CORNERS (|x| == |y| == max within 1e-12), where the reference's
    # face_from_point equal()-order pick (pattern.c:317-327) flips with
    # the last ulp of the host's -march=native FMA contraction; such
    # pixels are not reproducible even between reference builds, so allow
    # a couple of corner pixels (magnitude-unbounded: a different face is
    # a different texel color).
    ("skybox_small", 2),     # cube-map sky sphere, 2x2 supersampling
    ("orrery_small", 0),     # image textures + reflective metals
    # OBJ+MTL loader: mtllib/usemtl, map_Ka/map_Kd/map_bump, named groups
    # (sibenik.obj itself was never checked into the reference repo)
    ("mtl_test", 0),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,max_diff", REDUCED_BITWISE,
                         ids=[s[0] for s in REDUCED_BITWISE])
def test_reduced_scene_bitwise(name, max_diff):
    golden = _golden(name)
    yml = GOLDEN / f"{name}.yml"
    if not yml.exists():
        pytest.skip(f"{name}.yml not generated")
    ours = _render_ppm(yml, chunk_pixels=15000)
    if ours == golden:
        return
    assert max_diff > 0, f"{name} differs but should be byte-identical"
    a, g = _decode(ours), _decode(golden)
    d = np.abs(a - g).max(axis=-1)
    assert int((d > 0).sum()) <= max_diff, (int((d > 0).sum()), int(d.max()))


@pytest.mark.slow
@pytest.mark.parametrize("name,mean_tol,p99_tol", [
    # thresholds = 1.5x the reference's own run-to-run spread (two golden
    # renders; drand48 order varies with 4-thread scheduling):
    #   dof_small:   mean 0.0066, p99 0.094
    #   cover_small: mean 0.0026, p99 0.082
    ("dof_small", 0.010, 0.14),
    ("cover_small", 0.004, 0.12),
])
def test_jittered_scene_statistical(name, mean_tol, p99_tol):
    """Subpixel-jittered scenes (dof_test, cover) consume the reference's
    global drand48 -> statistical parity with a keyed PRNG."""
    golden = _golden(name)
    yml = GOLDEN / f"{name}.yml"
    if not yml.exists():
        pytest.skip(f"{name}.yml not generated")
    import jax
    sc = load_scene(str(yml))
    canvas = render_scene(sc, dtype=jnp.float64, chunk_pixels=10000,
                          key=jax.random.PRNGKey(5))
    ours = construct_ppm(canvas, use_scaling=True)
    a = _decode(ours).astype(np.float64) / 65535.0
    g = _decode(golden).astype(np.float64) / 65535.0
    d = np.abs(a - g)
    assert d.mean() < mean_tol, d.mean()
    assert np.percentile(d, 99) < p99_tol, np.percentile(d, 99)


@pytest.mark.slow
def test_glamour_statistical():
    """shadow_glamour_shot at 300x120: jittered 10x10 area light consumes
    the reference's global drand48, so parity is statistical. Measured
    reference-vs-reference run noise: mean 3.7e-5, p99 2.9e-4, max 2.1e-3;
    our keyed-PRNG render matches those statistics exactly."""
    golden = _golden("glamour_small")
    yml = GOLDEN / "glamour_small.yml"
    if not yml.exists():
        pytest.skip("glamour_small.yml not generated")
    import jax
    sc = load_scene(str(yml))
    canvas = render_scene(sc, dtype=jnp.float64, chunk_pixels=8000,
                          key=jax.random.PRNGKey(7))
    ours = construct_ppm(canvas, use_scaling=True)
    a = _decode(ours).astype(np.float64) / 65535.0
    g = _decode(golden).astype(np.float64) / 65535.0
    d = np.abs(a - g)
    assert d.mean() < 1e-4, d.mean()
    assert np.percentile(d, 99) < 1e-3, np.percentile(d, 99)


@pytest.mark.slow
def test_cornell_gi_statistical():
    """cornell_box at 120x120 with photon-mapped GI (100k photons, 3x3
    final gather, nested-CSG wall, mirror ball, jittered area light).

    Everything is stochastic (photon emission, RR, gather rays, light
    jitter), so the criteria are calibrated against the reference's own
    run-to-run spread (two checked goldens): per-pixel mean abs diff
    0.0478 between reference runs; total GI energy agrees to 0.1%. We
    require mean diff < 0.065 and total GI energy within 5%."""
    golden = _golden("cornell_small")
    yml = GOLDEN / "cornell_small.yml"
    direct_p = GOLDEN / "cornell_direct.ppm"
    if not yml.exists() or not direct_p.exists():
        pytest.skip("cornell goldens not generated")
    import jax
    sc = load_scene(str(yml))
    canvas = render_scene(sc, dtype=jnp.float64, chunk_pixels=1800,
                          key=jax.random.PRNGKey(11))
    a_lin = np.asarray(canvas)
    ours = construct_ppm(canvas, use_scaling=True)

    def lin(b):
        srgb = _decode(b).astype(np.float64) / 65535.0
        return np.where(srgb <= 0.04045, srgb / 12.92,
                        ((srgb + 0.055) / 1.055) ** 2.4)

    g_lin = lin(golden)
    d = np.abs(lin(ours) - g_lin)
    assert d.mean() < 0.065, d.mean()
    gd = lin(direct_p.read_bytes())
    gi_ours = (a_lin - gd).sum()
    gi_ref = (g_lin - gd).sum()
    assert abs(gi_ours / gi_ref - 1.0) < 0.05, (gi_ours, gi_ref)


@pytest.mark.slow
def test_water_bitwise():
    """cornell_box_water at 150x120, GI off: a CLUSTERED 7.1k-triangle
    refractive mesh (water Ni 1.5 / glass Ni 2.5) — the containers n1/n2
    walk runs over clustered-mesh hits via mesh_containers (line-mode
    cluster fold, negative t included) merged with the dense-table walk.
    NOTE the reference binary itself segfaults on this scene as shipped:
    the OBJ has CRLF line endings and fan_triangulation
    (obj_loader.c:262-316) parses the trailing '\\r\\n' token as vertex
    0 -> OOB read; make_goldens.sh normalizes the line endings in the
    writable copy for both renderers."""
    golden = _golden("water_small")
    yml = GOLDEN / "water_small.yml"
    if not yml.exists():
        pytest.skip("water_small.yml not generated")
    ours = _render_ppm(yml, chunk_pixels=9000)
    assert ours == golden


@pytest.mark.slow
def test_water_caustic_statistical():
    """cornell_box_water at 100x80 with the caustic photon map on (10k
    photons refracted through the water surface; photon pass exercises
    refraction containers over the clustered mesh). Photon emission/RR
    are stochastic -> statistical parity on the direct term + caustic
    energy."""
    golden = _golden("water_caustic_small")
    yml = GOLDEN / "water_caustic_small.yml"
    if not yml.exists():
        pytest.skip("water_caustic_small.yml not generated")
    import jax
    sc = load_scene(str(yml))
    canvas = render_scene(sc, dtype=jnp.float64, chunk_pixels=8000,
                          key=jax.random.PRNGKey(3))
    ours = construct_ppm(canvas, use_scaling=True)
    a = _decode(ours).astype(np.float64) / 65535.0
    g = _decode(golden).astype(np.float64) / 65535.0
    d = np.abs(a - g)
    # caustics concentrate in few pixels; compare mean + overall energy
    assert d.mean() < 0.02, d.mean()
    assert abs(a.sum() / g.sum() - 1.0) < 0.05, (a.sum(), g.sum())


@pytest.mark.slow
def test_bounding_boxes_reduced_bitwise():
    """bounding_boxes at 150x60: 141k instanced dragon triangles through
    the clustered-mesh path (closest hit + early-exit shadows + Ni=1
    refraction + 4 lights). Full-res parity was verified once manually
    (300x120: 7 silhouette pixels differ from FP tie-breaks in the
    pre-composed transforms; 150x60: byte-identical)."""
    golden = _golden("bbox_tiny")
    yml = GOLDEN / "bbox_tiny.yml"
    if not yml.exists():
        pytest.skip("bbox_tiny.yml not generated")
    ours = _render_ppm(yml, chunk_pixels=4500)
    assert ours == golden


def test_csg_obj_bitwise():
    """CSG over a triangle mesh: difference(obj teapot_low, sphere) — the
    reference accepts any shape as a csg child (src/shapes/csg.c:166-206);
    mesh leaves participate in the truth-table filter and the csg shadow
    truncation like any other leaf."""
    golden = _golden("csg_obj_test")
    yml = GOLDEN / "csg_obj_test.yml"
    if not yml.exists():
        pytest.skip("csg_obj_test.yml not generated")
    ours = _render_ppm(yml, chunk_pixels=10000)
    assert ours == golden


def test_csg_deep_tree_40_nodes():
    """CSG trees with >31 internal nodes compile and render (masks are
    Python ints resolved to static tables — no i32 bitmask cap). A chain
    union of 40 spheres along x must render each sphere visible."""
    from fast_ray_tracer_tpu.scene.model import (
        ApertureDesc, CameraDesc, ConfigDesc, LightDesc, MaterialDesc,
        SceneDesc, ShapeDesc,
    )
    from fast_ray_tracer_tpu.render.render import render_scene

    mat = MaterialDesc(color=(0.8, 0.2, 0.2), specular=0.0)
    spheres = [ShapeDesc(kind="sphere", material=mat,
                         transform=([["translate", 2.5 * i, 0.0, 0.0]]
                                    if i else []))
               for i in range(41)]
    cam = CameraDesc(width=64, height=8, field_of_view=1.2,
                     frm=(50.0, 0.0, -90.0), to=(50.0, 0.0, 0.0),
                     up=(0.0, 1.0, 0.0), aperture=ApertureDesc())
    light = LightDesc(kind="point", at=(50.0, 40.0, -60.0))
    node = spheres[0]
    for i in range(1, 41):
        node = ShapeDesc(kind="csg", op="union", left=node,
                         right=spheres[i])
    img_csg = render_scene(
        SceneDesc(camera=cam, lights=[light], world=[node],
                  config=ConfigDesc()), dtype=jnp.float64, chunk_pixels=512)
    # the union of disjoint spheres must render exactly like the plain
    # group of the same spheres (a filter bug on node ids > 31 would
    # blank the late spheres in the chain)
    img_group = render_scene(
        SceneDesc(camera=cam, lights=[light], world=spheres,
                  config=ConfigDesc()), dtype=jnp.float64, chunk_pixels=512)
    assert np.isfinite(img_csg).all()
    lit = np.unique(np.nonzero(img_csg.max(axis=-1) > 0.02)[1])
    assert len(lit) >= 10, len(lit)
    np.testing.assert_array_equal(img_csg, img_group)
