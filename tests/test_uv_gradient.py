"""uv_gradient / uv_radial_gradient parity with the C library.

These two uv-pattern kinds exist in the reference C library
(/root/reference/src/pattern/pattern.c:269-283: both delegate to the
concrete gradient evaluators with point (u, v, 0)) but are unreachable
from the reference's own YAML frontend (yaml_parser/pattern.py has no
case for them). We expose them through our frontend and check the
evaluator against the C formulas computed in f64 numpy:
  uv_gradient:        a + (b - a) * (u - floor(u))          (pattern.c:141-151)
  uv_radial_gradient: a + (b - a) * (m - floor(m)), m=|u|   (pattern.c:154-167,
                      with pt=(u,v,0) so sqrt(x^2+z^2) = |u|)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_ray_tracer_tpu.scene.compile import compile_scene
from fast_ray_tracer_tpu.scene import yaml_loader


def _scene_with_uv(tmp_path, uv_type):
    yml = tmp_path / f"uv_{uv_type}.yml"
    yml.write_text(f"""
- add: camera
  width: 4
  height: 4
  field-of-view: 1.0
  from: [0, 2, 0]
  to: [0, 0, 0]
  up: [0, 0, 1]
- add: light
  at: [0, 10, 0]
  intensity: [1, 1, 1]
- add: plane
  material:
    pattern:
      type: map
      mapping: planar
      uv_pattern:
        type: {uv_type}
        colors:
          - [0.1, 0.4, 0.9]
          - [0.9, 0.6, 0.2]
""")
    return yaml_loader.load_scene(str(yml))


@pytest.mark.parametrize("uv_type,kind", [
    ("gradient", "uv_gradient"),
    ("radial-gradient", "uv_radial_gradient"),
])
def test_uv_gradient_eval(tmp_path, uv_type, kind):
    from fast_ray_tracer_tpu.ops import patterns
    from fast_ray_tracer_tpu.scene import ir as IR

    scene = _scene_with_uv(tmp_path, uv_type)
    ir = compile_scene(scene, dtype=jnp.float64)

    # the map pattern's face child is the uv pattern row
    typ = {"uv_gradient": IR.PAT_UV_GRADIENT,
           "uv_radial_gradient": IR.PAT_UV_RADIAL_GRADIENT}[kind]
    rows = np.asarray(ir.pat_type)
    (face_pid,) = np.nonzero(rows == typ)[0][:1]

    u = np.array([0.0, 0.25, 0.5, 0.99, 1.3, -0.4, 2.75], dtype=np.float64)
    v = np.linspace(0.0, 1.0, u.size)
    pid = jnp.full(u.shape, int(face_pid), dtype=jnp.int32)
    got = np.asarray(patterns._eval_uv(
        ir, pid, jnp.asarray(u), jnp.asarray(v),
        kinds=set(ir.meta.pattern_kinds)))

    # pattern colors are sRGB-decoded at compile time for the Kd slot;
    # read the decoded endpoints back from the IR and check the gradient
    # arithmetic (pattern.c:141-167) against them.
    a = np.asarray(ir.pat_colors)[face_pid, 0]
    b = np.asarray(ir.pat_colors)[face_pid, 1]
    if kind == "uv_gradient":
        frac = u - np.floor(u)
    else:
        m = np.abs(u)
        frac = m - np.floor(m)
    want = a + (b - a) * frac[:, None]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_uv_gradient_renders(tmp_path):
    """End-to-end: the scene renders without error and the floor shows the
    gradient (non-constant color along u)."""
    import fast_ray_tracer_tpu as frt

    scene = _scene_with_uv(tmp_path, "gradient")
    img = np.asarray(frt.render_scene(scene, dtype=jnp.float64))
    assert img.shape[:2] == (4, 4)
    assert np.isfinite(img).all()
    assert img.std() > 1e-3
