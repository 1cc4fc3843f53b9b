"""Every scene the reference ships must load and render.

"Complete" means a user of the reference can point this framework at any
of its scene files and get an image — this suite smoke-renders ALL of
them at thumbnail resolution (goldens cover pixel parity elsewhere).

Documented exceptions (defects in the reference's own repository, where
the reference binary itself cannot render the scene as shipped):
  * sibenik: scenes/sibenik/sibenik.obj was never committed upstream
    (only the .mtl and textures).
  * orrery: scenes/orrery/artist_workshop_16k.png (and its 2k normal
    map) were never committed; the reference's generated main `access()`
    check exits on the missing file (yaml_parser/pattern.py:267-270).
    The orrery_small reduced golden substitutes committed textures and
    passes BITWISE, so the orrery code paths are fully covered.
  * template: the config-surface documentation file; it has a camera but
    no light/shape entries, which the reference's generated main would
    still compile — we render it to a black frame the same way.

cornell_box_water is notable: the reference binary itself cannot render
it as shipped (CRLF OBJ segfault + mtllib resolved against CWD only —
see tools/make_goldens.sh); our loader tolerates CRLF and falls back to
the OBJ's directory for mtllib, so it renders here from the pristine
read-only checkout.
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import REFERENCE

from fast_ray_tracer_tpu.render.render import render_scene
from fast_ray_tracer_tpu.scene.model import replace
from fast_ray_tracer_tpu.scene.yaml_loader import load_scene

SCENES = sorted(p for p in REFERENCE.glob("scenes/*/*.yml"))


MISSING_UPSTREAM_ASSETS = {
    "sibenik": "sibenik.obj never committed to the reference repo",
    "orrery": "artist_workshop_16k.png never committed to the "
              "reference repo (orrery_small golden substitutes "
              "committed textures and passes bitwise)",
}


@pytest.mark.slow
@pytest.mark.parametrize("yml", SCENES, ids=[p.stem for p in SCENES])
def test_scene_renders(yml):
    name = yml.parent.name
    if name in MISSING_UPSTREAM_ASSETS:
        with pytest.raises(FileNotFoundError):
            sc = load_scene(str(yml))
            sc.camera = replace(sc.camera, width=48, height=32,
                                usteps=1, vsteps=1)
            render_scene(sc, dtype=jnp.float32, chunk_pixels=1536)
        pytest.xfail(MISSING_UPSTREAM_ASSETS[name])
    sc = load_scene(str(yml))
    sc.camera = replace(sc.camera, width=48, height=32, usteps=1, vsteps=1)
    if sc.config.photon_count > 2000:
        sc.config = replace(sc.config, photon_count=2000)
    canvas = render_scene(sc, dtype=jnp.float32, chunk_pixels=1536)
    assert canvas.shape == (32, 48, 3)
    assert np.isfinite(canvas).all()
