"""Checkpoint/resume: render-chunk snapshots and orbax train state.

New capability vs the reference, which has no checkpointing (SURVEY.md §5:
a killed render loses everything, canvas.c:303-327).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tests.conftest import GOLDEN  # noqa: F401  (conftest env setup)

from fast_ray_tracer_tpu.parallel.checkpoint import (
    load_render_progress, restore_train_state, save_render_progress,
    save_train_state,
)
from fast_ray_tracer_tpu.parallel.train import TrainState
from fast_ray_tracer_tpu.render.render import render_scene
from fast_ray_tracer_tpu.scene.demo import glass_spheres


def test_render_resume_is_identical(tmp_path):
    """A render resumed from a mid-run snapshot matches an uninterrupted
    render exactly (chunks are deterministic in (key, chunk index))."""
    scene = glass_spheres(32, 16)
    truth = render_scene(scene, dtype=jnp.float64, chunk_pixels=128)

    ckpt = str(tmp_path / "render.ckpt")
    full = render_scene(scene, dtype=jnp.float64, chunk_pixels=128,
                        checkpoint_path=ckpt, checkpoint_every=1)
    np.testing.assert_array_equal(full, truth)

    snap = load_render_progress(ckpt)
    assert snap is not None and snap["chunks_done"] == snap["total_chunks"]

    # rewind the snapshot to 1 completed chunk, scrub the rest of the
    # canvas, and resume
    canvas = snap["canvas"].copy()
    canvas[128:] = -1.0
    save_render_progress(ckpt, canvas, 1, snap["total_chunks"], None)
    resumed = render_scene(scene, dtype=jnp.float64, chunk_pixels=128,
                           checkpoint_path=ckpt, checkpoint_every=1)
    np.testing.assert_array_equal(resumed, truth)


def test_train_state_roundtrip(tmp_path):
    params = {"mat_Kd": jnp.asarray(np.random.default_rng(0)
                                    .standard_normal((4, 3)))}
    opt = optax.adam(1e-2)
    state = TrainState(params, opt.init(params))
    key = jax.random.PRNGKey(42)

    d = str(tmp_path / "ckpt")
    save_train_state(d, 7, state, key=key, wait=True)
    out = restore_train_state(d, state, key=key)
    assert out is not None
    step, restored, rkey = out
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored.params["mat_Kd"]),
                                  np.asarray(params["mat_Kd"]))
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rkey)),
                                  np.asarray(jax.random.key_data(key)))
    assert restore_train_state(str(tmp_path / "nope"), state) is None
