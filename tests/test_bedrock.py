"""Unit tests for math/IO bedrock: transforms, colors, CMJ, PPM."""

import numpy as np
import jax.numpy as jnp

from fast_ray_tracer_tpu import linalg
from fast_ray_tracer_tpu import colors
from fast_ray_tracer_tpu.sampling.cmj import cmj_points_static, cmj_points
from fast_ray_tracer_tpu.io.ppm import construct_ppm, read_ppm, write_png, read_png
from fast_ray_tracer_tpu.scene.compile import compose_chain, transform_matrix


def test_transform_constructors():
    t = np.asarray(linalg.translation(5.0, -3.0, 2.0))
    assert np.allclose(t @ [ -3, 4, 5, 1], [2, 1, 7, 1])
    s = np.asarray(linalg.scaling(2.0, 3.0, 4.0))
    assert np.allclose(s @ [-4, 6, 8, 1], [-8, 18, 32, 1])
    r = np.asarray(linalg.rotation_x(np.pi / 2))
    assert np.allclose(r @ [0, 1, 0, 1], [0, 0, 1, 1], atol=1e-12)
    sh = np.asarray(linalg.shearing(1.0, 0, 0, 0, 0, 0))
    assert np.allclose(sh @ [2, 3, 4, 1], [5, 3, 4, 1])


def test_chain_order_matches_reference():
    # reference semantics: later list entries apply last
    chain = [["rotate-x", np.pi / 2], ["scale", 5, 5, 5],
             ["translate", 10, 5, 7]]
    m = compose_chain(chain)
    p = m @ [1, 0, 1, 1]
    assert np.allclose(p[:3], [15, 0, 7], atol=1e-9)


def test_view_transform_default_orientation():
    m = np.asarray(linalg.view_transform(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, -1.0]),
        jnp.array([0.0, 1.0, 0.0])))
    assert np.allclose(m, np.eye(4), atol=1e-12)


def test_srgb_roundtrip():
    c = np.linspace(0, 1, 64).reshape(-1).repeat(3).reshape(-1, 3)
    rt = np.asarray(colors.rgb_to_srgb(colors.srgb_to_rgb(c)))
    assert np.allclose(rt, c, atol=1e-12)


def test_lab_of_white():
    lab = np.asarray(colors.rgb_to_lab(jnp.array([1.0, 1.0, 1.0])))
    assert abs(lab[0] - 100.0) < 0.5   # L* of white ~ 100


def test_cmj_deterministic_is_centered_for_1x1():
    pts = cmj_points_static(1, 1)
    assert np.allclose(pts, [[0.5, 0.5]])


def test_cmj_static_partitions_unit_square():
    pts = cmj_points_static(4, 4)
    assert pts.shape == (16, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # CMJ property: x and y projections each hit all 16 strata
    assert len(np.unique((pts[:, 0] * 16).astype(int))) == 16
    assert len(np.unique((pts[:, 1] * 16).astype(int))) == 16


def test_cmj_jittered_matches_strata():
    import jax
    pts = np.asarray(cmj_points(jax.random.PRNGKey(7), 4, 4, True,
                                jnp.float64))
    assert pts.shape == (16, 2)
    assert (pts >= 0).all() and (pts <= 1).all()
    assert len(np.unique((pts[:, 0] * 16).clip(0, 15.999).astype(int))) == 16


def test_ppm_header_and_roundtrip(tmp_path):
    canvas = np.random.RandomState(0).rand(7, 5, 3)
    data = construct_ppm(canvas, use_scaling=False)
    assert data.startswith(b"P6\n5 7\n65535\n")
    assert len(data) == len(b"P6\n5 7\n65535\n") + 7 * 5 * 6 + 1
    p = tmp_path / "x.ppm"
    p.write_bytes(data)
    back = read_ppm(str(p))
    srgb = np.asarray(colors.rgb_to_srgb(canvas))
    assert np.allclose(back, srgb, atol=2e-4)  # 16-bit quantization


def test_png_roundtrip(tmp_path):
    canvas = np.random.RandomState(1).rand(6, 4, 3)
    write_png(canvas, str(tmp_path / "t"))
    back = read_png(str(tmp_path / "t.png"))
    srgb = np.asarray(colors.rgb_to_srgb(canvas))
    assert np.allclose(back, srgb, atol=2e-4)


def test_cmj_batched_stratification():
    """cmj_points_batched tables are valid CMJ arrangements: every table
    has exactly one sample in each of the n*m 1-D strata of x AND of y
    (the canonical arrangement + row/column swaps preserve both), all in
    [0,1). Matches the property of per-key cmj_points draws."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fast_ray_tracer_tpu.sampling.cmj import (
        cmj_points, cmj_points_batched,
    )
    R, n, m = 64, 10, 10
    count = n * m
    t = np.asarray(cmj_points_batched(jax.random.PRNGKey(5), R, n, m,
                                      jnp.float32))
    assert t.shape == (R, count, 2)
    assert (t >= 0).all() and (t < 1).all()
    for r in range(R):
        for c in range(2):
            bins = np.floor(t[r, :, c] * count).astype(int)
            assert sorted(bins) == list(range(count)), (r, c)
    # same property holds for the single-key path (sanity anchor)
    s = np.asarray(cmj_points(jax.random.PRNGKey(5), n, m, True,
                              jnp.float32))
    for c in range(2):
        bins = np.floor(s[:, c] * count).astype(int)
        assert sorted(bins) == list(range(count))
