"""Pallas mesh-intersector parity vs the jnp gather-fold.

Runs the Pallas kernels in interpreter mode on the CPU test backend
(FRT_MESH_PALLAS=interpret) against intersect.mesh_closest /
mesh_shadow_reduce on a synthetic Morton-free random clustered soup.
Both paths implement the identical Möller-Trumbore predicate chain
(src/shapes/triangle.c:10-44) in f32, so t values agree to float
round-off and hit indices agree wherever the winning t is unique."""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_ray_tracer_tpu.ops import intersect, mesh_pallas
from fast_ray_tracer_tpu.scene.ir import SceneIR, SceneMeta

C = 64
NC = 10          # 10 clusters -> 5 superclusters, 640 triangles
NT = NC * C


def _soup(seed=0):
    """Random triangles grouped into NC spatially-coherent clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, (NC, 1, 3))
    base = centers + rng.normal(0, 0.4, (NC, C, 3))
    p1 = base.reshape(NT, 3).astype(np.float32)
    e1 = rng.normal(0, 0.5, (NT, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (NT, 3)).astype(np.float32)
    v = np.stack([p1, p1 + e1, p1 + e2], 1)           # (NT,3,3)
    cmin = v.reshape(NC, C * 3, 3).min(1)
    cmax = v.reshape(NC, C * 3, 3).max(1)
    meta = SceneMeta(n_triangles=NT, use_clusters=True, n_clusters=NC,
                     cluster_size=C)
    ir = SceneIR(meta=meta, tri_p1=jnp.asarray(p1), tri_e1=jnp.asarray(e1),
                 tri_e2=jnp.asarray(e2), cluster_min=jnp.asarray(cmin),
                 cluster_max=jnp.asarray(cmax))
    return ir


def _rays(seed=1, n=97):
    """Random rays aimed at the soup + a few parked dead lanes."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o[-3:] = mesh_pallas._BIG                          # dead lanes
    d[-3:] = 1.0
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("FRT_MESH_PALLAS", "interpret")


@pytest.fixture
def force_jnp(monkeypatch):
    monkeypatch.setenv("FRT_MESH_PALLAS", "0")


def _both(monkeypatch, fn):
    monkeypatch.setenv("FRT_MESH_PALLAS", "0")
    ref = fn()
    monkeypatch.setenv("FRT_MESH_PALLAS", "interpret")
    assert mesh_pallas._mode() == "interpret"
    got = fn()
    return ref, got


def test_closest_parity(monkeypatch):
    ir = _soup()
    o, d = _rays()
    (t_ref, i_ref), (t_got, i_got) = _both(
        monkeypatch, lambda: intersect.mesh_closest(ir, o, d))
    t_ref, i_ref, t_got, i_got = map(np.asarray,
                                     (t_ref, i_ref, t_got, i_got))
    assert (np.isfinite(t_ref) == np.isfinite(t_got)).all()
    hit = np.isfinite(t_ref)
    assert hit.sum() > 20, "fixture should produce plenty of hits"
    np.testing.assert_allclose(t_got[hit], t_ref[hit], rtol=1e-6)
    # indices agree except where two triangles tie on t
    diff = hit & (i_ref != i_got)
    if diff.any():
        np.testing.assert_allclose(t_ref[diff], t_got[diff], rtol=1e-6)


def test_closest_keep_parity(monkeypatch):
    ir = _soup(seed=3)
    o, d = _rays(seed=4)
    keep = jnp.asarray(np.random.default_rng(5).random(NT) < 0.5)
    (t_ref, i_ref), (t_got, i_got) = _both(
        monkeypatch, lambda: intersect.mesh_closest(ir, o, d, keep=keep))
    t_ref, t_got = np.asarray(t_ref), np.asarray(t_got)
    assert (np.isfinite(t_ref) == np.isfinite(t_got)).all()
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(t_got[hit], t_ref[hit], rtol=1e-6)
    kept = np.asarray(keep)[np.asarray(i_got)[hit]]
    assert kept.all(), "keep filter must hold on the pallas winners"


def test_shadow_parity(monkeypatch):
    ir = _soup(seed=7)
    o, d = _rays(seed=8)
    rng = np.random.default_rng(9)
    # ranks constant per cluster half (leaf-like), casting flags random
    tri_rank = jnp.asarray(
        np.repeat(rng.permutation(NC * 2) * 100, C // 2).astype(np.int32))
    tri_shadow = jnp.asarray(rng.random(NT) < 0.7)
    (r_ref, t_ref), (r_got, t_got) = _both(
        monkeypatch,
        lambda: intersect.mesh_shadow_reduce(ir, tri_rank, tri_shadow, o, d))
    r_ref, t_ref, r_got, t_got = map(np.asarray,
                                     (r_ref, t_ref, r_got, t_got))
    np.testing.assert_array_equal(r_got, r_ref)
    fin = np.isfinite(t_ref)
    assert (np.isfinite(t_got) == fin).all()
    np.testing.assert_allclose(t_got[fin], t_ref[fin], rtol=1e-6)


def test_vmem_budget_fallback(monkeypatch):
    """Soups beyond the VMEM budget stay enabled (the STREAMING kernel
    takes over — no size cliff); only the SMEM-shortlist cap (~2.1M
    tris) or a non-f32 dtype fall back to the jnp fold."""
    monkeypatch.setenv("FRT_MESH_PALLAS", "interpret")
    ir = _soup()
    over_vmem = SceneMeta(n_triangles=1 << 20, use_clusters=True,
                          n_clusters=(1 << 20) // C, cluster_size=C)
    huge = SceneMeta(n_triangles=1 << 22, use_clusters=True,
                     n_clusters=(1 << 22) // C, cluster_size=C)
    assert mesh_pallas.enabled(ir, jnp.float32, aux_planes=1)
    assert mesh_pallas._resident_fits(ir, 1)
    assert mesh_pallas.enabled(
        SceneIR(meta=over_vmem), jnp.float32, aux_planes=1)
    assert not mesh_pallas._resident_fits(SceneIR(meta=over_vmem), 1)
    assert not mesh_pallas.enabled(
        SceneIR(meta=huge), jnp.float32, aux_planes=1)
    assert not mesh_pallas.enabled(ir, jnp.float64, aux_planes=1)


@pytest.fixture
def force_streaming(monkeypatch):
    """Tiny VMEM budget: the fixture soup must take the streaming
    (DMA-ring) kernel instead of the resident one."""
    monkeypatch.setenv("FRT_MESH_PALLAS_VMEM", "1024")
    yield
    monkeypatch.delenv("FRT_MESH_PALLAS_VMEM", raising=False)


def test_streaming_closest_parity(monkeypatch, force_streaming):
    ir = _soup()
    assert not mesh_pallas._resident_fits(ir, 0)
    o, d = _rays()
    (t_ref, i_ref), (t_got, i_got) = _both(
        monkeypatch, lambda: intersect.mesh_closest(ir, o, d))
    t_ref, i_ref, t_got, i_got = map(np.asarray,
                                     (t_ref, i_ref, t_got, i_got))
    assert (np.isfinite(t_ref) == np.isfinite(t_got)).all()
    hit = np.isfinite(t_ref)
    assert hit.sum() > 20
    np.testing.assert_allclose(t_got[hit], t_ref[hit], rtol=1e-6)
    diff = hit & (i_ref != i_got)
    if diff.any():
        np.testing.assert_allclose(t_ref[diff], t_got[diff], rtol=1e-6)


def test_streaming_closest_keep_parity(monkeypatch, force_streaming):
    ir = _soup(seed=3)
    o, d = _rays(seed=4)
    keep = jnp.asarray(np.random.default_rng(5).random(NT) < 0.5)
    (t_ref, i_ref), (t_got, i_got) = _both(
        monkeypatch, lambda: intersect.mesh_closest(ir, o, d, keep=keep))
    t_ref, t_got = np.asarray(t_ref), np.asarray(t_got)
    assert (np.isfinite(t_ref) == np.isfinite(t_got)).all()
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(t_got[hit], t_ref[hit], rtol=1e-6)
    kept = np.asarray(keep)[np.asarray(i_got)[hit]]
    assert kept.all()


def test_streaming_shadow_parity(monkeypatch, force_streaming):
    ir = _soup(seed=7)
    o, d = _rays(seed=8)
    rng = np.random.default_rng(9)
    tri_rank = jnp.asarray(
        np.repeat(rng.permutation(NC * 2) * 100, C // 2).astype(np.int32))
    tri_shadow = jnp.asarray(rng.random(NT) < 0.7)
    (r_ref, t_ref), (r_got, t_got) = _both(
        monkeypatch,
        lambda: intersect.mesh_shadow_reduce(ir, tri_rank, tri_shadow, o, d))
    r_ref, t_ref, r_got, t_got = map(np.asarray,
                                     (r_ref, t_ref, r_got, t_got))
    np.testing.assert_array_equal(r_got, r_ref)
    fin = np.isfinite(t_ref)
    assert (np.isfinite(t_got) == fin).all()
    np.testing.assert_allclose(t_got[fin], t_ref[fin], rtol=1e-6)
