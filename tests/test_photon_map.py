"""Photon-map irradiance estimate vs a brute-force oracle.

The production estimate (render/photon._irradiance_block) finds the
kth-nearest distance by bisection-counting over a cached candidate table
instead of sorting; this pins it, bit-for-bit in f64, to the reference
pm_irradiance_estimate semantics (pm.c:91-156): strict d2 < max_dist^2
in-range test, found capped at num, r^2 = kth-nearest d2 when the heap
fills else max_dist^2, cone-filter weight 1 - d/(k*r_max), >= 8 photons
required, photons arriving from behind the `normal` (eyev) rejected."""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_ray_tracer_tpu.render.photon import (
    build_photon_map, irradiance_estimate,
)


@pytest.mark.parametrize("layout", ["flat", "capped"])
@pytest.mark.parametrize("concentrate", [False, True],
                         ids=["sparse", "oversubscribed"])
def test_irradiance_estimate_oracle(concentrate, layout):
    rng = np.random.default_rng(3)
    N = 5000
    pos = rng.uniform(-1, 1, (N, 3))
    if concentrate:
        pos[:, 2] *= 0.05          # dense slab: n_in_range > num everywhere
    power = rng.uniform(0, 1, (N, 3))
    dirs = rng.normal(size=(N, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radius, num, cone_k = 0.25, 64, 1.0
    pm = build_photon_map(pos, power, dirs, radius, jnp.float64,
                      layout=layout)
    Q = 200
    pts = rng.uniform(-1, 1, (Q, 3))
    if concentrate:
        pts[:, 2] *= 0.05
    eye = rng.normal(size=(Q, 3))
    eye /= np.linalg.norm(eye, axis=1, keepdims=True)
    irr, found = irradiance_estimate(pm, jnp.asarray(pts),
                                     jnp.asarray(eye), num, radius, cone_k)
    irr, found = np.asarray(irr), np.asarray(found)

    md2 = radius * radius
    for q in range(Q):
        d2 = ((pos - pts[q]) ** 2).sum(1)
        inr = d2 < md2
        n = int(inr.sum())
        f = min(n, num)
        sel = sorted(np.nonzero(inr)[0], key=lambda i: d2[i])[:num]
        r2 = d2[sel[-1]] if n >= num else md2
        s = np.zeros(3)
        for i in sel:
            if dirs[i] @ eye[q] < 0:
                s += power[i] * (1 - np.sqrt(d2[i]) / (cone_k * radius))
        s /= (1 - 2 / (3 * cone_k)) * np.pi * r2
        if f < 8:
            s = np.zeros(3)
        assert found[q] == f
        np.testing.assert_allclose(irr[q], s, rtol=1e-9, atol=1e-12)
