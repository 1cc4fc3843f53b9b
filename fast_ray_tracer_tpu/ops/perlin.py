"""Integer-hash value noise, bit-compatible with the reference's perlin lib.

(src/libs/perlin/perlin.c, czinn/perlin.) Reproduces the quirks exactly:
int32 wraparound in the hash, truncation toward zero of |coord| in smooth3d
while the fraction is taken against that truncated magnitude (negative
coordinates therefore get out-of-range fractions), cosine interpolation, and
the octave loop that *halves* frequency each octave.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rawnoise(n):
    n = n.astype(jnp.int32)
    n = (n << 13) ^ n
    h = (n * (n * n * 15731 + 789221) + 1376312589) & 0x7FFFFFFF
    return 1.0 - h.astype(jnp.float32).astype(jnp.result_type(float)) / 1073741824.0


def _noise3d(x, y, z, octave, seed):
    return _rawnoise(x * 1919 + y * 31337 + z * 7669
                     + octave * 3463 + seed * 13397)


def _interpolate(a, b, x):
    f = (1.0 - jnp.cos(x * jnp.pi)) * 0.5
    return a * (1.0 - f) + b * f


def _smooth3d(x, y, z, octave, seed):
    ix = jnp.abs(x).astype(jnp.int32)      # (int)(x < 0 ? -x : x)
    iy = jnp.abs(y).astype(jnp.int32)
    iz = jnp.abs(z).astype(jnp.int32)
    fx = x - ix
    fy = y - iy
    fz = z - iz
    one = jnp.int32(1)
    v1 = _noise3d(ix, iy, iz, octave, seed)
    v2 = _noise3d(ix + one, iy, iz, octave, seed)
    v3 = _noise3d(ix, iy + one, iz, octave, seed)
    v4 = _noise3d(ix + one, iy + one, iz, octave, seed)
    v5 = _noise3d(ix, iy, iz + one, octave, seed)
    v6 = _noise3d(ix + one, iy, iz + one, octave, seed)
    v7 = _noise3d(ix, iy + one, iz + one, octave, seed)
    v8 = _noise3d(ix + one, iy + one, iz + one, octave, seed)
    i1 = _interpolate(v1, v2, fx)
    i2 = _interpolate(v3, v4, fx)
    i3 = _interpolate(v5, v6, fx)
    i4 = _interpolate(v7, v8, fx)
    j1 = _interpolate(i1, i2, fy)
    j2 = _interpolate(i3, i4, fy)
    return _interpolate(j1, j2, fz)


def pnoise3d(x, y, z, persistence, frequency, octaves: int, seed):
    """Octave sum; `octaves` must be static (it is a compile-time pattern
    parameter in practice). persistence/frequency/seed may be traced."""
    total = 0.0
    amplitude = 1.0
    freq = frequency
    seed_i = jnp.asarray(seed).astype(jnp.int32)
    for i in range(int(octaves)):
        total = total + _smooth3d(x * freq, y * freq, z * freq,
                                  jnp.int32(i), seed_i) * amplitude
        freq = freq / 2.0
        amplitude = amplitude * persistence
    return total
