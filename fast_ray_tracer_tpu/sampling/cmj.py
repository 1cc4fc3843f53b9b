"""Correlated multi-jittered (CMJ) 2D sampling, stateless.

The reference keeps a mutable sample table regenerated via `reset()`
(src/libs/sampler/sampler.c:414-469): a canonical CMJ arrangement

    arr[j*m+i].x = (i + (j + xi)/n) / m      (n = usteps, m = vsteps)
    arr[j*m+i].y = (j + (i + xi)/m) / n

followed by an in-place truncation-indexed swap pass ("shuffle") over rows
for x and columns for y, and indexed reads `get_point((u,v)) ->
arr[v*usteps + u]`. The jitter source is global drand48 or the constant 0.5.

Here the same arrangement is computed as a pure function: deterministic
(jitter=False -> xi = 0.5 everywhere, byte-identical to the C output) or
keyed (jitter=True -> xi from jax.random, statistically identical to the
drand48 stream). Note the C code's index-convention quirk: the canonical pass
fills the flat array with stride m=vsteps while get_point reads with stride
usteps; we reproduce the flat-array layout literally so non-square sample
grids match the reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def cmj_points_static(usteps: int, vsteps: int) -> np.ndarray:
    """Deterministic (jitter=False) CMJ table; returns (usteps*vsteps, 2).

    Row s corresponds to sample index s = v*usteps + u, matching the C
    `get_point` read order. Computed in float64 on host.
    """
    count = usteps * vsteps
    x = np.zeros(count)
    y = np.zeros(count)
    n, m = usteps, vsteps
    xi = 0.5
    for j in range(n):
        for i in range(m):
            idx = j * m + i
            x[idx] = (i + (j + xi) / n) / m
            y[idx] = (j + (i + xi) / m) / n
    # shuffle: note swapped roles (m=usteps, n=vsteps), as in the C source.
    m2, n2 = usteps, vsteps
    for j in range(n2):
        k = int(j + xi * (n2 - j))
        for i in range(m2):
            a, b = j * m2 + i, k * m2 + i
            x[a], x[b] = x[b], x[a]
    for i in range(m2):
        k = int(i + xi * (m2 - i))
        for j in range(n2):
            a, b = j * m2 + i, j * m2 + k
            y[a], y[b] = y[b], y[a]
    return np.stack([x, y], axis=-1)


def cmj_points(key, usteps: int, vsteps: int, jitter: bool, dtype=jnp.float32):
    """CMJ table as a traced function of `key`; returns (usteps*vsteps, 2).

    jitter=False returns the deterministic table (constant-folded).
    """
    count = usteps * vsteps
    if not jitter:
        return jnp.asarray(cmj_points_static(usteps, vsteps), dtype=dtype)

    n, m = usteps, vsteps
    k_can, k_shufx, k_shufy = jax.random.split(key, 3)
    xi = jax.random.uniform(k_can, (count, 2), dtype=dtype)

    j_idx = jnp.arange(count, dtype=dtype) // m   # canonical row j
    i_idx = jnp.arange(count, dtype=dtype) % m    # canonical col i
    x = (i_idx + (j_idx + xi[:, 0]) / n) / m
    y = (j_idx + (i_idx + xi[:, 1]) / m) / n

    # Truncation-indexed swap passes (a Fisher-Yates over rows/cols).
    m2, n2 = usteps, vsteps
    ks_x = jax.random.uniform(k_shufx, (n2,), dtype=dtype)
    ks_y = jax.random.uniform(k_shufy, (m2,), dtype=dtype)
    x = x.reshape(n2, m2)
    for j in range(n2):
        k = (j + ks_x[j] * (n2 - j)).astype(jnp.int32)
        row_j, row_k = x[j], x[k]
        x = x.at[j].set(row_k)
        x = x.at[k].set(row_j)
    y = y.reshape(n2, m2)
    for i in range(m2):
        k = (i + ks_y[i] * (m2 - i)).astype(jnp.int32)
        col_i, col_k = y[:, i], y[:, k]
        y = y.at[:, i].set(col_k)
        y = y.at[:, k].set(col_i)
    return jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)


def cmj_points_batched(key, R: int, usteps: int, vsteps: int,
                       dtype=jnp.float32):
    """R independent jittered CMJ tables at once: (R, usteps*vsteps, 2).

    Semantically R stacked `cmj_points(key_r, ..., jitter=True)` draws
    (fresh key stream), but built batch-first: a vmap of cmj_points
    lowers each truncation-indexed swap to a per-lane dynamic
    gather/scatter pair — ~40 serialized scatter ops per table draw on
    TPU, which dominated the Cornell direct-lighting phase. Here each
    swap step is a masked-select over the (tiny) row/column axis: pure
    dense vector ops, one static-index update per step."""
    n, m = usteps, vsteps
    count = n * m
    k_can, k_shufx, k_shufy = jax.random.split(key, 3)
    xi = jax.random.uniform(k_can, (R, count, 2), dtype=dtype)

    j_idx = (jnp.arange(count, dtype=dtype) // m)[None]
    i_idx = (jnp.arange(count, dtype=dtype) % m)[None]
    x = (i_idx + (j_idx + xi[..., 0]) / n) / m
    y = (j_idx + (i_idx + xi[..., 1]) / m) / n

    m2, n2 = usteps, vsteps
    ks_x = jax.random.uniform(k_shufx, (R, n2), dtype=dtype)
    ks_y = jax.random.uniform(k_shufy, (R, m2), dtype=dtype)

    x = x.reshape(R, n2, m2)
    rows = jnp.arange(n2)
    for j in range(n2):
        k = (j + ks_x[:, j] * (n2 - j)).astype(jnp.int32)   # (R,) in [j,n2)
        is_k = rows[None] == k[:, None]                     # (R,n2)
        row_j = x[:, j, :]
        row_k = jnp.sum(jnp.where(is_k[:, :, None], x, 0.0), axis=1)
        x = jnp.where(is_k[:, :, None], row_j[:, None, :], x)
        x = x.at[:, j, :].set(row_k)                        # static index
    y = y.reshape(R, n2, m2)
    cols = jnp.arange(m2)
    for i in range(m2):
        k = (i + ks_y[:, i] * (m2 - i)).astype(jnp.int32)
        is_k = cols[None] == k[:, None]                     # (R,m2)
        col_i = y[:, :, i]
        col_k = jnp.sum(jnp.where(is_k[:, None, :], y, 0.0), axis=2)
        y = jnp.where(is_k[:, None, :], col_i[:, :, None], y)
        y = y.at[:, :, i].set(col_k)
    return jnp.stack([x.reshape(R, -1), y.reshape(R, -1)], axis=-1)
