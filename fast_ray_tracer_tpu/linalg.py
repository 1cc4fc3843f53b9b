"""4x4 transform constructors and small vector helpers.

Unlike the reference's row-major double[16] with hand-written cofactor
inverses (src/libs/linalg/linalg.c:305-392), everything here is a jnp array
op so transform parameters stay differentiable end-to-end: a scene compiled
inside a traced function flows gradients from pixels back to the raw
translate/scale/rotate parameters.

Matrices act on column points: ``p' = M @ p`` with points as (x, y, z, 1).
A YAML transform chain [m1, m2, ..., mk] composes as ``M = mk @ ... @ m1``
(the reference applies `transform_chain(tmp, acc) => acc = tmp . acc` per
entry, yaml_parser/transform.py:26-40 + src/libs/linalg/linalg.c:251-257).
"""

from __future__ import annotations

import jax.numpy as jnp


def translation(x, y, z, dtype=None):
    m = jnp.eye(4, dtype=dtype)
    return m.at[0, 3].set(x).at[1, 3].set(y).at[2, 3].set(z)


def scaling(x, y, z, dtype=None):
    m = jnp.eye(4, dtype=dtype)
    return m.at[0, 0].set(x).at[1, 1].set(y).at[2, 2].set(z)


def rotation_x(rad, dtype=None):
    c, s = jnp.cos(rad), jnp.sin(rad)
    m = jnp.eye(4, dtype=dtype)
    return m.at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)


def rotation_y(rad, dtype=None):
    c, s = jnp.cos(rad), jnp.sin(rad)
    m = jnp.eye(4, dtype=dtype)
    return m.at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)


def rotation_z(rad, dtype=None):
    c, s = jnp.cos(rad), jnp.sin(rad)
    m = jnp.eye(4, dtype=dtype)
    return m.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)


def shearing(xy, xz, yx, yz, zx, zy, dtype=None):
    m = jnp.eye(4, dtype=dtype)
    return (
        m.at[0, 1].set(xy).at[0, 2].set(xz)
         .at[1, 0].set(yx).at[1, 2].set(yz)
         .at[2, 0].set(zx).at[2, 1].set(zy)
    )


def compose(transforms):
    """Compose a YAML-order transform list into one matrix (last applied last).

    compose([m1, m2]) == m2 @ m1 — matches the reference chain semantics.
    """
    m = jnp.eye(4, dtype=transforms[0].dtype if transforms else None)
    for t in transforms:
        m = t @ m
    return m


def view_transform(frm, to, up):
    """Look-at world->camera matrix (reference: src/renderer/camera.c:140-167)."""
    frm = jnp.asarray(frm)
    to = jnp.asarray(to)
    up = jnp.asarray(up)
    forward = normalize(to - frm)
    left = jnp.cross(forward, normalize(up))
    true_up = jnp.cross(left, forward)
    orientation = jnp.stack([
        jnp.concatenate([left, jnp.zeros((1,), left.dtype)]),
        jnp.concatenate([true_up, jnp.zeros((1,), left.dtype)]),
        jnp.concatenate([-forward, jnp.zeros((1,), left.dtype)]),
        jnp.array([0.0, 0.0, 0.0, 1.0], left.dtype),
    ])
    return orientation @ translation(-frm[0], -frm[1], -frm[2], dtype=left.dtype)


def inverse(m):
    return jnp.linalg.inv(m)


def normalize(v, axis=-1):
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))


def transform_points(m, pts):
    """Apply a 4x4 to (..., 3) points (w=1)."""
    return pts @ m[:3, :3].T + m[:3, 3]


def transform_vectors(m, vecs):
    """Apply a 4x4 to (..., 3) vectors (w=0)."""
    return vecs @ m[:3, :3].T


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def reflect(v, n):
    """Reflect v about n (reference: src/libs/linalg/linalg.c vector_reflect)."""
    return v - n * (2.0 * dot(v, n, keepdims=True))
