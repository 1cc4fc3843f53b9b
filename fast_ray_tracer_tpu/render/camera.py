"""Camera model and batched primary-ray generation.

Matches src/renderer/camera.c + ray_for_pixel (renderer.c:95-129): the
canvas plane sits at z = -canvas_distance in camera space with
half_view = canvas_distance * tan(fov/2); pixel (px, py) with subpixel
jitter maps to world_x = half_width - (px + jx) * pixel_size (note the
x flip), the ray origin is a point on the aperture disk scaled by
aperture.size, both mapped through the camera's inverse view transform.

Shaped apertures (camera.c:11-90) are rejection samplers over the unit
square; point apertures are the deterministic center. Rejection loops are
bounded (32 tries) with keyed uniforms — statistically identical to the
drand48 loops. Hex/penta/octa enum values fall back to point, like the C
switch (camera.c:193-204).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu.scene.model import ApertureDesc, CameraDesc


class CameraRT(NamedTuple):
    inv: jnp.ndarray          # (4,4) inverse view transform
    pixel_size: float
    half_width: float
    half_height: float
    canvas_distance: float
    aperture_kind: str
    aperture_size: float
    aperture_params: tuple


def view_transform_np(frm, to, up):
    frm = np.asarray(frm, np.float64)
    to = np.asarray(to, np.float64)
    up = np.asarray(up, np.float64)
    forward = to - frm
    forward = forward / np.linalg.norm(forward)
    upn = up / np.linalg.norm(up)
    left = np.cross(forward, upn)
    true_up = np.cross(left, forward)
    orientation = np.eye(4)
    orientation[0, :3] = left
    orientation[1, :3] = true_up
    orientation[2, :3] = -forward
    m = np.eye(4)
    m[:3, 3] = -frm
    return orientation @ m


def build_camera(cam: CameraDesc, dtype=jnp.float32) -> CameraRT:
    half_view = cam.focal_length * math.tan(cam.field_of_view * 0.5)
    aspect = cam.width / cam.height
    if aspect >= 1.0:
        half_width, half_height = half_view, half_view / aspect
    else:
        half_width, half_height = half_view * aspect, half_view
    pixel_size = half_width * 2.0 / cam.width
    inv = np.linalg.inv(view_transform_np(cam.frm, cam.to, cam.up))
    return CameraRT(
        inv=jnp.asarray(inv, dtype), pixel_size=pixel_size,
        half_width=half_width, half_height=half_height,
        canvas_distance=cam.focal_length,
        aperture_kind=cam.aperture.kind, aperture_size=cam.aperture.size,
        aperture_params=cam.aperture.params)


def sample_aperture(rt: CameraRT, n: int, key, dtype):
    """(n, 2) aperture offsets in [-0.5, 0.5]-ish (pre size scaling)."""
    kind = rt.aperture_kind
    if kind in ("POINT_APERTURE", "HEXAGONAL_APERTURE", "PENTAGONAL_APERTURE",
                "OCTAGONAL_APERTURE") or key is None:
        return jnp.zeros((n, 2), dtype)
    if kind == "SQUARE_APERTURE":
        return jax.random.uniform(key, (n, 2), dtype) - 0.5

    tries = 32
    xs = jax.random.uniform(key, (tries, n, 2), dtype)
    u = 2.0 * xs[..., 0] - 1.0
    v = 2.0 * xs[..., 1] - 1.0
    p = rt.aperture_params
    if kind == "CIRCULAR_APERTURE":
        ok = u * u + v * v <= p[0]
    elif kind == "DOUGHNUT_APERTURE":
        mag = u * u + v * v
        ok = (mag <= p[0]) & (mag >= p[1])
    elif kind == "CROSS_APERTURE":
        x1, x2, y1, y2 = p
        ok = ((u > x1) & (u <= x2)) | ((v > y1) & (v <= y2))
    elif kind == "DIAMOND_APERTURE":
        b1, b2, b3, b4 = p
        left = (u <= 0) & (-u + b1 <= v) & (v < u + b2)
        right = (u > 0) & (xs[..., 0] >= 0) & (u + b3 <= v) & (v < -u + b4)
        ok = left | right
    else:
        raise ValueError(f"unknown aperture {kind}")
    # first accepted try per ray (fallback: last sample)
    first = jnp.argmax(ok, axis=0)
    none_ok = ~jnp.any(ok, axis=0)
    idx = jnp.where(none_ok, tries - 1, first)
    sel = jnp.take_along_axis(xs, idx[None, :, None], axis=0)[0]
    return sel - 0.5


def rays_for_pixels(rt: CameraRT, px, py, jitter_uv, aperture_xy):
    """px/py: (n,) pixel indices; jitter_uv: (n,2) subpixel offsets in [0,1);
    aperture_xy: (n,2). Returns (origins (n,3), directions (n,3))."""
    dtype = jitter_uv.dtype
    xoffset = (px.astype(dtype) + jitter_uv[:, 0]) * rt.pixel_size
    yoffset = (py.astype(dtype) + jitter_uv[:, 1]) * rt.pixel_size
    world_x = rt.half_width - xoffset
    world_y = rt.half_height - yoffset
    pix = jnp.stack([world_x, world_y,
                     jnp.full_like(world_x, -rt.canvas_distance)], -1)
    pixel = pix @ rt.inv[:3, :3].T + rt.inv[:3, 3]
    ap = aperture_xy * rt.aperture_size
    origin_cam = jnp.concatenate([ap, jnp.zeros_like(ap[:, :1])], -1)
    origin = origin_cam @ rt.inv[:3, :3].T + rt.inv[:3, 3]
    v = pixel - origin
    direction = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-30)
    return origin, direction
