"""Color-space conversions, vectorized over (..., 3) arrays.

Matches the reference's formulas exactly (src/color/{rgb,srgb,xyz,lab}.c):
sRGB gamma encode/decode with the 0.0031308/0.04045 thresholds, the
rgb<->XYZ matrices from the same sources, and the CIE-Lab conversion used to
apportion photons among lights. The reference's hsl_to_rgb is an empty stub
(src/color/hsl.c:3-6, it leaves the output untouched == copies nothing), and
xyy_to_rgb is a plain copy (src/color/xyy.c:5-9); we implement both as copies
so YAML `color-space: HSL/XYY` behaves identically (garbage-in preserved).
"""

from __future__ import annotations

import jax.numpy as jnp

RGB_TO_XYZ = [
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
]

XYZ_TO_RGB = [
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875992, 0.041556],
    [0.055648, -0.204043, 1.057311],
]

# D65-ish tristimulus used by the reference's Lab conversion
# (src/color/color.c `tristimulus`).
TRISTIMULUS = [0.95047, 1.0, 1.08883]


def srgb_to_rgb(srgb):
    """sRGB electro-optical decode (reference: src/color/srgb.c:17-27)."""
    srgb = jnp.asarray(srgb)
    return jnp.where(srgb <= 0.04045, srgb / 12.92, ((srgb + 0.055) / 1.055) ** 2.4)


def rgb_to_srgb(rgb):
    """Linear->sRGB encode (reference: src/color/rgb.c:69-77).

    Note: negative inputs hit the `< 0.0031308` branch and stay linear*12.92,
    exactly like the C code (pow of a negative would be NaN there too).
    """
    rgb = jnp.asarray(rgb)
    safe = jnp.where(rgb >= 0.0031308, rgb, 1.0)
    return jnp.where(rgb < 0.0031308, rgb * 12.92, 1.055 * safe ** (1.0 / 2.4) - 0.055)


def rgb_to_xyz(rgb):
    m = jnp.asarray(RGB_TO_XYZ, dtype=jnp.asarray(rgb).dtype)
    return rgb @ m.T


def xyz_to_rgb(xyz):
    m = jnp.asarray(XYZ_TO_RGB, dtype=jnp.asarray(xyz).dtype)
    return xyz @ m.T


def xyz_to_lab(xyz):
    """reference: src/color/srgb.c xyz_to_lab (identical thresholds)."""
    xyz = jnp.asarray(xyz)
    tri = jnp.asarray(TRISTIMULUS, dtype=xyz.dtype)
    n = xyz / tri
    f = jnp.where(n > 0.008856, jnp.cbrt(jnp.abs(n)), 7.787 * n + 16.0 / 116.0)
    ny = n[..., 1]
    l = jnp.where(ny > 0.008856, 116.0 * jnp.cbrt(jnp.abs(ny)) - 16.0, 903.3 * ny)
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def lab_to_xyz(lab):
    lab = jnp.asarray(lab)
    tri = jnp.asarray(TRISTIMULUS, dtype=lab.dtype)
    p = (lab[..., 0] + 16.0) / 116.0
    return jnp.stack([
        tri[0] * (p + lab[..., 1] / 500.0) ** 3,
        tri[1] * p ** 3,
        tri[2] * (p - lab[..., 2] / 200.0) ** 3,
    ], axis=-1)


def rgb_to_lab(rgb):
    return xyz_to_lab(rgb_to_xyz(rgb))


def lab_to_rgb(lab):
    return xyz_to_rgb(lab_to_xyz(lab))


def identity(c):
    return jnp.asarray(c)


# Input decode functions keyed by the YAML `color-space` config value: the
# scene compiler runs `color_space_fn` over material/pattern colors and Ka/Kd
# textures on *input* (yaml_parser/config.py:72-99). SRGB maps to srgb_to_rgb;
# HSL's hsl_to_rgb is an empty stub in C — colors pass through unchanged;
# XYY is an explicit copy.
INPUT_DECODE = {
    "SRGB": srgb_to_rgb,
    "RGB": identity,
    "HSL": identity,
    "XYZ": xyz_to_rgb,
    "XYY": identity,
    "LAB": lab_to_rgb,
}
