"""Canvas input/output: 16-bit binary PPM (P6) and 48-bit PNG.

Host-side numpy implementations that reproduce the reference encoder
bit-for-bit (src/libs/canvas/canvas.c):

* construct_ppm (canvas.c:150-301): two analysis passes compute per-channel
  `rgb_max` over the raw canvas and `srgb_max` over srgb(canvas/rgb_max);
  the encode pass then either L1-clamps each pixel to sqrt(3) (use_scaling)
  or clamps channels to [0,1], sRGB-encodes, and quantizes with
  floor(srgb * 65535/srgb_max), saturating to 65535 above srgb_max.
* write_png (canvas.c:374-529): clamp to [0,1], sRGB-encode,
  floor(srgb * 65535), big-endian 16-bit RGB.
* read_png / read_ppm mirror the loaders (canvas.c:329-366, 531-672):
  values normalized to [0,1]; the reference stores the canvas raw and applies
  its color_space_fn at *read* time (canvas_pixel_at, canvas.c:114-148) —
  callers here pass `decode` to pre-apply it, valid because texture canvases
  are loaded with super_sample=false.
"""

from __future__ import annotations

import numpy as np

from fast_ray_tracer_tpu.constants import SQRT3


def _rgb_to_srgb(rgb: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        return np.where(rgb < 0.0031308, rgb * 12.92,
                        1.055 * np.power(np.maximum(rgb, 0.0), 1.0 / 2.4) - 0.055)


def _srgb_to_rgb(srgb: np.ndarray) -> np.ndarray:
    return np.where(srgb <= 0.04045, srgb / 12.92,
                    np.power((srgb + 0.055) / 1.055, 2.4))


def construct_ppm(canvas: np.ndarray, use_scaling: bool = True) -> bytes:
    """Encode an (H, W, 3) float canvas to 16-bit binary P6 bytes."""
    c = np.asarray(canvas, dtype=np.float64)
    h, w = c.shape[:2]
    header = f"P6\n{w} {h}\n65535\n".encode()

    rgb_max = c.reshape(-1, 3).max(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        normalized = c / rgb_max
    srgb_max = np.nanmax(_rgb_to_srgb(normalized).reshape(-1, 3), axis=0)
    inverse = 65535.0 / srgb_max

    px = c.copy()
    if use_scaling:
        l1 = px.sum(axis=-1, keepdims=True)
        scale = np.where(l1 > SQRT3, SQRT3 / np.where(l1 == 0.0, 1.0, l1), 1.0)
        px = px * scale
    else:
        px = np.clip(px, 0.0, 1.0)
    srgb = _rgb_to_srgb(px)

    scaled = np.floor(srgb * inverse)
    scaled = np.where(srgb > srgb_max, 65535.0, scaled)
    scaled = np.where(srgb < 0.0, 0.0, scaled)
    data = scaled.astype(np.uint16).astype(">u2").tobytes()
    return header + data + b"\n"


def write_ppm(canvas, path: str, use_scaling: bool = True) -> None:
    """Write `<path>.ppm` like the reference's write_ppm_file (canvas.c:303)."""
    with open(str(path) + ".ppm", "wb") as f:
        f.write(construct_ppm(np.asarray(canvas), use_scaling))


def write_png(canvas, path: str) -> None:
    """Write `<path>.png` as 48-bit RGB, matching write_png (canvas.c:374)."""
    c = np.clip(np.asarray(canvas, dtype=np.float64), 0.0, 1.0)
    srgb = _rgb_to_srgb(c)
    q = np.minimum(np.floor(srgb * 65535.0), 65535.0).astype(np.uint16)
    _write_png16(q, str(path) + ".png")


def _write_png16(rgb16: np.ndarray, path: str) -> None:
    """Minimal 16-bit RGB PNG writer (zlib + struct, no external deps)."""
    import struct
    import zlib

    h, w = rgb16.shape[:2]
    raw = rgb16.astype(">u2").tobytes()
    stride = w * 6
    scanlines = b"".join(
        b"\x00" + raw[y * stride:(y + 1) * stride] for y in range(h)
    )

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", ihdr)
           + chunk(b"sRGB", b"\x03")
           + chunk(b"IDAT", zlib.compress(scanlines, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str, decode=None) -> np.ndarray:
    """Load a PNG to (H, W, 3) float64 in [0,1]; `decode` pre-applies the
    canvas color_space_fn (valid for super_sample=false canvases).

    16-bit-per-channel RGB (what write_png emits) is parsed natively —
    Pillow silently truncates RGB;16B to 8 bits."""
    from PIL import Image

    with open(path, "rb") as f:
        head = f.read(33)
    if len(head) >= 26 and head[:8] == b"\x89PNG\r\n\x1a\n" and \
            head[24] == 16 and head[25] == 2:
        c = _read_png16_rgb(path)
        return decode(c) if decode is not None else c

    img = Image.open(path)
    if img.mode in ("P", "PA"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        c = arr.astype(np.float64) / 255.0
    elif arr.dtype in (np.uint16, np.dtype(">u2")):
        c = arr.astype(np.float64) / 65535.0
    else:
        c = arr.astype(np.float64)
    if c.ndim == 2:
        c = np.stack([c] * 3, axis=-1)
    if c.shape[-1] == 4 or c.shape[-1] == 2:
        c = c[..., :3] if c.shape[-1] == 4 else np.repeat(c[..., :1], 3, -1)
    if decode is not None:
        c = decode(c)
    return c


def _read_png16_rgb(path: str) -> np.ndarray:
    """Decode a non-interlaced 16-bit RGB PNG (all five filter types)."""
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 16 or ctype != 2 or interlace != 0:
                raise ValueError("not a plain 16-bit RGB PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    bpp = 6
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw[off + 1:off + 1 + stride], np.uint8).copy()
        off += 1 + stride
        if ftype == 0:
            rec = line
        elif ftype == 2:    # up
            rec = (line.astype(np.int32) + prev) % 256
        else:               # sub/average/paeth need sequential recon
            rec = np.zeros(stride, np.int32)
            li = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = pv[i]
                c = pv[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                rec[i] = (li[i] + pred) % 256
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    arr = out.reshape(h, w, 3, 2)
    vals = arr[..., 0].astype(np.uint16) * 256 + arr[..., 1]
    return vals.astype(np.float64) / 65535.0


def read_ppm(path: str, decode=None) -> np.ndarray:
    """Read the reference's ASCII-numbered 'P6' PPM variant
    (construct_canvas_from_ppm_file, canvas.c:329-366: fscanf %u over
    whitespace-separated values), and standard binary P6 as a convenience."""
    with open(path, "rb") as f:
        data = f.read()
    parts = data.split(None, 4)
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    rest = parts[4] if len(parts) > 4 else b""
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"unsupported PPM magic {magic!r} in {path}")
    tokens = rest.split()
    if magic == b"P3" or (len(tokens) >= w * h * 3 and all(t.isdigit() for t in tokens[:12])):
        vals = np.array(tokens[: w * h * 3], dtype=np.float64)
    else:
        if maxval > 255:
            vals = np.frombuffer(rest[: w * h * 6], dtype=">u2").astype(np.float64)
        else:
            vals = np.frombuffer(rest[: w * h * 3], dtype=np.uint8).astype(np.float64)
    c = (vals / float(maxval)).reshape(h, w, 3)
    if decode is not None:
        c = decode(c)
    return c
