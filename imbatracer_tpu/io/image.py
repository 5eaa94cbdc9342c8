"""Image I/O: PNG/TGA via PIL, Radiance HDR (RGBE) hand-parsed.

Mirrors the reference's loader surface (reference: loaders/loaders.h:13-28,
store_png.h:23-74): `load_image` dispatches by extension, `store_png`
applies weight + gamma tone mapping before 8-bit quantisation.
All images are float32 RGBA in [0, 1] (HDR unbounded), row-major, top-left
origin.
"""

from __future__ import annotations

import os

import numpy as np


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    return np.asarray(img, np.float32) / 255.0


def load_tga(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    return np.asarray(img, np.float32) / 255.0


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr (RGBE) decoder, incl. adaptive RLE scanlines.

    Replaces the reference's hand parser (reference: loaders/load_hdr.cpp,
    HDRPixel decode at :18-33).  Returns (H, W, 4) float32, alpha=1.
    """
    with open(path, "rb") as f:
        data = f.read()

    # Header: lines until the blank line, then the resolution line.
    pos = 0
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"not a Radiance HDR file: {path}")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    pos = eol + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation: {res}")
    height, width = int(res[1]), int(res[3])

    rgbe = np.zeros((height, width, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bp = 0
    for y in range(height):
        if width < 8 or width > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2:
            # Flat (non-RLE) scanline.
            row = buf[bp : bp + width * 4].reshape(width, 4)
            rgbe[y] = row
            bp += width * 4
            continue
        if (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) != width:
            raise ValueError("HDR scanline length mismatch")
        bp += 4
        for c in range(4):
            x = 0
            while x < width:
                count = int(buf[bp])
                bp += 1
                if count > 128:  # run
                    count -= 128
                    rgbe[y, x : x + count, c] = buf[bp]
                    bp += 1
                else:  # literal
                    rgbe[y, x : x + count, c] = buf[bp : bp + count]
                    bp += count
                x += count

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    out = np.empty((height, width, 4), np.float32)
    out[..., :3] = (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None]
    out[..., 3] = 1.0
    return out


def load_image(path: str) -> np.ndarray | None:
    """Dispatch by extension; returns None on failure (caller substitutes a
    placeholder, reference: frontend/build_scene.cpp:136)."""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".png":
            return load_png(path)
        if ext == ".tga":
            return load_tga(path)
        if ext in (".hdr", ".pic"):
            return load_hdr(path)
        if ext in (".jpg", ".jpeg", ".bmp"):
            from PIL import Image

            return np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    except (OSError, ValueError):
        return None
    return None


def store_png(path: str, img: np.ndarray, weight: float = 1.0, gamma: float = 1.0 / 2.2,
              alpha: bool = False) -> None:
    """Tone-map (`pow(v * weight, gamma)`) and write 8-bit PNG, matching the
    reference writer (reference: loaders/store_png.h:34-49)."""
    from PIL import Image

    rgb = np.clip(np.power(np.maximum(img[..., :3] * weight, 0.0), gamma), 0.0, 1.0)
    out = (rgb * 255.0 + 0.5).astype(np.uint8)
    if alpha and img.shape[-1] >= 4:
        a = (np.clip(img[..., 3] * weight, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        out = np.concatenate([out, a[..., None]], axis=-1)
        Image.fromarray(out, "RGBA").save(path)
    else:
        Image.fromarray(out, "RGB").save(path)


def magenta_placeholder(size: int = 4) -> np.ndarray:
    """Texture-load-failure placeholder (reference: build_scene.cpp:136,152)."""
    img = np.zeros((size, size, 4), np.float32)
    img[..., 0] = 1.0
    img[..., 2] = 1.0
    img[..., 3] = 1.0
    return img
