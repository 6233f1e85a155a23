"""Minimal pure-Python/numpy PNG decoder.

The sandbox has no PIL/libpng, so the perceptual-hash kernel (U5)
decodes PNG itself: critical chunks, 8-bit gray/RGB/RGBA, filters
0-4, no interlace — exactly the subset the synthetic corpus (and any
well-formed baseline PNG) uses. Implemented from the public PNG spec
(RFC 2083); nothing copied from the reference (which uses Go's
image/png — /root/reference/perceptualHashing.go:21).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class PngError(ValueError):
    pass


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W, C) with C in {1, 3, 4}."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise PngError("not a PNG signature")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise PngError(f"unsupported PNG variant depth={depth} interlace={interlace}")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise PngError(f"unsupported color type {ctype}")

    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise PngError("bad IDAT length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise PngError(f"bad filter {ftype}")
        out[y] = line
        prev = line
    return out.reshape(h, w, channels)
