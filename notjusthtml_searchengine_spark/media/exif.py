"""EXIF extraction (kernel U6) — real APP1/TIFF IFD parser.

Mirrors the reference's goexif usage (/root/reference/
perceptualHashing.go:54-85): camera model (tag 0x0110), DateTime
(0x0132 → UnixMicro), GPS lat/long (GPS IFD tags 1-4); returns None
when all three are absent (the reference drops the row —
perceptualHashing.go:80-84). DateTime is interpreted as UTC (the
reference uses Go's time.Local — a documented determinism fix).

Implemented from the public TIFF 6.0 / EXIF 2.3 specs.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone


def _parse_ifd(tiff: bytes, off: int, endian: str) -> dict[int, tuple[int, int, bytes]]:
    """IFD at off → {tag: (type, count, value_bytes)}."""
    out: dict[int, tuple[int, int, bytes]] = {}
    if off + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, typ, count = struct.unpack_from(endian + "HHI", tiff, base)
        size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}.get(typ, 1) * count
        if size <= 4:
            val = tiff[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", tiff, base + 8)
            val = tiff[voff : voff + size]
        out[tag] = (typ, count, val)
    return out


def _rationals(val: bytes, count: int, endian: str) -> list[float]:
    out = []
    for i in range(count):
        num, den = struct.unpack_from(endian + "II", val, 8 * i)
        out.append(num / den if den else 0.0)
    return out


def _ascii(val: bytes) -> str:
    return val.split(b"\x00", 1)[0].decode("ascii", errors="replace")


def extract_exif(body: bytes) -> dict | None:
    """JPEG bytes → {camera, ts, lat, long} or None."""
    if body[:2] != b"\xff\xd8":
        return None
    pos = 2
    tiff = None
    while pos + 4 <= len(body):
        if body[pos] != 0xFF:
            break
        marker = body[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", body, pos + 2)
        if marker == 0xE1 and body[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = body[pos + 10 : pos + 2 + seglen]
            break
        if marker == 0xDA:  # start of scan — no EXIF before it
            break
        pos += 2 + seglen
    if tiff is None or len(tiff) < 8:
        return None

    endian = {b"II": "<", b"MM": ">"}.get(tiff[:2])
    if endian is None:
        return None
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, ifd0_off, endian)

    camera = ""
    ts = 0
    lat = long = 0.0
    if 0x0110 in ifd0:
        camera = _ascii(ifd0[0x0110][2])
    if 0x0132 in ifd0:
        try:
            dt = datetime.strptime(_ascii(ifd0[0x0132][2]), "%Y:%m:%d %H:%M:%S")
            ts = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        except ValueError:
            pass
    if 0x8825 in ifd0:
        (gps_off,) = struct.unpack_from(endian + "I", ifd0[0x8825][2], 0)
        gps = _parse_ifd(tiff, gps_off, endian)
        try:
            if 0x0002 in gps and 0x0004 in gps:
                d, m, s = _rationals(gps[0x0002][2], 3, endian)
                lat = d + m / 60 + s / 3600
                if 0x0001 in gps and _ascii(gps[0x0001][2]) == "S":
                    lat = -lat
                d, m, s = _rationals(gps[0x0004][2], 3, endian)
                long = d + m / 60 + s / 3600
                if 0x0003 in gps and _ascii(gps[0x0003][2]) == "W":
                    long = -long
        except (struct.error, ZeroDivisionError):
            lat = long = 0.0

    if ts == 0 and camera == "" and lat == 0:
        return None  # perceptualHashing.go:80-84
    return {"camera": camera, "ts": ts, "lat": lat, "long": long}
