"""Baseline JPEG decoder (kernel U5 parity for image/jpeg bodies).

The reference hashes JPEGs through Go's image.Decode
(/root/reference/perceptualHashing.go:33-49); this sandbox ships no
JPEG codec, so the decoder is implemented from the public JPEG
specification (ITU-T T.81, baseline sequential DCT): marker parse,
canonical Huffman entropy decode with byte-unstuffing and restart
markers, dequantize, de-zigzag, 8×8 IDCT, sampling-factor upsample,
JFIF YCbCr→RGB. Pure numpy — no external codec.

Scope: baseline sequential (SOF0), 8-bit, 1 or 3 components, any
h/v sampling factors (4:4:4 / 4:2:2 / 4:2:0). Progressive (SOF2),
arithmetic coding and 12-bit raise JpegError — the caller surfaces an
ErrorPerceptualHash row, mirroring the reference's decode-failure
path (perceptualHashing.go:26-29).
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_IDCT_M = None


def _idct_matrix() -> np.ndarray:
    global _IDCT_M
    if _IDCT_M is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        m[0, :] *= 1 / np.sqrt(2)
        _IDCT_M = m
    return _IDCT_M


def _idct2(coefs: np.ndarray) -> np.ndarray:
    m = _idct_matrix()
    return m.T @ coefs @ m


class _Huff:
    """Canonical Huffman table: (code-length histogram, symbols)."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        # map (length, code) -> symbol via a dict keyed on (len, code)
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = 16


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker."""

    __slots__ = ("data", "pos", "bitbuf", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync()
                    self.marker = nxt
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table: _Huff) -> int:
        if self.nbits < 16:
            self._fill()
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid huffman code")

    def sync_restart(self) -> None:
        """Consume a restart marker and realign to a byte boundary."""
        # drop residual bits
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dx
            self.marker = None
        else:
            # scan forward for the marker (skip pad bits already read)
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1
            raise JpegError("missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """data → (H, W, 3) uint8 RGB (grayscale replicated).

    Any malformed input raises JpegError (never a bare ValueError /
    IndexError from the parsers)."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (ValueError, IndexError, KeyError, struct.error) as e:
        raise JpegError(f"malformed jpeg: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise JpegError("truncated segment")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X} (not baseline)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tda = seg[1 + 2 * c : 3 + 2 * c]
                scan.append({"id": cid, "td": tda >> 4, "ta": tda & 15})
            pos = pos + seglen
            break  # entropy-coded data follows
        pos += seglen

    if frame is None or scan is None:
        raise JpegError("missing SOF0/SOS")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h == 0 or w == 0:
        raise JpegError("zero dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        by_id[s["id"]]["td"] = s["td"]
        by_id[s["id"]]["ta"] = s["ta"]

    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    rd = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.sync_restart()
                for cid in pred:
                    pred[cid] = 0
            for c in comps:
                q = qt.get(c["tq"])  # zigzag order, like the coefficients
                if q is None:
                    raise JpegError("missing quant table")
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = rd.huff(huff_dc[c["td"]])
                        diff = _extend(rd.bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rd.huff(huff_ac[c["ta"]])
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise JpegError("AC index overflow")
                            zz[k] = _extend(rd.bits(ss), ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        spatial = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        g = np.clip(full[0], 0, 255)
        return np.dstack([g, g, g]).astype(np.uint8)
    if len(full) != 3:
        raise JpegError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.dstack(
        [np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(b, 0, 255)]
    ).astype(np.uint8)
