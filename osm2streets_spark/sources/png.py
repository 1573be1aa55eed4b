"""Minimal pure-Python PNG codec (8-bit truecolor, non-interlaced).

The SECOND real media-decode path in the multimodal pipeline (next to
sources/bmp.py): fixture documents carry `png://` media spans whose
text is the base64 of a real .png payload, and
operators/multimodal.decode_media parses these bytes inside
mapInPandas.

Format (public: RFC 2083 / https://www.w3.org/TR/png-3/):
  8-byte signature; then chunks [len(4) type(4) data crc(4)]:
    IHDR: width, height, bit depth, color type, compression, filter,
          interlace
    IDAT: zlib-compressed filtered scanlines (one filter byte per row)
    IEND: terminator
  Row filters 0..4 (None/Sub/Up/Average/Paeth) are applied per byte
  with `bpp` = bytes per pixel lookback.

Decoder supports bit depth 8, color types 2 (RGB) and 6 (RGBA, alpha
dropped), interlace 0 — everything the fixture encoder emits, failing
loudly on the rest. Encoder writes color type 2 with a mix of row
filters so the decoder's unfilter paths are genuinely exercised.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """pixels: (H, W, 3) uint8 RGB, row 0 = top. → .png bytes.

    Rows cycle through filters None/Sub/Up so decode exercises real
    unfiltering, not just the trivial path."""
    h, w, c = pixels.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = pixels[y].reshape(-1)
        f = y % 3
        if f == 0:      # None
            raw.append(0)
            raw += row.tobytes()
        elif f == 1:    # Sub
            left = np.concatenate([np.zeros(3, dtype=np.uint8), row[:-3]])
            raw.append(1)
            raw += ((row.astype(np.int16) - left) % 256).astype(
                np.uint8).tobytes()
        else:           # Up
            raw.append(2)
            raw += ((row.astype(np.int16) - prev) % 256).astype(
                np.uint8).tobytes()
        prev = row
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, (H, W, 3) uint8 RGB, row 0 = top). Raises
    ValueError on anything but 8-bit RGB/RGBA, non-interlaced."""
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    bpp = 3
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + clen > len(data):
            # a corrupt/truncated length would otherwise yield a short
            # body slice and surface as struct.error downstream instead
            # of the ValueError this decoder promises (round-5 ADVICE)
            raise ValueError("truncated PNG chunk")
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in (2, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color type={color})")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/interlace")
            bpp = 4 if color == 6 else 3
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:    # Sub: vectorized per-bpp-column cumsum mod 256
            cur = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1) % 256
        elif f == 2:    # Up
            cur = (line + prev) % 256
        elif f == 3:    # Average
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (a + int(prev[i])) // 2) % 256
        elif f == 4:    # Paeth
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (line[i] + _paeth(a, int(prev[i]), c)) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    arr = out.reshape(h, w, bpp)[:, :, :3]
    return int(w), int(h), np.ascontiguousarray(arr)
