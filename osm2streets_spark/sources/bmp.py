"""Minimal pure-Python BMP (Windows V3, 24-bit, uncompressed) codec.

The one REAL media-decode path in the multimodal pipeline: fixture
documents carry `bmp://` media spans whose text is the base64 of a real
.bmp payload, and operators/multimodal.decode_media parses these bytes
inside mapInPandas (the deterministic fake stays for tile://‌/geojson://
refs — no codec libs exist in this container for anything richer).

Format (public, e.g. https://en.wikipedia.org/wiki/BMP_file_format):
  BITMAPFILEHEADER (14 B): 'BM', file size, reserved, pixel offset
  BITMAPINFOHEADER (40 B): size=40, width, height (bottom-up if >0),
    planes=1, bpp=24, compression=0 (BI_RGB), ...
  pixel array: rows bottom-up, each row BGR triples padded to 4 bytes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (H, W, 3) uint8 RGB, row 0 = top. → .bmp bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = []
    pad = b"\0" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(pixels[y, :, ::-1].tobytes() + pad)  # RGB → BGR
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, (H, W, 3) uint8 RGB, row 0 = top). Raises
    ValueError on anything but 24-bit uncompressed BI_RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    (hdr_size, w, h, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    if len(data) < pixel_off + row_len * h:
        raise ValueError("truncated BMP pixel array")
    arr = np.frombuffer(
        data, dtype=np.uint8, count=row_len * h, offset=pixel_off
    ).reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    if bottom_up:
        arr = arr[::-1]
    return w, h, np.ascontiguousarray(arr)


def bmp_feature(pixels: np.ndarray) -> list[float]:
    """16-dim deterministic feature: per-channel mean + std over the
    whole image and per-quadrant channel means — enough structure for
    the downstream similarity/dedup operators to exercise."""
    p = pixels.astype(np.float64)
    h, w = p.shape[:2]
    out = [p[..., c].mean() for c in range(3)]
    out.append(p.std())
    for ys in (slice(0, h // 2 or 1), slice(h // 2, h)):
        for xs in (slice(0, w // 2 or 1), slice(w // 2, w)):
            q = p[ys, xs]
            if q.size == 0:
                q = p
            out.extend(q[..., c].mean() for c in range(3))
    return [float(np.float32(round(v, 4))) for v in out]
