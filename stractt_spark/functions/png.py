"""From-scratch PNG codec (pure Python + stdlib zlib) — the real-bytes
backing for the multimodal column operators.

Implements the public PNG specification (RFC 2083 / W3C PNG): chunk
stream parsing, IHDR/PLTE/IDAT/IEND, zlib inflate, and all five scanline
filters (None/Sub/Up/Average/Paeth).  Scope: 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace —
the formats a training-data pipeline actually meets in thumbnails.

Scale note: decode cost is per-payload CPU inside an Arrow-batched
executor kernel (operators/multimodal.py) — the plumbing is unchanged if
this pure decoder is swapped for a C codec; what this module buys is a
REAL bytes→pixels path with zero third-party dependencies, so the
multimodal gate verifies actual decoding, not a fake.

Replaces the reference's image-store decode step (the reference shells
out to image crates; re-expressed here from the public spec).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB array.

    Gray/palette/alpha inputs are expanded to RGB (alpha dropped) so
    downstream feature kernels see one layout."""
    if len(payload) < 8 or payload[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # skip CRC (integrity is the transport's job)
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if interlace:
        raise PngError("interlaced PNGs not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise PngError("decompressed size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 0:
            row = np.frombuffer(bytes(line), dtype=np.uint8)
        elif ftype == 2:  # Up — vectorized (no intra-row dependency)
            row = (np.frombuffer(bytes(line), dtype=np.uint8)
                   + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth carry an intra-row prefix dependency —
            # per-byte loop (small-image path; swap a C codec at scale)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            row = np.frombuffer(bytes(line), dtype=np.uint8)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = row
        prev = out[y]
    px = out.reshape(height, width, ch)
    if color_type == 2:
        return px.copy()
    if color_type == 6:
        return px[:, :, :3].copy()
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if palette is None:
        raise PngError("palette image without PLTE chunk")
    return palette[px[:, :, 0]]


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (filter 0, one IDAT) — the
    deterministic generator for tests/gates and the writer half of the
    resize operator."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise PngError("encode_png expects (h, w, 3) uint8")
    h, w, _ = px.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample (the PIL NEAREST analogue) — pure
    numpy fancy indexing, vectorized."""
    sh, sw = pixels.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return pixels[np.ix_(ys, xs)]
