"""From-scratch Y4M (YUV4MPEG2) codec — pure Python + numpy.

The video member of the from-scratch codec family (png.py images,
wav.py audio): YUV4MPEG2 is the standard UNCOMPRESSED video container
(mjpegtools/ffmpeg interchange) — an ASCII stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``), then per frame an ASCII
``FRAME`` header followed by raw planar YUV.  Supported chroma
subsamplings: C420 (default, and its jpeg/mpeg2/paldv variants), C422,
C444, Cmono.  Compressed codecs (H.264 etc.) are out of scope by
design — they need entropy decoders no from-scratch pure-Python
implementation can honestly provide; this format is what frame-exact
video pipelines interchange anyway.

Scale note: per-payload CPU in Arrow-batched executors; payloads never
reach the driver.  A real deployment swaps ffmpeg in behind the same
batch contract (operators/multimodal.py LibraryDecoder) — what this
module buys is a verifiable bytes→frames path with zero dependencies.
"""

from __future__ import annotations

import numpy as np


class Y4mError(ValueError):
    pass


_MAGIC = b"YUV4MPEG2"

# chroma tag → (y_div, c_div) plane-size divisors (w*h // div per plane)
_CHROMA = {
    "420": 4, "420jpeg": 4, "420mpeg2": 4, "420paldv": 4,
    "422": 2,
    "444": 1,
    "mono": None,
}


def decode_y4m(payload: bytes):
    """Y4M bytes → (width, height, fps_num, fps_den, frames) where
    ``frames`` is a list of (h, w) uint8 LUMA planes (chroma is parsed
    and skipped — features/fingerprints run on luma, like every
    perceptual-hash pipeline)."""
    if not payload.startswith(_MAGIC):
        raise Y4mError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\x0a")
    if nl < 0:
        raise Y4mError("truncated stream header")
    header = payload[len(_MAGIC):nl].decode("ascii", "strict")
    w = h = None
    fn, fd = 30, 1
    chroma = "420"
    for tok in header.split():
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok.startswith("C"):
            chroma = tok[1:]
        # I/A/X params carry no layout info we need
    if not w or not h:
        raise Y4mError("stream header missing W/H")
    if chroma not in _CHROMA:
        raise Y4mError(f"unsupported chroma subsampling C{chroma}")
    y_size = w * h
    c_div = _CHROMA[chroma]
    frame_size = y_size if c_div is None else y_size + 2 * (y_size // c_div)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise Y4mError(f"expected FRAME header at offset {pos}")
        fnl = payload.find(b"\x0a", pos)
        if fnl < 0:
            raise Y4mError("truncated FRAME header")
        pos = fnl + 1
        if pos + frame_size > len(payload):
            raise Y4mError("truncated frame data")
        frames.append(
            np.frombuffer(
                payload[pos:pos + y_size], dtype=np.uint8
            ).reshape(h, w).copy()
        )
        pos += frame_size
    return w, h, fn, fd, frames


def encode_y4m(
    luma_frames: list[np.ndarray],
    fps: tuple[int, int] = (30, 1),
    chroma: str = "420",
) -> bytes:
    """(h, w) uint8 luma planes → Y4M bytes (chroma planes written as
    the neutral 128 — gray, the deterministic generator for tests and
    gates)."""
    if not luma_frames:
        raise Y4mError("need at least one frame")
    h, w = luma_frames[0].shape
    if chroma not in _CHROMA:
        raise Y4mError(f"unsupported chroma subsampling C{chroma}")
    c_div = _CHROMA[chroma]
    c_bytes = b"" if c_div is None else bytes([128]) * (2 * (w * h // c_div))
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\x0a"
        .encode("ascii")
    )
    for fr in luma_frames:
        if fr.shape != (h, w):
            raise Y4mError("all frames must share the stream dimensions")
        out += b"FRAME\x0a"
        out += np.ascontiguousarray(fr, dtype=np.uint8).tobytes()
        out += c_bytes
    return bytes(out)
