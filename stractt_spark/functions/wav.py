"""From-scratch WAV (RIFF/PCM) codec — pure Python + numpy, no codec
libraries.  The audio analogue of :mod:`stractt_spark.functions.png`:
real bytes→samples decoding behind the multimodal column operators.

Implements the public RIFF/WAVE container: chunk walking, the ``fmt ``
chunk (PCM format 1, 8/16/32-bit integer samples, any channel count /
rate), and the ``data`` chunk.  Compressed formats (float, ADPCM, MP3
in WAV) raise loudly.

Scale note: per-payload CPU inside Arrow-batched executors — the
plumbing is unchanged if a C codec replaces this; what it buys is a
verifiable bytes→samples path with zero dependencies.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, samples float64 in [−1, 1], shape
    (n_frames, n_channels)).  8-bit is unsigned-offset per the spec;
    16/32-bit signed."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if ctype == b"fmt ":
            if length < 16:
                raise WavError("truncated fmt chunk")
            (audio_fmt, n_ch, rate, _brate, _balign,
             bits) = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise WavError(
                    f"unsupported WAV format {audio_fmt} (PCM=1 only)"
                )
            if bits not in _DTYPES:
                raise WavError(f"unsupported bit depth {bits}")
            fmt = (n_ch, rate, bits)
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    raw = np.frombuffer(data, dtype=_DTYPES[bits])
    if n_ch > 1:
        raw = raw[: (raw.size // n_ch) * n_ch].reshape(-1, n_ch)
    else:
        raw = raw.reshape(-1, 1)
    if bits == 8:
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        samples = raw.astype(np.float64) / float(1 << (bits - 1))
    return rate, samples


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) int array (already in the target bit
    range) → WAV bytes — the deterministic generator for tests/gates."""
    if bits not in _DTYPES:
        raise WavError(f"unsupported bit depth {bits}")
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    data = arr.astype(_DTYPES[bits]).tobytes()
    balign = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * balign, balign, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
