"""From-scratch PNG codec (functions/png.py): roundtrip, all five
scanline filters, the five supported color types, resize, and the real
Spark decode/feature/resize operators over it."""

import struct
import zlib

import numpy as np
import pytest

from stractt_spark.functions.png import (
    _SIGNATURE,
    PngError,
    decode_png,
    encode_png,
    resize_nearest,
)

RNG = np.random.default_rng(1234)


def _chunk(t: bytes, d: bytes) -> bytes:
    return (
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )


def _encode_ct(data: np.ndarray, ct: int, palette=None) -> bytes:
    if data.ndim == 2:
        data = data[..., None]
    h, w, _ch = data.shape
    raw = b"".join(b"\x00" + data[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _encode_filtered(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Filter-encode RGB rows with the given per-row filter cycle (the
    test's OWN filter arithmetic — independent of the decoder)."""
    h, w, ch = px.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pr
            raw.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip():
    px = RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filters_unfilter_exactly(ftypes):
    px = RNG.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    assert (decode_png(_encode_filtered(px, ftypes)) == px).all()


def test_gray_rgba_grayalpha_palette():
    g = RNG.integers(0, 256, (5, 6), dtype=np.uint8)
    assert (decode_png(_encode_ct(g, 0))
            == np.repeat(g[:, :, None], 3, 2)).all()
    rgba = RNG.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    assert (decode_png(_encode_ct(rgba, 6)) == rgba[:, :, :3]).all()
    ga = RNG.integers(0, 256, (5, 6, 2), dtype=np.uint8)
    assert (decode_png(_encode_ct(ga, 4))
            == np.repeat(ga[:, :, :1], 3, 2)).all()
    pal = RNG.integers(0, 256, (8, 3), dtype=np.uint8)
    idxs = RNG.integers(0, 8, (5, 6), dtype=np.uint8)
    assert (decode_png(_encode_ct(idxs, 3, palette=pal)) == pal[idxs]).all()


def test_rejects_bad_inputs():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"JFIF....")
    px = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    interlaced = bytearray(encode_png(px))
    # IHDR data starts at offset 16; interlace byte is its 13th byte
    ihdr_off = 16
    interlaced[ihdr_off + 12] = 1
    with pytest.raises(PngError, match="interlaced"):
        decode_png(bytes(interlaced))


def test_resize_nearest_known_values():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    r = resize_nearest(px, 2, 2)
    assert (r == px[np.ix_([0, 2], [0, 2])]).all()
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (resize_nearest(up, 4, 4) == px).all()


# -------------------------------------------------- Spark operators


def test_decode_images_operator(spark):
    from stractt_spark.operators.multimodal import decode_images
    import pandas as pd

    imgs = {}
    rows = []
    for i in range(12):
        w, h = 6 + i % 5, 4 + i % 3
        px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
        imgs[i] = px
        rows.append((i, bytearray(encode_png(px))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_images(media).collect()}
    for i, px in imgs.items():
        r = got[i]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        s = px.astype(np.int64).sum(axis=(0, 1))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(s.tolist())


def test_png_feature_decoder_real_pixels(spark):
    from stractt_spark.operators.multimodal import (
        PngDecoder,
        extract_features,
    )

    px = np.full((10, 8, 3), 128, dtype=np.uint8)
    px[:, :, 0] = 255  # red-heavy
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px)))],
        "media_id long, media_type string, payload binary",
    )
    row = extract_features(media, decoder=PngDecoder()).collect()[0]
    f = row["feature"]
    assert abs(f[0] - 1.0) < 1e-6          # mean_r = 255/255
    assert abs(f[1] - 128 / 255.0) < 1e-6  # mean_g
    assert f[3] < 1e-6                     # std_r = 0 (constant channel)
    assert abs(f[6] - np.log1p(8)) < 1e-5  # log1p(width)
    hist = np.asarray(f[8:24])
    assert abs(hist.sum() - 1.0) < 1e-6    # normalized histogram
    assert row["n_bytes"] == len(encode_png(px))


def test_png_resizer_real(spark):
    from stractt_spark.operators.multimodal import PngResizer, resize_media

    px = RNG.integers(0, 256, (9, 12, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(7, bytearray(encode_png(px)))], "media_id long, payload binary"
    )
    row = resize_media(
        media, width=6, height=3, resizer=PngResizer()
    ).collect()[0]
    assert (row["width"], row["height"]) == (6, 3)
    out = decode_png(bytes(row["payload"]))
    assert (out == resize_nearest(px, 6, 3)).all()


# ------------------------------------------------------------- WAV


def test_wav_roundtrip_16bit_stereo():
    from stractt_spark.functions.wav import decode_wav, encode_wav

    s = RNG.integers(-32768, 32767, (500, 2), dtype=np.int64)
    rate, out = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and out.shape == (500, 2)
    assert np.allclose(out, s / 32768.0)


def test_wav_8bit_and_32bit():
    from stractt_spark.functions.wav import decode_wav, encode_wav

    s8 = RNG.integers(0, 256, 300, dtype=np.int64)
    rate, out = decode_wav(encode_wav(s8, 8000, bits=8))
    assert np.allclose(out[:, 0], (s8 - 128) / 128.0)
    s32 = RNG.integers(-2**31, 2**31 - 1, 300, dtype=np.int64)
    _, out32 = decode_wav(encode_wav(s32, 16000, bits=32))
    assert np.allclose(out32[:, 0], s32 / 2.0**31)


def test_wav_rejects_bad_input():
    from stractt_spark.functions.wav import WavError, decode_wav

    with pytest.raises(WavError, match="RIFF"):
        decode_wav(b"OggS....")
    # non-PCM format code
    import struct
    import zlib as _z  # noqa: F401

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # float fmt
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(WavError, match="PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_decoder_features(spark):
    from stractt_spark.functions.wav import encode_wav
    from stractt_spark.operators.multimodal import (
        WavDecoder,
        extract_features,
    )

    # constant half-amplitude signal: rms == mean == 0.5, zcr == 0
    s = np.full(1000, 16384, dtype=np.int64)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(s, 8000)))],
        "media_id long, media_type string, payload binary",
    )
    f = extract_features(media, decoder=WavDecoder()).collect()[0]["feature"]
    assert abs(f[0] - 0.5) < 1e-6          # rms
    assert abs(f[1] - 0.5) < 1e-6          # mean
    assert f[2] == 0.0                     # zero crossings
    assert abs(f[4] - np.log1p(8000)) < 1e-4


def test_decode_audio_operator(spark):
    from stractt_spark.functions.wav import encode_wav
    from stractt_spark.operators.multimodal import decode_audio

    rows, want = [], {}
    for i in range(8):
        n = 50 + i * 10
        s = RNG.integers(-1024, 1024, n, dtype=np.int64)
        rows.append((i, bytearray(encode_wav(s, 8000 + i))))
        want[i] = (8000 + i, n, 1, int((s.astype(np.int64) ** 2).sum()))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["sample_rate"], r["n_frames"],
                           r["n_channels"], r["sum_sq"])
           for r in decode_audio(media).collect()}
    assert got == want


# ------------------------------------------------------------- Y4M


def test_y4m_roundtrip_and_chroma_variants():
    from stractt_spark.functions.y4m import decode_y4m, encode_y4m

    frames = [RNG.integers(0, 256, (6, 8), dtype=np.uint8)
              for _ in range(5)]
    for chroma in ("420", "422", "444", "mono"):
        w, h, fn, fd, out = decode_y4m(
            encode_y4m(frames, fps=(25, 1), chroma=chroma)
        )
        assert (w, h, fn, fd) == (8, 6, 25, 1)
        assert len(out) == 5
        for a, b in zip(out, frames):
            assert (a == b).all()


def test_y4m_rejects_bad_input():
    from stractt_spark.functions.y4m import Y4mError, decode_y4m, encode_y4m

    with pytest.raises(Y4mError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF....")
    good = encode_y4m([np.zeros((4, 4), dtype=np.uint8)])
    with pytest.raises(Y4mError, match="truncated frame"):
        decode_y4m(good[:-5])
    with pytest.raises(Y4mError, match="chroma"):
        decode_y4m(good.replace(b"C420", b"C410"))


def test_sample_frames_operator(spark):
    from stractt_spark.functions.y4m import encode_y4m
    from stractt_spark.operators.multimodal import sample_frames

    rows, want = [], set()
    for i in range(6):
        nf = 5 + i
        frames = [RNG.integers(0, 256, (4, 6), dtype=np.uint8)
                  for _ in range(nf)]
        rows.append((i, bytearray(encode_y4m(frames))))
        for fno in range(0, nf, 2):
            want.add((i, fno, 6, 4,
                      int(frames[fno].astype(np.int64).sum())))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["frame_no"], r["width"], r["height"],
         r["luma_sum"])
        for r in sample_frames(media, every_n=2).collect()
    }
    assert got == want


def test_y4m_decoder_features(spark):
    from stractt_spark.functions.y4m import encode_y4m
    from stractt_spark.operators.multimodal import (
        Y4mDecoder,
        extract_features,
    )

    # constant frames: std 0, motion 0
    frames = [np.full((4, 4), 100, dtype=np.uint8) for _ in range(3)]
    media = spark.createDataFrame(
        [(1, "video", bytearray(encode_y4m(frames, fps=(24, 1))))],
        "media_id long, media_type string, payload binary",
    )
    f = extract_features(media, decoder=Y4mDecoder()).collect()[0]["feature"]
    assert f[0] == 3.0 and abs(f[1] - 24.0) < 1e-6
    assert abs(f[4] - 100 / 255.0) < 1e-6
    assert f[5] == 0.0 and f[6] == 0.0
