"""Real-image-codec certification (VERDICT r3 "what's missing" #1).

The container ships no image library, so the PNG path must be real on
the pure-stdlib codec alone: these tests decode hand-built PNG byte
streams (constructed chunk-by-chunk with zlib, independently of the
encoder under test), round-trip encode→decode→resize→aHash, and drive
REAL PNG payloads through the Spark multimodal operators, asserting
the real-decode path (not the deterministic fake) produced the result.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_neptune_spark.functions import pngcodec


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _manual_png(width, height, colortype, scanlines: bytes) -> bytes:
    """Build a PNG byte stream by hand (independent of pngcodec.encode):
    scanlines already carry their per-line filter byte."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_decode_golden_gray_filter0():
    # 3x2 grayscale, filter 0 lines; pixel values chosen by hand.
    scan = bytes([0, 10, 20, 30]) + bytes([0, 40, 50, 60])
    img = pngcodec.decode(_manual_png(3, 2, 0, scan))
    assert img.shape == (2, 3)
    assert img.tolist() == [[10, 20, 30], [40, 50, 60]]


def test_decode_golden_rgb_all_filters():
    # 2x5 RGB exercising every filter type on a known-good byte layout.
    # Row filters: 0 (None), 1 (Sub), 2 (Up), 3 (Average), 4 (Paeth).
    # Expected pixels computed by hand from the PNG spec recurrences.
    row0 = bytes([0, 100, 110, 120, 130, 140, 150])
    row1 = bytes([1, 10, 10, 10, 5, 5, 5])  # Sub: cumulative along x
    row2 = bytes([2, 1, 2, 3, 4, 5, 6])  # Up: add row above
    row3 = bytes([3, 8, 8, 8, 8, 8, 8])  # Average of left and up
    row4 = bytes([4, 1, 1, 1, 1, 1, 1])  # Paeth predictor
    img = pngcodec.decode(_manual_png(2, 5, 2, row0 + row1 + row2 + row3 + row4))
    assert img.shape == (5, 2, 3)
    assert img[0].tolist() == [[100, 110, 120], [130, 140, 150]]
    # Sub: first pixel = raw, second adds the pixel bpp back
    assert img[1].tolist() == [[10, 10, 10], [15, 15, 15]]
    # Up: row1 + delta
    assert img[2].tolist() == [[11, 12, 13], [19, 20, 21]]
    # Average: x=0 → left=0, avg=floor(up/2); x=1 → avg((left+up)/2)
    r3p0 = [8 + 11 // 2, 8 + 12 // 2, 8 + 13 // 2]
    r3p1 = [
        8 + (r3p0[0] + 19) // 2,
        8 + (r3p0[1] + 20) // 2,
        8 + (r3p0[2] + 21) // 2,
    ]
    assert img[3].tolist() == [r3p0, r3p1]
    # Paeth at x=0: a=0,c=0 → pred=up; spot-check first pixel only
    assert img[4][0].tolist() == [r3p0[0] + 1, r3p0[1] + 1, r3p0[2] + 1]


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_encode_decode_roundtrip(channels):
    rng = np.random.default_rng(7)
    shape = (13, 9) if channels == 1 else (13, 9, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = pngcodec.decode(pngcodec.encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_encode_is_deterministic():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert pngcodec.encode(img) == pngcodec.encode(img)


def test_unsupported_rejected():
    with pytest.raises(pngcodec.PngError):
        pngcodec.decode(b"not a png at all")
    # 16-bit depth PNG must be rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(3)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(pngcodec.PngError):
        pngcodec.decode(bad)


def test_resize_nearest_exact_indices():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = pngcodec.resize_nearest(img, 2, 2)
    # ys = [0, 2], xs = [0, 2]
    assert small.tolist() == [[0, 2], [8, 10]]
    big = pngcodec.resize_nearest(img, 8, 8)
    assert big.shape == (8, 8)
    assert big[0, 0] == 0 and big[7, 7] == 15


def test_ahash64_shape_and_stability():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h = pngcodec.ahash64(img)
    assert len(h) == 64 and set(h) <= {"0", "1"}
    assert h == pngcodec.ahash64(img)
    # aHash is invariant to nearest-neighbor upscale (same 8x8 thumbnail)
    assert h == pngcodec.ahash64(pngcodec.resize_nearest(img, 64, 64))


def test_spark_decode_and_resize_real_png(spark):
    """REAL codec end-to-end on the Spark operators: fabricate PNG
    payloads (deterministic per doc), decode metadata, resize, and
    assert the real path ran — the fake decoder could not produce
    these width/height values for payloads of this length."""
    from etl_neptune_spark.operators.multimodal import (
        decode_image_meta,
        resize_images,
    )

    rows = []
    for i in range(1, 9):
        w, h = 3 + i, 2 + (i % 3)
        img = (np.arange(w * h * 3, dtype=np.uint32) * (i + 7) % 256).astype(
            np.uint8
        ).reshape(h, w, 3)
        rows.append((i, bytearray(pngcodec.encode(img)), w, h))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, w int, h int"
    )

    meta = {r.doc_id: r for r in decode_image_meta(df).collect()}
    for i, _, w, h in rows:
        assert meta[i].width == w and meta[i].height == h
        assert meta[i].channels == 3 and meta[i].format == "png"

    resized = {r.doc_id: r for r in resize_images(df, width=5, height=4).collect()}
    for i, _, _, _ in rows:
        out = pngcodec.decode(bytes(resized[i].payload))
        assert out.shape == (4, 5, 3)  # really re-encoded PNG at target dims


# ---- WAV codec (audio counterpart; same certification posture) ----


def test_wav_roundtrip_mono_and_stereo():
    from etl_neptune_spark.functions import wavcodec

    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    out, sr = wavcodec.decode(wavcodec.encode(mono, sample_rate=8000))
    assert sr == 8000 and out.shape == (777, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32768, size=(123, 2), dtype=np.int16)
    out2, sr2 = wavcodec.decode(wavcodec.encode(stereo))
    assert sr2 == 16000 and out2.shape == (123, 2)
    assert np.array_equal(out2, stereo)


def test_wav_golden_header_layout():
    """Hand-check the RIFF layout against the spec, independent of the
    decoder: 44-byte canonical header for 2 mono samples."""
    from etl_neptune_spark.functions import wavcodec

    b = wavcodec.encode(np.array([1, -2], dtype=np.int16), sample_rate=44100)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert b[12:16] == b"fmt " and b[36:40] == b"data"
    assert struct.unpack("<I", b[40:44])[0] == 4  # 2 samples * 2 bytes
    assert struct.unpack("<H", b[22:24])[0] == 1  # channels
    assert struct.unpack("<I", b[24:28])[0] == 44100
    assert b[44:48] == np.array([1, -2], dtype="<i2").tobytes()


def test_wav_skips_extra_chunks():
    """Decoders must skip non-fmt/data chunks (LIST/INFO metadata)."""
    from etl_neptune_spark.functions import wavcodec

    base = wavcodec.encode(np.array([5, 6, 7], dtype=np.int16))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    out, _ = wavcodec.decode(spliced)
    assert out[:, 0].tolist() == [5, 6, 7]


def test_wav_rejects_non_pcm():
    from etl_neptune_spark.functions import wavcodec
    import pytest as _pytest

    with _pytest.raises(wavcodec.WavError):
        wavcodec.decode(b"RIFFxxxxWAVE")  # no chunks
    with _pytest.raises(wavcodec.WavError):
        wavcodec.decode(b"not audio")


def test_wav_frame_energy_and_zero_crossings_exact():
    from etl_neptune_spark.functions import wavcodec

    s = np.array([3, -1, 0, 2, -2, 4], dtype=np.int16)
    en = wavcodec.frame_energies(s, frame=4)
    assert en.tolist() == [9 + 1 + 0 + 4, 4 + 16]
    # nonzero signs: + - + - + → 4 flips
    assert wavcodec.zero_crossings(s) == 4


def test_spark_wav_pipeline_real_decode(spark):
    from etl_neptune_spark.functions import wavcodec
    from etl_neptune_spark.operators.multimodal import (
        decode_audio_stats,
        fabricate_wav,
    )

    df = spark.createDataFrame(
        [(i, 100 + 13 * i) for i in range(1, 7)], "doc_id long, n_chars long"
    )
    got = {r.doc_id: r for r in decode_audio_stats(fabricate_wav(df)).collect()}
    for i in range(1, 7):
        n = (100 + 13 * i) % 500 + 64
        k = i % 127 + 1
        s = np.arange(n, dtype=np.int64) * k % 4001 - 2000
        assert got[i].n_samples == n
        assert got[i].total_energy == int((s * s).sum())
        nz = s[s != 0]
        assert got[i].n_zero_cross == int((np.diff(np.sign(nz)) != 0).sum())


# ---- property-based roundtrips (hypothesis) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    if c == 1:
        img = img[:, :, 0]
    out = pngcodec.decode(pngcodec.encode(img))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2048),
    ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, seed):
    from etl_neptune_spark.functions import wavcodec

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    if ch == 1:
        s = s[:, 0]
    out, _ = wavcodec.decode(wavcodec.encode(s))
    expect = s[:, None] if s.ndim == 1 else s
    assert np.array_equal(out, expect)


def test_corrupt_png_falls_back_to_fake_not_crash(spark):
    """A payload with a PNG signature but corrupt internals must fall
    back to the deterministic fake metadata in decode_image_meta (the
    log-and-continue posture), never kill the job."""
    from etl_neptune_spark.operators.multimodal import (
        _fake_decode,
        decode_image_meta,
    )

    good = pngcodec.encode(np.zeros((2, 2, 3), dtype=np.uint8))
    corrupt = good[:20] + b"\x00garbage\xff" * 3  # signature intact, body broken
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (meta[1].width, meta[1].height, meta[1].format) == (2, 2, "png")
    fake = _fake_decode(bytes(corrupt))
    assert meta[2].width == fake["width"] and meta[2].height == fake["height"]


def test_perceptual_hash_real_pixels_resolution_invariant(spark):
    """PNG payloads hash on DECODED pixels: a nearest-neighbor upscale
    of the same image must produce the identical 64-bit aHash (the
    whole point of a perceptual key), while the byte-level fallback
    hash of the two files would differ."""
    from etl_neptune_spark.operators.multimodal import perceptual_hash

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    big = pngcodec.resize_nearest(img, 64, 64)
    df = spark.createDataFrame(
        [
            (1, bytearray(pngcodec.encode(img))),
            (2, bytearray(pngcodec.encode(big))),
            (3, bytearray(b"just text bytes, not an image")),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.phash for r in perceptual_hash(df).collect()}
    assert got[1] == got[2] == pngcodec.ahash64(img)
    assert len(got[3]) <= 64 and set(got[3]) <= {"0", "1"}
