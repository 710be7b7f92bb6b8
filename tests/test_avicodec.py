"""AVI (RIFF MJPEG) container codec tests — functions/avicodec.py.
Same discipline as test_jpegcodec/test_pngcodec: hand-built goldens,
bit-exact round trips, chunk-skip tolerance, loud error paths, plus the
Spark-side frame_sample path over real containers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_neptune_spark.functions import avicodec, jpegcodec


def _frames(doc_id: int = 5, tw: int = 3, th: int = 2, nf: int = 3):
    t = np.arange(tw * th, dtype=np.int64).reshape(th, tw)
    out = []
    for f in range(nf):
        tiles = ((doc_id * 7 + f * 11 + t * 13) % 128 * 2).astype(np.uint8)
        out.append(
            jpegcodec.encode(np.kron(tiles, np.ones((8, 8), np.uint8)), quality=50)
        )
    return out


def test_header_layout_and_probe():
    frames = _frames()
    avi = avicodec.encode(frames, 24, 16, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    # declared RIFF size covers the whole body
    (riff_len,) = struct.unpack_from("<I", avi, 4)
    assert riff_len == len(avi) - 8
    assert avicodec.is_avi(avi)
    info = avicodec.probe(avi)
    assert info == {"n_frames": 3, "width": 24, "height": 16}


def test_roundtrip_bit_exact_frames_and_pixels():
    frames = _frames(doc_id=9, tw=4, th=3, nf=5)
    avi = avicodec.encode(frames, 32, 24)
    got, info = avicodec.decode(avi)
    assert got == frames  # byte-identical extraction
    # DC-only constant tiles -> every decoded frame is pixel-exact
    t = np.arange(12, dtype=np.int64).reshape(3, 4)
    for f, payload in enumerate(got):
        tiles = (9 * 7 + f * 11 + t * 13) % 128 * 2
        exp = np.kron(tiles, np.ones((8, 8), np.int64))
        assert np.array_equal(jpegcodec.decode(payload).astype(np.int64), exp)


def test_chunk_skip_tolerance():
    """Writers inject JUNK chunks and 'rec ' groupings — the walker
    must skip unknown chunks and still find every frame."""
    frames = _frames(nf=2)
    avi = avicodec.encode(frames, 24, 16)
    # splice a JUNK chunk right after the hdrl LIST ends
    hdrl_at = avi.index(b"LIST")
    (hdrl_len,) = struct.unpack_from("<I", avi, hdrl_at + 4)
    cut = hdrl_at + 8 + hdrl_len
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"  # even length
    spliced = avi[:cut] + junk + avi[cut:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    got, info = avicodec.decode(spliced)
    assert got == frames and info["n_frames"] == 2


def test_error_paths():
    with pytest.raises(avicodec.AviError):
        avicodec.decode(b"NOTANAVI" * 4)
    with pytest.raises(avicodec.AviError):
        avicodec.encode([], 8, 8)
    frames = _frames(nf=2)
    avi = avicodec.encode(frames, 24, 16)
    # corrupt the declared frame count -> loud mismatch, not silence
    bad = bytearray(avi)
    avih_at = avi.index(b"avih") + 8
    struct.pack_into("<I", bad, avih_at + 16, 7)  # dwTotalFrames
    with pytest.raises(avicodec.AviError):
        avicodec.decode(bytes(bad))
    # truncated container
    with pytest.raises(avicodec.AviError):
        avicodec.decode(avi[: len(avi) // 2])


def test_frame_sample_spark_path(spark):
    """fabricate_avi -> frame_sample over Spark matches the arithmetic
    prediction for every sampled frame (the q_mjpeg_pipeline oracle's
    claim, checked here without DuckDB)."""
    from etl_neptune_spark.operators.multimodal import (
        fabricate_avi,
        frame_sample,
        frame_sample_plan,
    )

    rows = [(i, 40 + i) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        (r.doc_id, r.frame_idx): (r.width, r.height, r.pixel_checksum)
        for r in frame_sample(fabricate_avi(docs), every_n=2).collect()
    }
    for i, n in rows:
        tw, th, nf = n % 3 + 2, n % 2 + 2, n % 4 + 2
        t = np.arange(tw * th, dtype=np.int64)
        for f in range(0, nf, 2):
            psum = int((((i * 7 + f * 11 + t * 13) % 128) * 2 * 64).sum())
            assert got[(i, f)] == (tw * 8, th * 8, psum % 10007), (i, f)
    # plan-level probe now rides the real container header
    plan = {
        (r.doc_id, r.frame_idx)
        for r in frame_sample_plan(
            fabricate_avi(docs), every_n=2
        ).collect()
    }
    assert plan == set(got)
