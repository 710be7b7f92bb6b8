"""Pure-stdlib AVI (RIFF) container codec for MJPEG video — the video
counterpart of functions/wavcodec.py (same RIFF chunk-walking recipe)
and the container half of the q_jpeg_pipeline certification story: an
MJPEG AVI is literally a RIFF file whose ``movi`` list carries one
baseline-JFIF stream per frame, so the existing JPEG codec
(functions/jpegcodec.py) decodes every extracted frame and the DC-only
fabricated-tile argument makes sampled-frame pixels SQL-predictable.

Container support is deliberately the classic AVI 1.0 subset a real
MJPEG producer emits: one 'vids'/'MJPG' stream, ``00dc`` frame chunks,
word-aligned chunks, optional ``idx1`` index (written, skipped on
read), unknown chunks/lists skipped — the chunk walker tolerates
writers that add ``JUNK`` padding or extra streams.

Reference parity note: the reference has no media pipeline at all —
this backs the multimodal training-data operators (SURVEY §2's
"beyond the reference" mandate); frame decode itself rides the
certified JPEG codec.
"""

from __future__ import annotations

import struct

__all__ = ["AviError", "is_avi", "encode", "decode", "probe"]

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


class AviError(ValueError):
    pass


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _ck(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk, word-aligned (odd payloads get a pad byte that
    is NOT counted in the stored length — the RIFF rule)."""
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, contents: bytes) -> bytes:
    return _ck(b"LIST", list_type + contents)


def encode(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Assemble an MJPEG AVI from per-frame JPEG byte streams.
    Deterministic: fixed header layout, no ancillary chunks beyond the
    standard hdrl/movi/idx1 skeleton."""
    if not frames:
        raise AviError("no frames")
    n = len(frames)
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_frame * fps,  # dwMaxBytesPerSec (nominal)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_frame,  # dwSuggestedBufferSize
        width,
        height,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        n,  # dwLength (frames)
        max_frame,  # dwSuggestedBufferSize
        0xFFFF,  # dwQuality (driver default)
        0,  # dwSampleSize (0: one sample per chunk)
        0,
        0,
        width,
        height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (nominal)
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _ck(b"avih", avih) + _list(b"strl", _ck(b"strh", strh) + _ck(b"strf", strf)),
    )
    movi_chunks = []
    idx_entries = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in frames:
        movi_chunks.append(_ck(b"00dc", f))
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, offset, len(f))
        )
        offset += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _ck(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for each word-aligned
    RIFF chunk in data[pos:end] — the wavcodec chunk walk, factored."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > end:
            raise AviError("truncated chunk")
        yield fourcc, pos + 8, length
        pos += 8 + length + (length & 1)


def probe(payload: bytes) -> dict:
    """Header-only probe: declared frame count + dims from avih, no
    frame extraction — the cheap metadata pass."""
    if not is_avi(payload):
        raise AviError("bad RIFF/AVI signature")
    for fourcc, start, length in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[start : start + 4] == b"hdrl":
            for f2, s2, l2 in _walk(payload, start + 4, start + length):
                if f2 == b"avih":
                    vals = struct.unpack_from("<14I", payload, s2)
                    return {
                        "n_frames": vals[4],
                        "width": vals[8],
                        "height": vals[9],
                    }
    raise AviError("missing avih header")


def decode(payload: bytes) -> tuple[list[bytes], dict]:
    """Extract the MJPEG frame byte streams (movi '00dc'/'00db' chunks,
    in order) plus the probed header. Unknown chunks, 'rec ' groupings
    and the idx1 index are skipped — chunk-skipping exactly as the WAV
    decoder tolerates extra chunks."""
    info = probe(payload)
    frames: list[bytes] = []
    for fourcc, start, length in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[start : start + 4] == b"movi":
            for f2, s2, l2 in _walk(payload, start + 4, start + length):
                if f2 in (b"00dc", b"00db"):
                    frames.append(payload[s2 : s2 + l2])
                elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"rec ":
                    for f3, s3, l3 in _walk(payload, s2 + 4, s2 + l2):
                        if f3 in (b"00dc", b"00db"):
                            frames.append(payload[s3 : s3 + l3])
    if not frames:
        raise AviError("no video frames")
    if info["n_frames"] and info["n_frames"] != len(frames):
        raise AviError(
            f"frame count mismatch: avih={info['n_frames']} movi={len(frames)}"
        )
    return frames, info
