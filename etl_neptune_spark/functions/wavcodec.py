"""Pure-stdlib WAV (RIFF PCM) codec — the audio counterpart of
``pngcodec``: a REAL, fully-specified container format implementable on
struct + numpy, so the multimodal audio path exercises genuine codec
bytes instead of a fake.

Scope: 16-bit signed little-endian PCM, mono or interleaved multi-
channel, standard 44-byte header + ``data`` chunk (extra chunks are
skipped on decode). Compressed formats (MP3/AAC/Opus) still need a
native library and remain stubbed.

No reference counterpart (north-star multimodal scope).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Payload is not a WAV this codec supports."""


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 ndarray (n,) mono or (n, C) interleaved → WAV bytes.
    Deterministic: fixed header layout, no ancillary chunks."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise WavError(f"unsupported shape {samples.shape}")
    n, channels = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 ndarray of shape (n, C), sample_rate)."""
    if not is_wav(payload):
        raise WavError("bad RIFF/WAVE signature")
    pos = 12
    channels = sample_rate = bits = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise WavError("truncated chunk")
        if ctype == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise WavError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if channels is None or data is None:
        raise WavError("missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    if len(arr) % channels:
        raise WavError("data length not a multiple of the frame size")
    return arr.reshape(-1, channels), sample_rate


def frame_energies(samples: np.ndarray, frame: int = 256) -> np.ndarray:
    """Exact int64 per-frame energy (Σ s², channel-summed) — the
    fixed-point VAD/feature primitive; the tail partial frame counts.
    Pure integer arithmetic → bit-reproducible in any engine."""
    s = samples.astype(np.int64)
    if s.ndim == 1:
        s = s[:, None]
    sq = (s * s).sum(axis=1)
    n = len(sq)
    out = [
        int(sq[i : i + frame].sum()) for i in range(0, n, frame)
    ]
    return np.array(out, dtype=np.int64)


def zero_crossings(samples: np.ndarray) -> int:
    """Exact sign-change count over the first channel (strict sign flip,
    zeros pass through) — the classic cheap pitch/voicing feature."""
    s = samples[:, 0] if samples.ndim == 2 else samples
    s = s.astype(np.int64)
    nz = s[s != 0]
    if len(nz) < 2:
        return 0
    return int((np.diff(np.sign(nz)) != 0).sum())
