"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` operators.

No reference counterpart (BASELINE.json north star). The design for a
100 TB multimodal corpus: media lives as a ``binary`` column (or
pointers to object storage) beside typed metadata columns; decode /
feature-extract / resize / frame-sample run as ``mapInPandas`` batch
iterators so each Python crossing handles a whole Arrow batch and the
operator parallelizes per input split with no shuffle.

The actual codec step is STUBBED: the container has no image/audio
libraries, so ``decode_image_meta`` uses a deterministic fake decoder
over the payload bytes (clearly marked), while the Spark-side plumbing
— schema, batching, UDF signatures, partitioning — is real and tested.
Swapping in PIL/ffmpeg later changes only ``_decode_payload``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, channels int, format string"
)

_FORMATS = ("png", "jpeg", "webp")


def _decode_payload(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode — stands in for a real image codec.

    Real implementation would be:
        from PIL import Image; img = Image.open(io.BytesIO(payload))
    which is unavailable in this environment. The fake derives stable
    pseudo-metadata from the byte content so the pipeline shape (and the
    oracle check) is end-to-end real.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "channels": 3,
        "format": _FORMATS[first % len(_FORMATS)],
    }


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: fabricate the binary media column from text
    bytes (the driver tables carry no true binary column)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """binary payload → typed image metadata via mapInPandas batches."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf[bin_col].map(lambda b: _decode_payload(bytes(b)))
            out = pd.DataFrame(list(metas))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", dim: int = 16
) -> DataFrame:
    """binary payload → fixed-width float feature vector.

    Real implementation would run a vision/audio encoder over the
    decoded media; here a DETERMINISTIC FAKE embedding (normalized byte
    histogram folded to ``dim`` buckets) keeps the Spark-side contract
    — Arrow batch in, ``array<float>`` column out, schema stable —
    fully real and testable. The output feeds the similarity operators
    unchanged (``operators.similarity`` consumes any array<float>)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for b in pdf[bin_col].values:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                n = np.linalg.norm(hist)
                feats.append((hist / n if n else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        batches, "doc_id bigint, features array<float>"
    )


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """binary payload → resized binary payload + output dims.

    The codec step is STUBBED (no image library in this container):
    the fake "resize" is a deterministic byte resample to
    width*height/64 bytes, preserving the real contract — binary in,
    binary out, metadata columns typed. Swapping in
    ``PIL.Image.resize`` changes only the loop body."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height // 64)
        for pdf in it:
            out = []
            for b in pdf[bin_col].values:
                raw = bytes(b)
                if not raw:
                    out.append(b"")
                    continue
                step = max(1, len(raw) // target)
                out.append(raw[::step][:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, "doc_id bigint, payload binary, width int, height int"
    )


def frame_sample_plan(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", every_n: int = 10
) -> DataFrame:
    """Video-frame sampling plumbing: one output row per sampled frame
    index. Frame *count* comes from the (fake) decode; frame extraction
    itself would slot into the mapInPandas body."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col].values, pdf[bin_col].values):
                n_frames = len(bytes(b)) % 300 + 1  # fake probe
                rows.extend(
                    {"doc_id": int(i), "frame_idx": f}
                    for f in range(0, n_frames, every_n)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx"])

    return df.select(id_col, bin_col).mapInPandas(
        batches, "doc_id bigint, frame_idx bigint"
    )
