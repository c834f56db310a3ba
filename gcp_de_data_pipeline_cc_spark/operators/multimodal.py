"""Multimodal column plumbing (extension mandate).

Images/audio/video ride through the pipeline as opaque ``binary`` columns
with a typed metadata struct — the lakehouse-standard layout (same shape
as Spark's built-in ``image``/``binaryFile`` sources). Decode and
feature-extraction run as Arrow-batched ``mapInPandas`` stages: the only
part of this engine where Python is the right tool, because codec
libraries are Python/C, not Catalyst.

The decode step is a STUB in this environment (no image/audio libs in the
container): :func:`decode_stub` raises ``NotImplementedError`` for real
codecs and the pipelines use :func:`fake_decode_features` — a
deterministic byte-level featurizer — so the Spark-side plumbing (schema,
batch iteration, partitioning) is fully real and tested.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
binary payloads stay off the driver; feature extraction is narrow, so it
pipelines with the scan. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory
against large payloads.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, byte_mean double, "
    "features array<double>"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a multimodal table: payload as ``binary`` + typed metadata
    struct (media_type/n_bytes/sha), as an ingest stage would attach from
    object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> object:
    """Placeholder for real codec decode (PIL/librosa/ffmpeg).

    Not available in this container — any real media type raises, and
    pipelines must inject :func:`fake_decode_features` instead.
    """
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes, n_dims: int = 4) -> list[float]:
    """Deterministic stand-in for a real feature extractor: bucket byte
    histograms into ``n_dims`` normalized dimensions."""
    if not payload:
        return [0.0] * n_dims
    buckets = [0] * n_dims
    for b in payload:
        buckets[b % n_dims] += 1
    total = float(len(payload))
    return [round(c / total, 6) for c in buckets]


def extract_features(
    media: DataFrame, id_col: str = "doc_id", n_dims: int = 4
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches — constant
    memory regardless of partition size — and yields the typed feature
    frame declared in FEATURE_SCHEMA.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(
                        lambda p: zlib.crc32(bytes(p))
                    ).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda p: round(sum(bytes(p)) / max(len(p), 1), 6)
                    ),
                    "features": payloads.map(
                        lambda p: fake_decode_features(bytes(p), n_dims)
                    ),
                }
            )

    return media.select(id_col, "payload").mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling analog: slice the payload every ``every_n_bytes``
    (as a video pipeline samples every Nth frame), yielding one row per
    sample — the explode-shaped stage of a real multimodal pipeline."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_chunk = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, len(raw), every_n_bytes):
                    out_ids.append(doc_id)
                    out_idx.append(i // every_n_bytes)
                    out_chunk.append(
                        hashlib.md5(raw[i : i + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_ids, "sample_idx": out_idx, "chunk_md5": out_chunk}
            )

    return media.select(id_col, "payload").mapInPandas(
        sampler, "doc_id long, sample_idx int, chunk_md5 string"
    )
