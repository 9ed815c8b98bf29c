"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly projections,
Arrow-batched ``mapInPandas`` decode stage — is real and tested; the actual
codec step is STUBBED (image/audio libraries are not in this environment):
``decode_features(fake=False)`` raises ``NotImplementedError`` inside the
UDF, and ``fake=True`` substitutes a deterministic byte-level feature
extractor with the exact same batch shape, so the distributed plumbing is
exercised end-to-end.

Scale notes (100 TB):
* Blobs ride in the row as ``binary``; all metadata predicates (mime,
  byte size) are plain columns, so filters prune before any decode.
* The decode stage is ``mapInPandas`` — Arrow-batched, no shuffle; it
  scales linearly with executors. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap memory per task
  when blobs are large.
* Frame sampling is pure column arithmetic (no decode) — computing frame
  offsets from metadata stays in codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

#: Output schema of the decode/feature-extract stage.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_channels int, mean_byte double"
)


def with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach an opaque binary payload + typed metadata to each document.

    Stands in for an image/audio blob column: ``content`` is the UTF-8
    encoding of the text (deterministic), ``meta`` is the typed metadata
    struct a real ingest would carry (mime type, byte length)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the blob column: byte length + content hash
    per doc — no decode, pure codegen expressions."""
    blobs = with_blob(spark, sf_dir)
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


def decode_features(blobs: DataFrame, fake: bool = False) -> DataFrame:
    """Decode blobs → features via an Arrow-batched ``mapInPandas`` stage.

    ``fake=False``: raises NotImplementedError (no codec libs here) — this
    is the marked stub where PIL/ffmpeg decoding would run.
    ``fake=True``: deterministic byte-level pseudo-decode with the same
    batch shape (used by tests and the rows-only registry entry).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio codecs unavailable in this environment; "
                    "plug PIL/torchaudio/ffmpeg here"
                )
            content = pdf["content"]
            n = content.str.len().astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    # deterministic fake geometry derived from byte length
                    "width": (n % 512 + 1).astype("int32"),
                    "height": (n // 512 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "mean_byte": content.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return blobs.mapInPandas(_decode, schema=FEATURE_SCHEMA)


#: Output schema of the resize stage: the blob is replaced, the typed
#: metadata records both the old and new geometry.
RESIZE_SCHEMA = (
    "doc_id bigint, content binary, n_bytes int, width int, height int, "
    "target_width int, target_height int"
)


def resize_images(
    blobs: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Resize stage for an image column via Arrow-batched ``mapInPandas``.

    Same stub discipline as :func:`decode_features`: ``fake=False`` raises
    ``NotImplementedError`` where a PIL/torchvision resize would run;
    ``fake=True`` emits a deterministic truncation/padding of the payload
    to ``width·height`` bytes with identical batch shape, so the schema,
    partitioning and UDF plumbing are exercised end-to-end. No shuffle:
    resize is embarrassingly parallel over whatever partitioning the scan
    (or an upstream filter) produced.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "plug PIL.Image.resize / torchvision here"
                )
            content = pdf["content"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            n = pdf["content"].str.len().astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": content,
                    "n_bytes": n,
                    "width": (n % 512 + 1).astype("int32"),
                    "height": (n // 512 + 1).astype("int32"),
                    "target_width": pd.Series([width] * len(pdf), dtype="int32"),
                    "target_height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return blobs.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def frame_sample_offsets(
    spark: SparkSession, sf_dir: str, fps: int = 24, every_n_seconds: int = 10
) -> DataFrame:
    """Frame-sampling plan for a (stub) video column: compute the byte/frame
    offsets to sample — pure column arithmetic from metadata, no decode.

    Treats ``meta.n_bytes`` as a fake duration proxy (1 KB ≙ 1 second),
    emitting one row per sampled frame index."""
    blobs = with_blob(spark, sf_dir)
    duration_s = F.floor(F.col("meta.n_bytes") / 1024.0) + 1
    return blobs.select(
        "doc_id",
        duration_s.alias("duration_s"),
        F.explode(
            F.sequence(F.lit(0), duration_s - 1, F.lit(every_n_seconds))
        ).alias("sample_second"),
    ).withColumn("frame_index", (F.col("sample_second") * fps).cast("long"))
