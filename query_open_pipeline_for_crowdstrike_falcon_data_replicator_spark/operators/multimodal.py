"""Multimodal column plumbing: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub: ``decode_image_batch`` raises NotImplementedError
unless a deterministic fake decoder is requested.  Everything Spark-side —
schema, binary column handling, partitioning, UDF signature, Arrow batch
shape — is real and tested, so swapping in PIL/librosa later is a one-
function change."""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct, the storage
    model for image/audio/video payloads (binary blob + mime/size)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("source_encoding"),
        ).alias("media_meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary column (byte sizes per doc) —
    runs without ever deserializing the payload in Python."""
    docs = load_table(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs)
    return bin_df.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("head_hex", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def decode_image_batch(payloads):  # pragma: no cover - real-decoder stub
    """Real media decode (PIL/cv2/librosa). Not available in this
    container — see extract_features(deterministic_fake=True)."""
    raise NotImplementedError(
        "media decoding libraries are not installed; use the deterministic "
        "fake decoder for pipeline testing"
    )


def extract_features(bin_df: DataFrame, *, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives pandas DataFrames with the raw bytes; the fake
    decoder computes deterministic byte-level moments (mean/std/min/max of
    the first 256 bytes) standing in for image features."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake:
                decode_image_batch(pdf["payload"])
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload)[:256], dtype=np.uint8).astype(np.float32)
                feats = [
                    float(arr.mean()),
                    float(arr.std()),
                    float(arr.min()),
                    float(arr.max()),
                ]
                rows.append(
                    (int(doc_id), len(bytes(payload)), bytes(payload)[:4].hex(), feats)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "head_hex", "features"])

    return bin_df.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: binary attach -> repartition (decode is
    CPU-bound; spread batches) -> Arrow-batched extract."""
    docs = load_table(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs).repartition("doc_id")
    feats = extract_features(bin_df)
    return feats.select(
        "doc_id",
        "n_bytes",
        "head_hex",
        F.round(F.element_at("features", 1).cast("double"), 3).alias("byte_mean"),
    )


MULTIMODAL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_features": (multimodal_features, None),  # Pandas-UDF path
}
