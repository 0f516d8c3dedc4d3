"""Multimodal column handling (SURVEY §2.10, BASELINE.json:6).

Modality payloads are opaque ``binary`` columns wrapped in a typed
struct: struct(modality, content binary, meta struct). Decode /
feature-extraction runs as Arrow-batched pandas over mapInPandas;
the actual image/audio codecs are STUBBED (this container has no
codec libs - see _decode_payload) with a deterministic fake, while
the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested.

100 TB posture: binary payloads dominate bytes - keep them OUT of
shuffles (extract features first, shuffle features only), store
payloads in their own column so parquet column pruning skips them
for metadata-only queries, and size partitions by bytes not rows
(maxPartitionBytes), since one row can be megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..loaders import table
from ..registry import register


def _modality():
    return (
        F.when(F.col("doc_id") % 3 == 0, "text")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
    )


@register(
    "q_multimodal_struct",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'text'
                WHEN doc_id % 3 = 1 THEN 'image'
                ELSE 'audio' END AS modality,
           octet_length(encode(text)) AS payload_bytes,
           n_chars AS meta_size,
           lang AS meta_lang
    FROM documents
    WHERE doc_id % 3 = 1
    """,
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal column: struct(modality, content: binary,
    meta: struct) built from documents (text bytes stand in for the
    raw payload); filter by modality, project per-type fields."""
    d = table(spark, sf_dir, "documents")
    mm = d.select(
        "doc_id",
        F.struct(
            _modality().alias("modality"),
            F.encode(F.col("text"), "UTF-8").alias("content"),
            F.struct(
                F.col("n_chars").alias("size"),
                F.col("lang").alias("lang"),
            ).alias("meta"),
        ).alias("media"),
    )
    return (
        mm.filter(F.col("media.modality") == "image")
        .select(
            "doc_id",
            F.col("media.modality").alias("modality"),
            F.octet_length("media.content").alias("payload_bytes"),
            F.col("media.meta.size").alias("meta_size"),
            F.col("media.meta.lang").alias("meta_lang"),
        )
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)


def _decode_payload(modality: str, content: bytes):
    """STUB decode step. Real implementation would dispatch to PIL /
    torchaudio / pyav, none of which exist in this container:

        raise NotImplementedError("image/audio codecs not installed")

    The deterministic fake below treats the payload bytes as the
    'decoded' sample buffer so the downstream feature plumbing
    (batching, schema, aggregation) is fully exercised.
    """
    try:  # pragma: no cover - codec libs absent by design
        import PIL  # noqa: F401

        raise NotImplementedError("real decode path not wired in this build")
    except ImportError:
        pass
    return list(content)  # fake "samples": the raw byte values


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature rows out."""
    for pdf in batches:
        samples = [
            _decode_payload(m, c) for m, c in zip(pdf["modality"], pdf["content"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "n_bytes": [len(s) for s in samples],
                "checksum": [int(sum(s) % 1_000_000_007) for s in samples],
                "feat_mean": [
                    float(sum(s)) / len(s) if s else 0.0 for s in samples
                ],
            }
        )


@register(
    "q_multimodal_decode",
    oracle="""
    WITH bytes AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'text'
                  WHEN doc_id % 3 = 1 THEN 'image'
                  ELSE 'audio' END AS modality,
             unnest([ord(substr(text, i + 1, 1)) FOR i IN range(0, length(text))]) AS b
      FROM documents
    )
    SELECT doc_id, modality,
           count(*) AS n_bytes,
           CAST(sum(b) % 1000000007 AS BIGINT) AS checksum,
           CAST(sum(b) AS DOUBLE) / count(*) AS feat_mean
    FROM bytes
    GROUP BY doc_id, modality
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches). The
    decode itself is a deterministic stub (ASCII text -> payload bytes
    == character codes), which is what makes the oracle expressible:
    it recomputes the same byte statistics in SQL."""
    d = table(spark, sf_dir, "documents")
    mm = d.select(
        "doc_id",
        _modality().alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return mm.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


@register("q_multimodal_framesample")  # plumbing demo -> rows-only
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split each
    payload into fixed-size 'frames' (64-byte windows), keep every
    4th frame, one output row per kept frame. Deterministic stub for
    the decode; the explode/partitioning shape is the real thing."""
    frame_len, stride = 64, 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_bytes": [], "frame_sum": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                n_frames = max(1, len(buf) // frame_len)
                for fno in range(0, n_frames, stride):
                    chunk = buf[fno * frame_len : (fno + 1) * frame_len]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(fno)
                    rows["frame_bytes"].append(len(chunk))
                    rows["frame_sum"].append(int(sum(chunk)))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.IntegerType()),
            T.StructField("frame_sum", T.LongType()),
        ]
    )
    d = table(spark, sf_dir, "documents")
    mm = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("content"))
    return mm.mapInPandas(sample, schema=schema)
