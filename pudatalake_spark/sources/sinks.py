"""Lake sinks (SURVEY §2.1): partitioned parquet write + dynamic
partition overwrite.

Rows-only checks: each builder writes and returns the read-back
DataFrame so the driver's count verifies the round trip.

100 TB posture: partitionBy(lang/date) is the lake layout that makes
static + dynamic partition pruning work downstream; dynamic partition
overwrite makes re-runs of a day/partition idempotent without
clobbering sibling partitions. Files per partition are controlled by
repartitioning on the partition key before the write (avoids the
many-small-files problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import table
from ..registry import register
from .ingest import _scratch


@register("sink_parquet_partitioned")
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents partitioned by lang; prove partition pruning on
    read-back (filter lang='en' reads only that directory)."""
    out = _scratch("lake", "documents_by_lang")
    docs = table(spark, sf_dir, "documents")
    # One file per partition: repartition on the partition column.
    docs.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("lang").agg(F.count("*").alias("n_docs"))


@register("sink_overwrite_dynamic")
def sink_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: rewriting one lang partition leaves
    the others untouched (idempotent incremental re-run)."""
    out = _scratch("lake", "documents_dyn")
    docs = table(spark, sf_dir, "documents")
    docs.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # Re-write ONLY the 'en' partition, doubling nothing: dynamic
        # mode replaces just the partitions present in the write.
        docs.filter(F.col("lang") == "en").repartition("lang").write.mode(
            "overwrite"
        ).partitionBy("lang").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    return back.groupBy("lang").agg(F.count("*").alias("n_docs"))
