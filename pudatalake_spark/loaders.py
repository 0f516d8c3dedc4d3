"""Table loaders: parquet dir -> dict of DataFrames + temp views.

The lake layout is one parquet file/dir per table (TESTDATA.md:13-15).
Loading is plan-only (no I/O until an action), so re-loading per query
call is cheap; we still memoize per (session, dir) to avoid re-running
schema inference and view registration on every call.

100 TB posture: ``spark.read.parquet`` scales to multi-file
partitioned directories unchanged; scans get column pruning +
predicate pushdown from Catalyst as long as callers select/filter on
native columns (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_conf

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Keyed by (java session object id, sf_dir); values are dicts of DataFrames.
_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables under sf_dir and register them as temp views."""
    ensure_conf(spark)
    key = (id(spark), sf_dir.rstrip("/"))
    if key in _CACHE:
        return _CACHE[key]
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        if name == "events":
            # events.ts is parquet TIMESTAMP(NANOS), read as int64 nanos
            # (see session.RUNTIME_CONF); truncate to microseconds -
            # exactly what DuckDB does reading the same file.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    _CACHE[key] = dfs
    return dfs


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir)[name]


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a scan to full parallelism before CPU-heavy per-row
    work (shingling, hashing, vector math).

    Small local fixtures are a single parquet row-group -> a single
    input split -> ONE task, so compute-bound operators would run on
    one core of 32. On a real cluster a 100 TB scan already has
    thousands of splits, so this repartition is skipped there: we only
    shuffle when the scan's parallelism is below the cluster's
    (defaultParallelism / 2), which a large scan never is. Keyed
    repartition (pass the grouping key) lets a downstream
    groupBy(key) finish its partial aggregation at full reduction
    locally.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
