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
