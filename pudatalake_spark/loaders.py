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

import os
from urllib.parse import urlparse

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


# Timestamp-typed columns per table. The generator has re-encoded
# these across regenerations (r3: TIMESTAMP(NANOS) -> timestamp[us]);
# every one of them gets the same sniff-and-normalize treatment so the
# NEXT regeneration can't take the engine down either.
TS_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


# Plausible epoch ranges for years 1990..2100 per integer unit. The
# units are 1000x apart while the year span is only ~1.7x, so the
# ranges are pairwise disjoint and one sampled value classifies the
# unit unambiguously (or provably fails to).
_EPOCH_RANGES = {
    "s": (631_152_000, 4_102_444_800),
    "ms": (631_152_000_000, 4_102_444_800_000),
    "us": (631_152_000_000_000, 4_102_444_800_000_000),
    "ns": (631_152_000_000_000_000, 4_102_444_800_000_000_000),
}


def _sniff_bigint_ts_unit(df: DataFrame, c: str) -> str:
    """Classify a raw-bigint ts column's unit by value magnitude.

    A bigint ts column only appears under nanosAsLong legacy reads —
    but a future regeneration could just as plausibly ship raw int64
    epoch-MICROS, and dividing those by 1000 would silently mis-scale
    every timestamp 1000x (ADVICE r4). One non-null value decides:
    the candidate units' plausible-epoch ranges (1990..2100) are
    pairwise disjoint, so the sample lands in exactly one — or in
    none, which RAISES instead of guessing. The probe is a limit-1
    scan of a single column (first row group only, once per
    session/dir, only on the rare bigint path), never a full scan.
    """
    from pyspark.sql import functions as F

    rows = df.select(F.col(c).alias("v")).filter(F.col("v").isNotNull()).limit(1).collect()
    if not rows:  # all-null column: unit is irrelevant, any works
        return "ns"
    v = abs(int(rows[0]["v"]))
    for unit, (lo, hi) in _EPOCH_RANGES.items():
        if lo <= v <= hi:
            return unit
    raise ValueError(
        f"bigint ts column {c!r}: sample value {v} matches no plausible "
        f"epoch unit (s/ms/us/ns, years 1990-2100); refusing to guess a "
        f"divisor — inspect the file's physical encoding"
    )


def _normalize_ts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Normalize timestamp columns to session-TZ TIMESTAMP regardless
    of the file's physical encoding.

    The testdata generator has shipped events.ts three different ways
    across regenerations, so the loader SNIFFS the resolved Spark type
    instead of trusting any conf or doc:

    - ``bigint``: raw epoch integers (e.g. parquet TIMESTAMP(NANOS)
      read under ``spark.sql.legacy.parquet.nanosAsLong``) -> the unit
      is classified by value magnitude (`_sniff_bigint_ts_unit`), then
      converted exactly; ns truncates ns->us (what DuckDB does reading
      the same file). Ambiguous magnitudes raise instead of guessing.
    - ``timestamp_ntz``: parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
      -> cast to TIMESTAMP; values are identical under the UTC session
      TZ, and downstream ``unix_micros()`` callers require TIMESTAMP.
    - ``date``: a date32-encoded regeneration would otherwise break
      every ``unix_micros`` caller -> cast to TIMESTAMP (midnight UTC,
      exactly what the current timestamp[us] files store).
    - ``string``: ISO text dates -> cast to TIMESTAMP (ANSI cast
      raises on malformed input rather than nulling it silently).
    - ``timestamp``: already what we want -> no-op.

    Never assume a conf applied: ``ensure_conf`` swallows failures on
    static conf, so only the observed dtype is trustworthy.
    """
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for c in cols if cols is not None else ["ts"]:
        t = dtypes.get(c)
        if t == "bigint":
            unit = _sniff_bigint_ts_unit(df, c)
            if unit == "ns":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
            elif unit == "us":
                df = df.withColumn(c, F.timestamp_micros(F.col(c)))
            elif unit == "ms":
                df = df.withColumn(c, F.timestamp_millis(F.col(c)))
            else:  # "s"
                df = df.withColumn(c, F.timestamp_seconds(F.col(c)))
        elif t in ("timestamp_ntz", "date", "string"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables under sf_dir and register them as temp views."""
    ensure_conf(spark)
    key = (id(spark), sf_dir.rstrip("/"))
    if key in _CACHE:
        # Re-register views even on a memo hit: views are GLOBAL per
        # session, so after load(dir_a); load(dir_b); load(dir_a) the
        # SQL-text operators (q_scd2_build, q_subquery_*, q_events_*)
        # would otherwise silently read dir_b's tables.
        # createOrReplaceTempView is plan-only and costs ~nothing.
        for name, df in _CACHE[key].items():
            df.createOrReplaceTempView(name)
        return _CACHE[key]
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        if name in TS_COLUMNS:
            df = _normalize_ts(df, TS_COLUMNS[name])
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
    try:
        # File count is a pure-metadata read on a scan; df.rdd (the
        # previous probe) forces a full plan-to-RDD conversion.
        width = len(df.inputFiles())
    except Exception:
        width = df.rdd.getNumPartitions()
    if width >= max(1, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def cached(df: DataFrame) -> DataFrame:
    """persist() with the documented session lifecycle: operators cache
    diamond-shaped intermediates (both join branches read them and
    exchange reuse does not recognize the diamond). The handle cannot
    be unpersisted inside the builder - the returned plan is lazy, so
    the cache only fills when the CALLER materializes. Blocks use the
    default evictable MEMORY_AND_DISK level, so a long session (pytest,
    the oracle driver) degrades to recompute under pressure instead of
    OOM; bench.py additionally clearCache()s between timed runs."""
    return df.persist()

def broadcast_below(small: DataFrame, source: DataFrame,
                    max_bytes: int) -> DataFrame:
    """Size-switched broadcast hint (the q_dedup_cross_corpus
    precedent generalized, VERDICT r13 #1): hint ``small`` for
    broadcast only while the SOURCE corpus behind it is provably
    tiny (``scan_bytes`` metadata stat <= max_bytes). ``small`` is
    typically a data-dependent derived set (hot-line hashes, a
    near-dup removal list) whose row count grows with the corpus -
    a forced F.broadcast() on it is correct on fixtures and an
    executor/driver OOM at 100 TB. Above the threshold - or when
    the size is unknowable (remote FS) - the hint is dropped and
    the join plans as a plain shuffled join (AQE may still convert
    it at runtime from REAL sizes, which is the honest cluster
    posture: only runtime stats know how big a derived set is)."""
    from pyspark.sql import functions as F

    nb = scan_bytes(source)
    if nb is not None and nb <= max_bytes:
        return F.broadcast(small)
    return small


def scan_bytes(df: DataFrame) -> int | None:
    """On-disk bytes behind a scan, from PURE METADATA (inputFiles +
    stat) - no job, no count(). Plan-strategy switches (e.g.
    q_dedup_cross_corpus's exact-index vs minhash-probe split) key off
    this instead of a row count so the builder stays action-free (the
    registry's lazy-DataFrame contract and plan-audit rule #4).
    Returns None when the files aren't local-stat-able (remote FS) -
    callers must then default to their SCALE-SAFE branch, which is
    also the honest cluster posture: an unknown-size corpus is a
    large one."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return 0
    total = 0
    for f in files:
        p = urlparse(f).path or f
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total
