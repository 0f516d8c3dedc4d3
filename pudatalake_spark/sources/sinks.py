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

import os

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
    back = spark.read.schema(docs.schema).parquet(out)
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
    back = spark.read.schema(docs.schema).parquet(out)
    return back.groupBy("lang").agg(F.count("*").alias("n_docs"))


@register(
    "q_scan_partition_pruned",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC partition pruning, demonstrated end to end: events are
    laid out partitioned by event_type (the lake layout
    sink_parquet_partitioned establishes), and the event_type filter
    then prunes to one directory at planning time - the scan's
    PartitionFilters carries the predicate and the other partitions
    are never listed or read. The oracle runs the same query on the
    raw table, proving layout does not change results."""
    out = _scratch("lake", "events_by_type")
    ev = table(spark, sf_dir, "events")
    ev.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    # Explicit schema: an all-empty write leaves no files to infer from.
    back = spark.read.schema(ev.schema).parquet(out)
    return (
        back.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


@register(
    "q_scan_dpp",
    oracle="""
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events
          WHERE event_type IN ('click', 'signup')) d
      ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def q_scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the fact side is partitioned by
    event_type and the pruning values arrive at RUNTIME from the
    filtered dim side of the join - Catalyst plants a dynamicpruning
    subquery in the fact scan's partition filters, so only the
    partitions the dim selects are read. This is the mechanism that
    makes dim-filtered star joins cheap on a date-partitioned 100 TB
    fact table."""
    out = _scratch("lake", "events_by_type_dpp")
    ev = table(spark, sf_dir, "events")
    ev.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    fact = spark.read.schema(ev.schema).parquet(out)
    dim = (
        ev.select("event_type")
        .distinct()
        .filter(F.col("event_type").isin("click", "signup"))
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


@register(
    "q_join_bucketed",
    oracle="""
    SELECT o_orderkey, o_orderdate, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join: both fact tables pre-bucketed (8
    buckets) AND sorted on the join key, so the SortMergeJoin - and
    the per-order aggregate above it, which inherits the bucket
    partitioning - run with ZERO Exchange in the plan (verified by the
    plan audit). The merge hint only disables the small-table
    broadcast this local fixture would otherwise trigger; at 100 TB
    neither side broadcasts and bucketing is exactly what removes the
    two fact-table shuffles per join. The oracle runs the same join on
    the raw tables: bucketing changes the plan, never the result."""
    p1 = _scratch("lake", "orders_bucketed")
    p2 = _scratch("lake", "lineitem_bucketed")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS pudl_orders_b")
    spark.sql("DROP TABLE IF EXISTS pudl_lineitem_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", p1
    ).mode("overwrite").saveAsTable("pudl_orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", p2
    ).mode("overwrite").saveAsTable("pudl_lineitem_b")
    ob = spark.table("pudl_orders_b")
    lb = spark.table("pudl_lineitem_b")
    return (
        ob.hint("merge")
        .join(lb.hint("merge"), ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


ZBITS = 16


def _one_bin_per_partition(spark: SparkSession, df: DataFrame, n: int) -> DataFrame:
    """repartition(n, 'fid') HASH-partitions the n bin ids, and
    pmod(murmur3(fid), n) collides for some of them — two bins land
    in one write task while other partitions stay empty, silently
    cutting write parallelism (layout is unaffected: partitionBy
    still splits files per fid). Route each fid through a salt whose
    murmur3 residue is distinct instead: probe hash residues over a
    small int range once (metadata-scale, n-row collect — F.hash and
    HashPartitioning are both Murmur3 seed 42, so the probe predicts
    the partitioner exactly) and repartition on the mapped salt.
    Falls back to plain fid routing if the probe misses a residue
    (never observed for n=16 over 64n salts)."""
    probe = (
        spark.range(n * 64)
        .select(
            F.col("id").cast("int").alias("salt"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
        )
        .groupBy("p")
        .agg(F.min("salt").alias("salt"))
        .collect()
    )
    salt_of = {r["p"]: r["salt"] for r in probe}
    if len(salt_of) < n:
        return df.repartition(n, "fid")
    route = F.element_at(
        F.array(*[F.lit(salt_of[i]).cast("int") for i in range(n)]),
        F.col("fid") + 1,
    )
    return (
        df.withColumn("__route", route)
        .repartition(n, "__route")
        .drop("__route")
    )


def _zvalue(xcol, ycol):
    """Interleave the low ZBITS bits of two bucketed dims into a
    Z-curve value (bit i of x -> bit 2i, bit i of y -> bit 2i+1)."""
    z = F.lit(0).cast("bigint")
    for i in range(ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(xcol, i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(ycol, i).bitwiseAND(1), 2 * i + 1)
        )
    return z


@register("sink_zorder_cluster")  # layout experiment -> rows-only
def sink_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering for multi-dimensional data skipping: orders
    written twice - linearly sorted by custkey, and sorted by the
    Z-curve interleaving of (custkey, orderdate) buckets - then each
    layout's per-file min/max spans are measured for BOTH dimensions
    (the same min/max parquet row-group stats a scan's predicate
    pushdown prunes on).

    The point: linear sort makes one dimension's spans tight (~1/N)
    and leaves the other's at ~100% (every file spans all dates), so
    only custkey predicates skip files. Z-order makes BOTH spans
    ~sqrt-partitioned, so predicates on EITHER dimension skip most
    files - at 100 TB this is the difference between scanning one
    file and scanning the table for a date-filtered query on a
    custkey-sorted layout. Bucketing to ZBITS bits uses global
    min/max from a one-row broadcast aggregate (metadata-scale, no
    collect of data rows).
    """
    out_lin = _scratch("lake", "orders_linear")
    out_z = _scratch("lake", "orders_zorder")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    ).withColumn("days", F.datediff(F.col("d"), F.lit("1990-01-01").cast("date")))

    stats = o.agg(
        F.min("o_custkey").alias("cmin"), F.max("o_custkey").alias("cmax"),
        F.min("days").alias("dmin"), F.max("days").alias("dmax"),
    )
    scaled = o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey", "o_custkey", "days", "cmin", "cmax", "dmin", "dmax",
        ((F.col("o_custkey") - F.col("cmin")) * ((1 << ZBITS) - 1)
         / (F.col("cmax") - F.col("cmin"))).cast("bigint").alias("cx"),
        ((F.col("days") - F.col("dmin")) * ((1 << ZBITS) - 1)
         / (F.col("dmax") - F.col("dmin"))).cast("bigint").alias("dy"),
    )
    # File assignment is ARITHMETIC binning, not repartitionByRange:
    # range boundaries come from reservoir sampling with a per-run
    # seed, so two runs of the same sink produced files with slightly
    # different span stats (caught by tools/determinism_sweep.py,
    # r10). floor-division bins on the broadcast min/max are
    # deterministic; _one_bin_per_partition puts each bin in its own
    # shuffle partition (collision-free, see its docstring) and
    # partitionBy splits files per bin, so the layout is exactly
    # n_files files with full write parallelism.
    n_files = 16
    lin = scaled.withColumn(
        "fid",
        F.least(
            F.floor(
                (F.col("o_custkey") - F.col("cmin"))
                * n_files
                / (F.col("cmax") - F.col("cmin") + 1)
            ),
            F.lit(n_files - 1),
        ).cast("int"),
    )
    _one_bin_per_partition(spark, lin, n_files).write.partitionBy("fid").mode(
        "overwrite"
    ).parquet(out_lin)
    # z is the interleave of two ZBITS-bit dims -> [0, 2^(2*ZBITS));
    # its top 4 bits are the 16-way bin (uniform when both dims are).
    zed = scaled.withColumn(
        "z", _zvalue(F.col("cx"), F.col("dy"))
    ).withColumn(
        "fid",
        F.shiftrightunsigned(F.col("z"), 2 * ZBITS - 4).cast("int"),
    ).drop("z")
    _one_bin_per_partition(spark, zed, n_files).write.partitionBy("fid").mode(
        "overwrite"
    ).parquet(out_z)

    def spans(path: str, layout: str) -> DataFrame:
        df = spark.read.schema(scaled.schema).parquet(path)
        per_file = df.groupBy(F.input_file_name().alias("f")).agg(
            F.min("o_custkey").alias("c_lo"), F.max("o_custkey").alias("c_hi"),
            F.min("days").alias("d_lo"), F.max("days").alias("d_hi"),
            F.first("cmin").alias("cmin"), F.first("cmax").alias("cmax"),
            F.first("dmin").alias("dmin"), F.first("dmax").alias("dmax"),
        )
        return per_file.agg(
            F.lit(layout).alias("layout"),
            F.count("*").alias("n_files"),
            F.round(F.avg(
                (F.col("c_hi") - F.col("c_lo"))
                / (F.col("cmax") - F.col("cmin"))
            ), 4).alias("avg_custkey_span"),
            F.round(F.avg(
                (F.col("d_hi") - F.col("d_lo"))
                / (F.col("dmax") - F.col("dmin"))
            ), 4).alias("avg_date_span"),
        )
    return spans(out_lin, "linear_custkey").unionByName(spans(out_z, "zorder"))


@register("q_schema_evolution")  # multi-batch layout -> rows-only
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the lake (SURVEY §1): batch 1 writes the
    v1 schema (orderkey, totalprice), batch 2 adds a column
    (orderstatus); ``mergeSchema`` unifies them on read, null-filling
    the v1 rows - the append-only evolution path a lake uses instead
    of rewriting history. A type-widening migration (int -> bigint
    style) is shown on read via explicit cast.

    100 TB posture: mergeSchema costs a footer read per FILE at
    planning time - keep it off for stable tables and pin the merged
    schema explicitly (as here) once evolution settles; old batches
    are never rewritten."""
    out = _scratch("lake", "orders_evolving")
    o = table(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", "o_totalprice")
    v2 = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        back.withColumn("o_orderkey", F.col("o_orderkey").cast("bigint"))
        .groupBy("batch", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


@register("sink_jsonl_export")
def sink_jsonl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data JSONL export: write the documents corpus as
    newline-delimited JSON partitioned by lang - the interchange
    format every LLM training/eval stack ingests (one {"doc_id",
    "text", "n_tokens"} object per line) - then read it BACK through
    the JSON reader with an explicit schema and prove the round trip
    lost nothing (per-lang doc counts and an order-insensitive
    doc_id XOR checksum both match the parquet source).

    Scale shape: the export is a map-only columnar-to-JSONL encode
    partitioned by lang (no shuffle beyond the partition
    clustering); the explicit read-back schema skips the JSON
    reader's schema-inference pre-pass (a full extra scan at
    100 TB - the known JSONL trap). Round-trip hazards this pins:
    text escaping (quotes/newlines) and int64 fidelity through JSON.
    """
    out = _scratch("lake", "documents_jsonl")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).cast("bigint").alias("n_tokens"),
    )
    docs.repartition("lang").write.mode("overwrite").partitionBy(
        "lang"
    ).json(out)
    back = spark.read.schema(docs.schema).json(out)
    src = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_src"),
        F.sum("doc_id").cast("bigint").alias("x_src"),
        F.sum("n_tokens").cast("bigint").alias("t_src"),
    )
    rb = back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_back"),
        F.sum("doc_id").cast("bigint").alias("x_back"),
        F.sum("n_tokens").cast("bigint").alias("t_back"),
    )
    return (
        src.join(rb, "lang")
        .select(
            "lang",
            "n_src",
            "n_back",
            (F.col("n_src") == F.col("n_back")).alias("rows_ok"),
            (
                (F.col("x_src") == F.col("x_back"))
                & (F.col("t_src") == F.col("t_back"))
            ).alias("content_ok"),
        )
        .orderBy("lang")
    )
