"""Analytical operators beyond the core relational set (SURVEY §2):
pivot/unpivot reshaping, scalar and correlated subqueries, and
multi-granularity time rollups (the hypertable/continuous-aggregate
pattern over the events stream).

100 TB posture:
- pivot with EXPLICIT values is one hash aggregate (each conditional
  count is a codegen'd agg function); never call pivot() without the
  value list at scale - inferring it costs an extra distinct scan.
- unpivot is a per-row flatMap (rows x k), no shuffle.
- the scalar subquery broadcasts a one-row result into the filter;
  the correlated EXISTS decorrelates to a semi join on the key
  (Catalyst RewriteCorrelatedScalarSubquery/RewritePredicateSubquery).
- the multi-grain rollup unions per-grain aggregates over one scan
  each; at scale, compute the finest grain once and re-aggregate
  coarser grains FROM it (day -> month needs no second raw scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import load, table
from ..registry import register


@register(
    "q_pivot",
    oracle="""
    SELECT n.n_name,
           count(*) FILTER (WHERE o.o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o.o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o.o_orderstatus = 'P') AS "P"
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per nation pivoted by order status (explicit value
    list - equivalent to one hash agg of three conditional counts)."""
    t = load(spark, sf_dir)
    joined = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        # Pivot leaves NULL for empty cells; counts must be 0.
        .select(
            "n_name",
            *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in ["F", "O", "P"]],
        )
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT s_suppkey, metric, value FROM (
      SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape of supplier metrics via native unpivot
    (per-row flatMap; the oracle states the same thing as UNION ALL)."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    ).unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value")


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (scalar subquery -> the
    one-row average broadcasts into the filter)."""
    load(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )


@register(
    "q_subquery_exists_corr",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    """,
)
def q_subquery_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one 300k+ order, per segment
    (correlated EXISTS; Catalyst decorrelates to a left-semi join on
    c_custkey - same plan the hand-written semi join would give)."""
    load(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "q_time_rollup_multi",
    oracle="""
    SELECT 'day' AS grain, date_trunc('day', ts) AS bucket,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'month', date_trunc('month', ts), event_type, count(*),
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY 2, 3
    """,
)
def q_time_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: the same aggregate
    at day and month grain, tagged and unioned (the continuous-
    aggregate ladder; value summed in exact cents so both engines
    agree bit-for-bit). At scale the month grain re-aggregates the
    day grain instead of re-scanning raw events."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")

    def grain(g: str) -> DataFrame:
        return (
            e.select(
                F.lit(g).alias("grain"),
                F.date_trunc(g, "ts").alias("bucket"),
                "event_type",
                cents.alias("cents"),
            )
            .groupBy("grain", "bucket", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("value_cents"),
            )
        )

    return grain("day").unionByName(grain("month"))
