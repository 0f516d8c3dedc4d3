"""Scans, projections, filters, predicates (SURVEY §2.1-2.2).

All builders are declarative DataFrame plans: Catalyst pushes the
filters into the parquet scan (PushedFilters) and prunes columns
(ReadSchema) - verified by tests/test_plans.py. No rounding here:
per-row IEEE arithmetic is bit-identical between Spark and DuckDB,
and rounding identical values could *introduce* divergence at .5
boundaries (SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import load, table
from ..registry import register


@register(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan, all columns. Vectorized columnar read."""
    return table(spark, sf_dir, "lineitem")


@register(
    "q_scan_prune",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def q_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema must contain only 2 of 11 cols."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "q_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed to parquet row groups (PushedFilters in plan)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    )


@register(
    "q_register_views",
    oracle="""
    SELECT r_name, count(*) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_register_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register all tables as temp views and query via spark.sql (EP3)."""
    load(spark, sf_dir)  # registers the views
    return spark.sql(
        """
        SELECT r_name, count(*) AS n_nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2.5 + 1 AS scaled_qty
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections. Per-row IEEE arithmetic - no rounding."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
    )


@register(
    "q_filter_and_or",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
           l_quantity, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'A' AND l_discount > 0.05)
       OR (l_linestatus = 'O' AND NOT (l_quantity < 10))
    """,
)
def q_filter_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "A") & (F.col("l_discount") > 0.05))
        | ((F.col("l_linestatus") == "O") & ~(F.col("l_quantity") < 10))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_discount",
    )


@register(
    "q_filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 150000
    """,
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 150000)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PRO%' OR p_name LIKE '%widget%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PRO%") | F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END
               AS closed_price
    FROM orders
    WHERE (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END)
          IS NOT NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL construction + IS [NOT] NULL filtering (3-valued logic)."""
    o = table(spark, sf_dir, "orders")
    closed = F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.withColumn("closed_price", closed)
        .filter(F.col("closed_price").isNotNull())
        .select("o_orderkey", "o_orderstatus", "closed_price")
    )


@register(
    "q_case_when",
    oracle="""
    SELECT CASE
             WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
             WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
             ELSE 'low'
           END AS prio_class,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    prio_class = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("prio_class")
    )
    return o.groupBy(prio_class).agg(F.count("*").alias("n_orders"))
