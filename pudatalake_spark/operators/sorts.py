"""Sorts, limits, top-k (SURVEY §2.6).

Scale notes: global ORDER BY is a range-partitioned sort (sampling
pass + shuffle into sorted ranges) - scales to any size.
``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
partition keeps its local top-k heap, the driver merges k*P rows -
never a full sort. LIMIT/OFFSET requires a total order to be
deterministic; ties at every boundary are broken with the unique key
(SURVEY §5.3 hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import load, table
from ..registry import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort with explicit null placement."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc()
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 (TakeOrderedAndProject; boundary ties broken by
    o_orderkey)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_LIMIT_OFFSET_SQL = """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
"""


@register("q_limit_offset", oracle=_LIMIT_OFFSET_SQL)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a deterministic total order (EP3:
    engine SQL == oracle SQL)."""
    load(spark, sf_dir)
    return spark.sql(_LIMIT_OFFSET_SQL)
