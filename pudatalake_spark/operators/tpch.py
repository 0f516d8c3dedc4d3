"""TPC-H-suite queries on the synthetic star schema (SURVEY §2.14).

q_tpch_q3 (shipping priority) lives in analytics.py since round 5a;
this module adds the other classic shapes expressible on this
schema: Q5 (local-supplier volume, the canonical 6-way star join),
Q10 (returned-item reporting, join + agg + top-k), Q16-style
(supplier-relationship count-distinct with an exclusion anti-join)
and Q18 (large-volume customers, agg-derived semi-join filter).
TPC-H Q1 is already the flagship (q_agg_groupby); Q4/Q12/Q14 need
l_commitdate / l_receiptdate / l_shipmode columns the generator does
not ship, so they are out of scope by data contract.

Scale notes (100 TB):
- All dimension tables (region, nation, supplier at |S| ~ 1e6 rows
  max) broadcast; the ONLY shuffles are the fact-fact
  orders x lineitem joins on their shared order key and the final
  small aggregations.
- Filters (dates, returnflag, mktsegment) are expressed on the base
  scans so Catalyst pushes them into parquet row-group pruning
  BEFORE the joins.
- Top-k outputs sort rounded values with a unique-key tie-break so
  the LIMIT cut is deterministic across engines (registry rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import load
from ..registry import register


@register(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    customer and the line's supplier share a nation, per ASIA nation.

    Scale shape: region->nation->supplier collapses to ONE broadcast
    (the supplier dim annotated with its nation name, pre-filtered to
    the target region); customer is broadcast-joined to orders (or
    shuffled at true scale - either way keyed on o_custkey); the one
    unavoidable big shuffle is lineitem x orders on the order key.
    The c_nationkey = s_nationkey "local" predicate rides the
    broadcast hash join as an extra condition, never a theta join.
    """
    t = load(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    co = t["customer"].select("c_custkey", "c_nationkey").join(
        o.select("o_orderkey", "o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(any_value(c_acctbal), 4) AS c_acctbal,
           any_value(n_name) AS n_name
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost
    revenue on 'R'-flagged lines in one quarter.

    Scale shape: both date and returnflag predicates push to the
    parquet scans; orders x lineitem shuffles on the order key;
    customer then joins the small aggregated per-customer revenue
    (aggregate FIRST, join dims AFTER - the join input shrinks from
    |lineitem| to |customers-with-returns|); nation broadcasts.
    Top-20 via TakeOrderedAndProject on rounded revenue with custkey
    tie-break.
    """
    t = load(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    rev = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    cust = t["customer"].join(
        F.broadcast(t["nation"]),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        cust.join(rev, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'BRAND_1'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style (parts/supplier relationship): distinct supplier
    count per part attribute class, excluding flagged suppliers (the
    original excludes 'Customer Complaints' suppliers; this schema's
    equivalent deterministic flag is a negative account balance).

    Scale shape: the exclusion set is tiny -> broadcast LEFT ANTI
    join on the fact side (never NOT IN's null-trap semantics at
    scale); part attribute predicates push to the part scan; the
    part x lineitem join shuffles on partkey; count(DISTINCT)
    expands to Spark's two-phase partial-distinct aggregate.
    """
    t = load(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "BRAND_1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = t["lineitem"].join(
        F.broadcast(bad_supp),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 4) AS o_totalprice,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds 250, with their customer and quantity sum.

    Scale shape: the HAVING subquery is computed ONCE as a grouped
    aggregate on lineitem (map-side partial sums, one shuffle on
    l_orderkey) producing the small qualifying set WITH its sum_qty
    - so the outer query joins that result directly instead of
    re-aggregating lineitem a second time (the classic Q18 rewrite).
    Orders then joins the small set (AQE broadcasts it), customer
    joins on custkey. Top-100 by price with orderkey tie-break.
    """
    t = load(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = t["orders"].join(big, F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        o.join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
